package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deterministic sampling for training-data mixing: every corpus-scale
  * pipeline downsamples by stratum (language, source, quality band) to
  * hit a target mixture, and the sample must be REPRODUCIBLE — stable
  * across reruns, retries, partitionings, and engines. `df.sample()`
  * (rand-seeded per partition) is none of those, so sampling here is a
  * pure hash filter: keep a row iff `hash(doc_id) mod D < rate(stratum)`.
  *
  * Properties that matter at 100 TB:
  *  - narrow projection + filter — no shuffle, runs at scan speed; the
  *    per-stratum rate table is a broadcast config join;
  *  - rerun/retry safe: a task recompute selects the same rows (a
  *    rand()-based sample can double/drop rows under stage retry);
  *  - composable: raising a stratum's rate keeps every previously
  *    sampled row (buckets are stable), so incremental top-ups are
  *    supersets — the property curriculum/mixture tuning relies on;
  *  - strata with no configured rate drop out via the inner join
  *    (explicit config, no silent default).
  */
object Sample {
  val Denom = 10000L
  /** Per-language keep rates out of [[Denom]] — the mixture config. */
  val Rates: Seq[(String, Int)] = Seq(
    "en" -> 8000, "de" -> 5000, "fr" -> 5000, "es" -> 2500, "zh" -> 2500)
  /** Salt: distinct sampling decisions must not correlate across uses
    * of the same key in different pipelines. */
  val Salt = "sample:"

  /** Stable bucket in [0, Denom): md5-derived (cross-engine), keyed by
    * the salted row key. */
  def bucket(key: Column): Column =
    pmod(graft.functions.Hashes.hash60(concat(lit(Salt), key.cast("string"))),
      lit(Denom))

  /** The sampling predicate applied to any frame carrying (doc_id, lang):
    * appends `bucket`, keeps rows under their stratum's rate, preserves
    * the other columns. The composable form — the curation pipeline
    * chains it after its filter stages. */
  def applyRates(keyed: DataFrame, rates: Seq[(String, Int)] = Rates): DataFrame = {
    val s = keyed.sparkSession
    import s.implicits._
    val ratesDf = rates.toDF("lang", "rate")
    keyed
      .withColumn("bucket", bucket(col("doc_id")))
      .join(broadcast(ratesDf), "lang")
      .filter(col("bucket") < col("rate"))
      .drop("rate")
  }

  /** Stratified hash sample of `documents`: stratum = lang. */
  def stratified(docs: DataFrame, rates: Seq[(String, Int)] = Rates): DataFrame =
    applyRates(docs.select(col("doc_id"), col("lang")), rates)
      .select("doc_id", "lang", "bucket")

  def qSample(s: SparkSession, dir: String): DataFrame =
    stratified(Tables.documents(s, dir)).orderBy("doc_id")

  /** The bucket expression's DuckDB twin over a key expression — ONE
    * definition shared with every oracle that samples. */
  private[operators] def bucketSql(key: String): String =
    s"CAST('0x' || substr(md5('$Salt' || $key), 1, 15) AS BIGINT) % $Denom"

  private[operators] def ratesValuesSql: String =
    Rates.map { case (l, r) => s"('$l', $r)" }.mkString(", ")

  def qSampleSql: String =
    s"""WITH rates(lang, rate) AS (VALUES $ratesValuesSql),
       |b AS (
       |  SELECT doc_id, lang, ${bucketSql("doc_id")} AS bucket
       |  FROM documents)
       |SELECT doc_id, b.lang, bucket
       |FROM b JOIN rates USING (lang)
       |WHERE bucket < rate
       |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // Deterministic train/val/test split
  // -------------------------------------------------------------------
  /** Split salt: a row's split assignment must not correlate with its
    * sampling bucket — the same key hashed under [[Salt]] and SplitSalt
    * gives independent decisions. */
  val SplitSalt = "split:"
  val SplitDenom = 100L
  /** Cumulative upper bounds out of [[SplitDenom]]: train 80%, val 10%,
    * test 10%. */
  val SplitBounds: Seq[(String, Long)] = Seq("train" -> 80L, "val" -> 90L, "test" -> SplitDenom)

  /** Stable split bucket under the split-specific salt. */
  def splitBucket(key: Column): Column =
    pmod(graft.functions.Hashes.hash60(concat(lit(SplitSalt), key.cast("string"))),
      lit(SplitDenom))

  /** Assign every row a train/val/test split by key hash — the holdout
    * carve-up a training pipeline does exactly once, and must never
    * leak: assignment is a pure function of the key, so reruns, retries,
    * engine swaps, and incremental corpus additions keep every existing
    * row's split fixed (a new doc never moves an old doc across the
    * boundary — the property that protects eval integrity). Narrow
    * projection, no shuffle. */
  def assignSplit(df: DataFrame, key: Column): DataFrame = {
    val b = splitBucket(key)
    val expr = SplitBounds.init.foldRight(lit(SplitBounds.last._1)) {
      case ((name, hi), rest) => when(b < hi, name).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Per-(source, split) manifest: doc + token counts. The report a
    * pipeline materializes next to the split so mixture drift is visible
    * per source; one corpus scan, one dim-sized agg. */
  def splitManifest(docs: DataFrame): DataFrame = {
    val toks = split(graft.functions.Hashes.normText(col("text")), " ")
    assignSplit(docs, col("doc_id"))
      .select(col("source"), col("split"), size(toks).cast("long").as("n_tok"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
  }

  def qSplit(s: SparkSession, dir: String): DataFrame =
    splitManifest(Tables.documents(s, dir)).orderBy("source", "split")

  def qSplitSql: String = {
    val cases = SplitBounds.init
      .map { case (name, hi) => s"WHEN b < $hi THEN '$name'" }
      .mkString(" ")
    s"""WITH d AS (
       |  SELECT source,
       |         CAST('0x' || substr(md5('$SplitSalt' || doc_id), 1, 15) AS BIGINT) % $SplitDenom AS b,
       |         CAST(len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tok
       |  FROM documents)
       |SELECT source, CASE $cases ELSE '${SplitBounds.last._1}' END AS split,
       |       COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
       |FROM d GROUP BY source, split
       |ORDER BY source, split""".stripMargin
  }

  // -------------------------------------------------------------------
  // Source-weighted epoch resampling (data-mixture epoching)
  // -------------------------------------------------------------------
  /** Per-source epoch weights in CENTI-EPOCHS (250 = 2.5 epochs, 40 =
    * a 40% single partial epoch). Sources not listed run one epoch. */
  val EpochWeights: Seq[(String, Int)] = Seq(
    "src0" -> 250, "src1" -> 200, "src2" -> 130, "src3" -> 40)
  val DefaultEpochWeight = 100
  /** Epoch salt: the partial-epoch keep decision must not correlate with
    * the sampling or split buckets of the same doc. */
  val EpochSalt = "epoch:"

  /** Materialize the training-mixture epoch roster: each doc appears
    * once per full epoch its source is weighted for, plus one more copy
    * with probability = the fractional epoch, decided by the same
    * salted-hash bucket machinery as [[applyRates]] (deterministic,
    * rerun/retry-stable, engine-portable — a rand() here would re-deal
    * the mixture on every stage retry). This is the "2.5 epochs of
    * Wikipedia, 0.4 epochs of CommonCrawl" recipe step every LLM
    * pretraining run materializes before shard-packing.
    *
    * Scale shape: ZERO shuffles — a broadcast join of the dim-sized
    * weight config, a per-row bucket hash, and an explode whose output
    * is exactly the Σ w_s·|docs_s| rows the training run will read.
    * The guarded `when(copies > 0, ...)` matters: Spark's `sequence(0,
    * copies-1)` with copies = 0 would count DOWN ([0,-1]), silently
    * duplicating dropped docs instead of dropping them. */
  def epochs(docs: DataFrame, weights: Seq[(String, Int)] = EpochWeights): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val w = coalesce(col("weight"), lit(DefaultEpochWeight))
    // centi-epoch split: full epochs + fractional remainder, all integer
    val full = floor(w.cast("long") / lit(100L)).cast("int")
    val fracThreshold = (w.cast("long") % 100L) * (Denom / 100L)
    val b = pmod(
      graft.functions.Hashes.hash60(concat(lit(EpochSalt), col("doc_id").cast("string"))),
      lit(Denom))
    val copies = full + when(b < fracThreshold, 1).otherwise(0)
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(weights.toDF("source", "weight")), Seq("source"), "left")
      .withColumn("__copies", copies)
      .select(col("doc_id"), col("source"),
        explode(when(col("__copies") > 0,
          sequence(lit(0), col("__copies") - 1)).otherwise(array().cast("array<int>")))
          .as("epoch"))
  }

  def qEpochs(s: SparkSession, dir: String): DataFrame =
    epochs(Tables.documents(s, dir)).orderBy("doc_id", "epoch")

  def qEpochsSql: String = {
    val weightsValues = EpochWeights.map { case (s, w) => s"('$s', $w)" }.mkString(", ")
    s"""WITH weights(source, weight) AS (VALUES $weightsValues),
       |d AS (
       |  SELECT doc_id, d.source,
       |         COALESCE(w.weight, $DefaultEpochWeight) AS wt,
       |         CAST('0x' || substr(md5('$EpochSalt' || doc_id), 1, 15) AS BIGINT) % $Denom AS b
       |  FROM documents d LEFT JOIN weights w ON d.source = w.source),
       |c AS (
       |  SELECT doc_id, source,
       |         wt // 100 + CASE WHEN b < (wt % 100) * ${Denom / 100L}
       |                          THEN 1 ELSE 0 END AS copies
       |  FROM d)
       |SELECT doc_id, source, CAST(i AS INT) AS epoch
       |FROM c, unnest(range(0, copies)) AS t(i)
       |ORDER BY doc_id, epoch""".stripMargin
  }

  // -------------------------------------------------------------------
  // Distribution-matching resample (pipeline_match)
  // -------------------------------------------------------------------
  /** Reference distribution source / source to be matched to it. */
  val MatchTarget = "src0"
  val MatchCand = "src14"
  /** Histogram bin width over `n_chars`. */
  val MatchBinW = 100L
  val MatchSalt = "match:"

  /** Histogram-matching downsample: keep a deterministic subset of the
    * candidate source whose length distribution matches the target
    * source's SHAPE (covariate matching — the mixture-building step that
    * stops "more of source X" from also meaning "longer documents").
    * Per length-bin acceptance rate = min(1, (t_cnt·C_tot)/(c_cnt·T_tot));
    * a doc is kept iff its [[Denom]]-bucket hash clears the rate. The
    * min() needs no branch: `h·c_cnt·T_tot < Denom·t_cnt·C_tot` is
    * automatically true for every h < [[Denom]] when the rate caps at 1.
    * All comparisons are exact integer products in DECIMAL(19→38,0)
    * (HUGEINT in the oracle) — counts at 100 TB (~1e12) keep the triple
    * product under 1e38, and no float ratio ever forms, so the kept set
    * is bit-stable across engines, retries, and partitionings.
    *
    * Scale shape: bin statistics and totals are dim-sized aggregates
    * (map-side combined from the scan); the candidate stream joins them
    * BROADCAST — the corpus itself never shuffles — and the kept-count
    * report reduces map-side to bin counts. Emits the per-bin audit
    * (target/cand/kept counts); the row-level manifest is the same plan
    * minus the final regroup. */
  def matchResample(docs: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), col("source"),
      expr(s"n_chars div $MatchBinW").as("bin"))
    val t = d.filter(col("source") === MatchTarget)
      .groupBy("bin").agg(count(lit(1)).as("t_cnt"))
    val cDocs = d.filter(col("source") === MatchCand)
    val c = cDocs.groupBy("bin").agg(count(lit(1)).as("c_cnt"))
    val tot = t.agg(sum("t_cnt").as("t_tot"))
      .crossJoin(broadcast(c.agg(sum("c_cnt").as("c_tot"))))
    val h = pmod(graft.functions.Hashes.hash60(
      concat(lit(MatchSalt), col("doc_id").cast("string"))), lit(Denom))
    def big(x: Column) = x.cast("decimal(19,0)")
    val kept = cDocs
      .join(broadcast(c), "bin")
      .join(broadcast(t), Seq("bin"), "left")
      .crossJoin(broadcast(tot))
      .filter(big(h) * big(col("c_cnt")) * big(col("t_tot")) <
        big(lit(Denom)) * big(coalesce(col("t_cnt"), lit(0L))) * big(col("c_tot")))
      .groupBy("bin").agg(count(lit(1)).as("kept_cnt"))
    t.join(c, Seq("bin"), "full_outer")
      .join(kept, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("t_cnt"), lit(0L)).as("target_cnt"),
        coalesce(col("c_cnt"), lit(0L)).as("cand_cnt"),
        coalesce(col("kept_cnt"), lit(0L)).as("kept_cnt"))
  }

  def qMatch(s: SparkSession, dir: String): DataFrame =
    matchResample(Tables.documents(s, dir)).orderBy("bin")

  def qMatchSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, n_chars // $MatchBinW AS bin FROM documents),
       |t AS (SELECT bin, COUNT(*) AS t_cnt FROM d WHERE source = '$MatchTarget' GROUP BY bin),
       |c AS (SELECT bin, COUNT(*) AS c_cnt FROM d WHERE source = '$MatchCand' GROUP BY bin),
       |tot AS (
       |  SELECT (SELECT SUM(t_cnt) FROM t) AS t_tot,
       |         (SELECT SUM(c_cnt) FROM c) AS c_tot),
       |kept AS (
       |  SELECT cd.bin, COUNT(*) AS kept_cnt
       |  FROM (SELECT doc_id, bin FROM d WHERE source = '$MatchCand') cd
       |  JOIN c USING (bin) LEFT JOIN t USING (bin) CROSS JOIN tot
       |  WHERE CAST(CAST('0x' || substr(md5('$MatchSalt' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % $Denom AS HUGEINT)
       |          * c_cnt * t_tot
       |      < CAST($Denom AS HUGEINT) * COALESCE(t_cnt, 0) * c_tot
       |  GROUP BY cd.bin)
       |SELECT COALESCE(t.bin, c.bin) AS bin,
       |       CAST(COALESCE(t_cnt, 0) AS BIGINT) AS target_cnt,
       |       CAST(COALESCE(c_cnt, 0) AS BIGINT) AS cand_cnt,
       |       CAST(COALESCE(kept_cnt, 0) AS BIGINT) AS kept_cnt
       |FROM t FULL OUTER JOIN c ON t.bin = c.bin
       |LEFT JOIN kept k ON k.bin = COALESCE(t.bin, c.bin)
       |ORDER BY bin""".stripMargin
}
