package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Benchmark decontamination: per-document n-gram overlap between the
  * training corpus and a held-out benchmark/eval set — the contamination
  * check every serious pretraining pipeline runs before a corpus ships
  * (a train doc that contains an eval doc's n-grams inflates benchmark
  * scores). The standard method: shingle both sides into word k-grams,
  * flag any train doc sharing a shingle with the benchmark set, report
  * the overlap ratio so a threshold policy can quarantine.
  *
  * Scale shape — the one decision that matters at 100 TB: the benchmark
  * side is eval-corpora-sized (MBs, not TBs), so its distinct shingle
  * set BROADCASTS; the train side then never shuffles for the match —
  * the probe is a map-side broadcast join at scan speed. The only keyed
  * shuffle is the per-doc aggregation, and it runs twice-leveled
  * ((doc, shingle) dedup, then doc rollup) so partial aggregation keeps
  * both exchanges small. K = [[DecontamK]] word-grams: long enough that
  * shared shingles mean real passage reuse, not vocabulary overlap
  * (K = 3 on this corpus flags 73% of docs; K = 5 flags the actual
  * near-duplicates).
  *
  * The benchmark membership itself is the deterministic salted-hash
  * split ([[Sample.assignSplit]] family): `hash60('bench:' || doc_id)
  * mod 20 == 0` carves a stable ~5% eval set, independent of the
  * sampling and train/val/test salts.
  */
object Decontam {
  val DecontamK = 5
  val BenchSalt = "bench:"
  val BenchDenom = 20L

  /** Stable benchmark-set membership for a key. */
  def isBench(key: Column): Column =
    pmod(graft.functions.Hashes.hash60(concat(lit(BenchSalt), key.cast("string"))),
      lit(BenchDenom)) === 0

  private[operators] def isBenchSql(key: String): String =
    s"CAST('0x' || substr(md5('$BenchSalt' || $key), 1, 15) AS BIGINT) % $BenchDenom = 0"

  /** Per-train-doc contamination report: distinct-shingle count, count
    * of shingles also present in ANY benchmark doc, overlap ratio (one
    * IEEE division of exact longs), and the quarantine flag. Every
    * train doc reports (zero-overlap rows included) — the report is the
    * corpus manifest, not just the kill list. */
  def report(docs: DataFrame, k: Int = DecontamK): DataFrame = {
    val tagged = docs.withColumn("__bench", isBench(col("doc_id")))
    val sh = Dedup.shingles(tagged, k)
    val bench = tagged.filter(col("__bench")).select("doc_id")
    val benchSh = broadcast(
      sh.join(bench, "doc_id").select("sh").distinct()
        .withColumn("__hit", lit(1)))
    sh.join(tagged.filter(!col("__bench")).select("doc_id"), "doc_id")
      .join(benchSh, Seq("sh"), "left")
      .groupBy("doc_id", "sh").agg(max("__hit").as("__h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        count(col("__h")).as("n_overlap"))
      .withColumn("overlap_ratio",
        col("n_overlap").cast("double") / col("n_shingles").cast("double"))
      .withColumn("contaminated", col("n_overlap") > 0)
  }

  def qReport(s: SparkSession, dir: String): DataFrame =
    report(Tables.documents(s, dir)).orderBy("doc_id")

  def qReportSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t,
       |         ${isBenchSql("doc_id")} AS is_bench
       |  FROM documents),
       |w AS (SELECT doc_id, is_bench, string_split(t, ' ') AS ws, t FROM d),
       |shx AS (
       |  SELECT doc_id, is_bench, unnest(
       |    CASE WHEN len(ws) >= $DecontamK
       |         THEN list_transform(range(1, len(ws) - $DecontamK + 2),
       |                             i -> array_to_string(ws[i:i+${DecontamK - 1}], ' '))
       |         ELSE [t] END) AS sh
       |  FROM w),
       |bsh AS (SELECT DISTINCT sh FROM shx WHERE is_bench),
       |tsh AS (SELECT DISTINCT doc_id, sh FROM shx WHERE NOT is_bench),
       |g AS (
       |  SELECT t.doc_id, COUNT(*) AS n_shingles, count(b.sh) AS n_overlap
       |  FROM tsh t LEFT JOIN bsh b USING (sh)
       |  GROUP BY t.doc_id)
       |SELECT doc_id, n_shingles, n_overlap,
       |       CAST(n_overlap AS DOUBLE) / CAST(n_shingles AS DOUBLE) AS overlap_ratio,
       |       n_overlap > 0 AS contaminated
       |FROM g ORDER BY doc_id""".stripMargin
}
