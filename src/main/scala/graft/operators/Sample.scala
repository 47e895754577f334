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
}
