package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The end-to-end corpus-curation pipeline — the composition every
  * training-data build runs, chained from the engine's own operators in
  * the production order:
  *
  *   1. exact dedup        keep only the canonical doc of each
  *                         normalized-content fingerprint ([[Dedup.exact]])
  *   2. near-dup dedup     drop non-canonical members of the verified
  *                         near-dup clusters ([[Cluster.connectedComponents]]
  *                         over [[Dedup.jaccardOverCandidates]])
  *   3. quality gate       keep docs passing >= 2 of the 3 corpus-quality
  *                         gates ([[Text.stats]] quality >= 0.7)
  *   4. mixture sampling   deterministic stratified hash sample to the
  *                         configured language mix ([[Sample.applyRates]])
  *
  * Each stage is an independent predicate over the corpus scan, so the
  * composition is a join-intersection Catalyst plans as a whole — no
  * materialization barriers between stages (only the CC label
  * propagation inside stage 2 is inherently iterative). What this query
  * proves is COMPOSABILITY: the operators the engine ships individually
  * chain into the real pipeline without glue code, and the whole chain
  * stays oracle-checkable end to end.
  *
  * Scale: stages 1/3/4 are one keyed agg / narrow projections; stage 2's
  * cost is the near-dup verify pipeline (bounded by LSH bucket
  * occupancy, never all-pairs). The keep/drop lists are tiny relative to
  * the corpus (duplicates + cluster members), so the final joins are
  * AQE-broadcastable.
  */
object Curate {
  val QualityMin = 0.7

  def curated(docs: DataFrame,
              rates: Seq[(String, Int)] = Sample.Rates): DataFrame = {
    // stage 1: exact-canonical keep-list (one id per fingerprint group)
    val canon = Dedup.exact(docs).select(col("canonical_id").as("doc_id"))
    // stage 2: non-canonical near-dup members -> drop-list
    val pairs = Dedup.jaccardOverCandidates(docs)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val nonCanon = Cluster.connectedComponents(pairs)
      .filter(col("doc_id") =!= col("canonical_id")).select("doc_id")
    // stage 3: quality scores
    val qual = Text.stats(docs).select(col("doc_id"), col("quality"))
    val kept = docs.select("doc_id", "lang")
      .join(canon, "doc_id")
      .join(nonCanon, Seq("doc_id"), "left_anti")
      .join(qual, "doc_id")
      .filter(col("quality") >= QualityMin)
    // stage 4: mixture sampling
    Sample.applyRates(kept, rates)
      .select("doc_id", "lang", "quality", "bucket")
  }

  def qCurate(s: SparkSession, dir: String): DataFrame =
    curated(Tables.balanced(Tables.documents(s, dir))).orderBy("doc_id")

  /** DuckDB oracle: the same four stages — exact-canonical list, cluster
    * drop-list (recursive CTE), quality gate, rate filter. Every piece
    * of load-bearing arithmetic is the SHARED helper, not a copy:
    * cluster CTEs from [[Cluster.ccCtes]], quality counts/score from
    * [[Text.qualityCountsSql]]/[[Text.qualityArmsSql]], bucket + rates
    * from [[Sample.bucketSql]]/[[Sample.ratesValuesSql]]. */
  def qCurateSql: String =
    s"""WITH RECURSIVE ${Cluster.ccCtes},
       |noncanon AS (SELECT doc_id FROM cc WHERE doc_id <> canonical_id),
       |fp AS (SELECT doc_id, md5(t) AS f FROM d),
       |canon AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY f),
       |qd AS (
       |  SELECT doc_id, text, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS qt
       |  FROM documents),
       |qbase AS (
       |  SELECT doc_id,
       |         ${Text.qualityCountsSql("qt")}
       |  FROM qd),
       |qual AS (
       |  SELECT doc_id,
       |         ${Text.qualityArmsSql} AS quality
       |  FROM qbase),
       |rates(lang, rate) AS (VALUES ${Sample.ratesValuesSql}),
       |keyed AS (
       |  SELECT doc_id, lang, ${Sample.bucketSql("doc_id")} AS bucket
       |  FROM documents)
       |SELECT k.doc_id, k.lang, q.quality, k.bucket
       |FROM keyed k
       |JOIN canon c ON c.doc_id = k.doc_id
       |JOIN qual q ON q.doc_id = k.doc_id
       |JOIN rates r ON r.lang = k.lang
       |WHERE NOT EXISTS (SELECT 1 FROM noncanon n WHERE n.doc_id = k.doc_id)
       |  AND q.quality >= $QualityMin
       |  AND k.bucket < r.rate
       |ORDER BY k.doc_id""".stripMargin
}
