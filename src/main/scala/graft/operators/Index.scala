package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Capped inverted-index construction over `documents` — the retrieval
  * side of a training-data pipeline (corpus search, contamination
  * lookups, citation attribution). For every sufficiently-common token:
  * exact document frequency, exact collection frequency, and a bounded
  * posting list of the first [[Index.PostK]] doc_ids.
  *
  * Reference scope: the reference engine has no search surface; this is
  * a brief-mandated training-data extension (SURVEY §7.1 step 8 family).
  */
object Index {
  /** Posting-list cap: the index stores the first K doc_ids per token. */
  val PostK = 8
  /** Index only tokens appearing in at least this many distinct docs. */
  val MinDf = 3
  /** Report rows: top-N tokens by (df desc, token asc) — total order. */
  val TopN = 200

  /** Build the capped inverted index.
    *
    * Scale shape: (1) explode words → ONE keyed aggregate to (token,
    * doc_id, tf) — map-side combinable, the only shuffle that carries
    * the corpus; (2) ONE window pass over `token` computes df (partition
    * count), cf (partition sum) and the doc_id rank in a single
    * exchange; (3) the rank filter bounds every posting list to
    * [[PostK]] rows BEFORE `collect_list`, so no executor ever
    * materializes the full posting list of a stopword — the classic
    * inverted-index OOM at 100 TB ("the" occurs in every doc) is
    * structurally impossible; (4) the regroup to one row per token
    * reuses the window's token partitioning (zero new exchange), and the
    * final top-N is TakeOrderedAndProject, never a global sort. */
  def inverted(docs: DataFrame): DataFrame = {
    val perDoc = docs
      .select(col("doc_id"), explode(Text.words(col("text"))).as("token"))
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
    val byToken = Window.partitionBy("token")
    val ranked = perDoc
      .withColumn("df", count(lit(1)).over(byToken))
      .withColumn("cf", sum(col("tf")).over(byToken))
      .withColumn("rn", row_number().over(byToken.orderBy("doc_id")))
    ranked.filter(col("rn") <= PostK)
      .groupBy("token")
      .agg(first(col("df")).as("df"), first(col("cf")).as("cf"),
        array_join(transform(array_sort(collect_list(col("doc_id"))),
          d => d.cast("string")), ",").as("postings"))
      .filter(col("df") >= MinDf)
      .orderBy(col("df").desc, col("token"))
      .limit(TopN)
  }

  def qIndex(s: SparkSession, dir: String): DataFrame =
    inverted(Tables.documents(s, dir))

  def qIndexSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
       |  FROM documents),
       |tok AS (SELECT doc_id, unnest(ws) AS token FROM d),
       |perdoc AS (SELECT token, doc_id, COUNT(*) AS tf FROM tok GROUP BY token, doc_id),
       |ranked AS (
       |  SELECT token, doc_id, tf,
       |         COUNT(*) OVER (PARTITION BY token) AS df,
       |         SUM(tf) OVER (PARTITION BY token) AS cf,
       |         ROW_NUMBER() OVER (PARTITION BY token ORDER BY doc_id) AS rn
       |  FROM perdoc),
       |agg AS (
       |  SELECT token, CAST(MAX(df) AS BIGINT) AS df, CAST(MAX(cf) AS BIGINT) AS cf,
       |         array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
       |  FROM ranked WHERE rn <= $PostK GROUP BY token)
       |SELECT token, df, cf, postings FROM agg
       |WHERE df >= $MinDf
       |ORDER BY df DESC, token LIMIT $TopN""".stripMargin
}
