package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Exact frequent-token extraction at stream scale: the candidate +
  * verify pattern over per-partition Misra-Gries summaries.
  *
  * Why not `groupBy(token).count()` + filter: that shuffles the FULL
  * vocabulary — at 100 TB of web text the token key space is billions of
  * strings and almost all of them are below any useful threshold. The
  * two-phase form never shuffles a non-candidate token:
  *
  *  1. Candidates: each partition folds its tokens through a
  *     Misra-Gries summary with m counters — O(m) memory, one pass.
  *     Pigeonhole guarantee (the reason the final answer is EXACT, not
  *     approximate): if a token's global count exceeds N/m, it must
  *     exceed n_p/m on at least one partition (else summing the per-
  *     partition bounds contradicts the global count), and a token over
  *     its partition's n_p/m always survives that partition's summary.
  *     So the candidate union — at most m × partitions strings —
  *     contains EVERY token with global count > N/m. The same pass
  *     emits each partition's token count, so N needs no extra scan.
  *  2. Verify: rescan tokens, keep candidates only (broadcast semi
  *     join — a map-side filter), exact-count that bounded key set, and
  *     apply the threshold `count × M > N` in int64. Candidate-set
  *     nondeterminism (MG eviction order depends on partitioning) cannot
  *     reach the output: candidates are a superset of the true heavy
  *     hitters, and the verify phase is exact.
  *
  * The summary is lineage-cut ([[graft.functions.Lineage.cut]]): it is
  * consumed twice (total + candidate set) and must not recompute the
  * corpus scan each time; the cut is reliable when a checkpoint dir is
  * configured, executor-local otherwise.
  */
object Heavy {
  /** Threshold denominator: heavy ⇔ count × M > N (count > N/M). */
  val HeavyM = 100

  /** Misra-Gries with m counters over one partition's tokens, plus the
    * partition's token count. Classic decrement-all summary: any token
    * with local count > n_p/m is guaranteed present at the end. */
  private[graft] def misraGries(it: Iterator[String], m: Int): (Map[String, Long], Long) = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    var n = 0L
    it.foreach { w =>
      n += 1
      counts.get(w) match {
        case Some(c) => counts(w) = c + 1
        case None if counts.size < m => counts(w) = 1L
        case None =>
          val dead = List.newBuilder[String]
          counts.mapValuesInPlace((_, c) => c - 1)
          counts.foreach { case (k, c) => if (c == 0L) dead += k }
          dead.result().foreach(counts.remove)
      }
    }
    (counts.toMap, n)
  }

  /** Exact tokens with global count × M > total, over a single `token`
    * column. Output: (token, n), descending. */
  def heavyHitters(tokens: DataFrame, m: Int = HeavyM): DataFrame = {
    val sp = tokens.sparkSession
    import sp.implicits._
    val summary = tokens.as[String].mapPartitions { it =>
      val (cands, n) = misraGries(it, m)
      cands.keysIterator.map(w => (w, 0L, false)) ++ Iterator(("", n, true))
    }.toDF("token", "np", "is_total")
    val cut = graft.functions.Lineage.cut(summary)
    val total = cut.filter(col("is_total")).agg(sum("np").as("total"))
    val cands = cut.filter(!col("is_total")).select("token").distinct()
    tokens.join(broadcast(cands), "token")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") * m > col("total"))
      .select(col("token"), col("n"))
  }

  private def tokens(docs: DataFrame): DataFrame =
    Tables.balanced(docs).select(
      explode(split(graft.functions.Hashes.normText(col("text")), " ")).as("token"))

  def qHeavy(s: SparkSession, dir: String): DataFrame =
    heavyHitters(tokens(Tables.documents(s, dir))).orderBy(desc("n"), col("token"))

  def qHeavySql: String =
    s"""WITH d AS (
       |  SELECT trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t FROM documents),
       |tok AS (SELECT unnest(string_split(t, ' ')) AS token FROM d),
       |tot AS (SELECT COUNT(*) AS total FROM tok),
       |c AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token)
       |SELECT token, n FROM c, tot
       |WHERE n * $HeavyM > total
       |ORDER BY n DESC, token""".stripMargin
}
