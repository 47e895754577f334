package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Num.{dbl, dec}
import graft.sources.Tables

/** Skew mitigation for keyed joins — the manual lever for when a handful
  * of hot keys would pin a 100 TB shuffle onto a few reducers.
  *
  * Order of preference at scale:
  *  1. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.*`) — free,
  *     on by default, handles sort-merge skew at runtime; always try
  *     first.
  *  2. Broadcast the small side — no shuffle of the big side at all.
  *  3. This salted join — when the small side is too big to broadcast AND
  *     the skew lives in an aggregation-like pattern AQE can't split.
  *
  * MEASURED (graft.SkewLab, sf1 ×8 amplification, one key owning 50% of
  * 48 M rows, local[32], SKEWLAB_r08.json): when AQE's split engages it
  * wins outright — the join stage fans out past 32 tasks, the straggler
  * disappears (max task ~1.6 s vs ~9.2 s unsplit) and wall drops ~3×;
  * this salted join is then the WORST arm, because replicating the small
  * side ×salts costs ~5× total task-time and the value-hash salt
  * collides when hot-key rows carry few distinct values (here ~50
  * distinct quantities → 16 salts populated ~2× unevenly). But the
  * split is plan-shape dependent: the identical join driven through
  * `Dataset.count()` never received it in Spark 4.1.2 (straggler
  * intact across repeated runs) while `collect()` always did — rung 1
  * is a default, not a guarantee, which is why this lever exists.
  *
  * The salt is DETERMINISTIC (xxhash64 of the big row's values, mod
  * `salts`), not `rand()`: results are reproducible across retries and
  * partitionings, which task re-execution on a real cluster requires
  * (a nondeterministic salt can double-count rows when a stage retries).
  * Corollary of the measurement above: value-hashing makes salt balance
  * only as good as the row-value entropy on the hot keys — if hot rows
  * are near-duplicates, project extra distinguishing columns into the
  * big side before salting.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, spreading each hot key of the big
    * side over `salts` reducer groups; the small side is replicated
    * `salts`× (explode over the salt range), so memory cost is
    * |small| × salts — keep salts modest (8–64). Semantically identical
    * to `big.join(small, key, joinType)` for row-level join types
    * (SkewSpec pins equality). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    // right/full outer would emit the small side's unmatched SALT COPIES
    // as extra null-padded rows — salting is only sound for join types
    // whose output rows all originate from the (salted) big side
    // "cross" is excluded: with using-columns it would degenerate to the
    // keyed equi-join anyway (inner covers it) — offering it is misleading
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(normalized),
      s"saltedJoin supports inner/left/left_semi/left_anti, got $joinType")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(salts.toLong)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Declared query gating the salted join's SEMANTICS against a plain
    * join oracle: lineitem (big, salted) ⋈ orders (replicated) on the
    * order key, aggregated per priority. The oracle is the unsalted
    * join — identical results is the whole point of the operator. */
  def qSalted(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
    saltedJoin(li, ord, "o_orderkey", salts = 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), dbl(sum(dec(col("l_quantity")))).as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  def qSaltedSql: String =
    """SELECT o.o_orderpriority, COUNT(*) AS n,
      |       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin
}
