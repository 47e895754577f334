package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group median that scales to groups that do NOT fit in
  * memory — the SURVEY §7.2 "known hard part".
  *
  * Spark's built-in `median`/`percentile` is an `ObjectHashAggregate`
  * that buffers every value of a group in the aggregation state; at
  * 100 TB a single hot group OOMs an executor. This variant computes the
  * same number (percentile_cont(0.5): mean of the two middle order
  * statistics for even n, the middle one for odd n) from ORDER
  * STATISTICS instead:
  *
  *   row_number + count over a per-group sort window -> keep the 1-2
  *   middle rows -> avg.
  *
  * The per-group sort is a spillable SortExec after one hash shuffle —
  * no state grows with group size, so a billion-row group works. Cost:
  * a full sort of the column vs. the built-in's O(n) collect — the
  * classic memory-vs-work trade; use the built-in when groups are known
  * small (25 depts × hundreds of rows), this when they are unbounded.
  */
object ScalableMedian {

  /** One row per group: (groupCols..., alias). Exactly equals
    * `groupBy(groupCols).agg(median(valueCol))` — pinned by
    * ScalableMedianSpec on fixtures and real data. */
  def median(df: DataFrame, groupCols: Seq[String], valueCol: String,
             alias: String): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(valueCol))
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    df.select(groupCols.map(col) :+ col(valueCol): _*)
      // the built-in median IGNORES NULLs; without this filter they sort
      // first (NULLS FIRST), shift the middle ranks, and poison the result
      .filter(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      // middle positions: floor((n+1)/2) and floor(n/2)+1 coincide for
      // odd n. floor(): Column./ is double division — a bare (n+1)/2
      // yields 2.5 for even n and matches no row_number
      .filter(col("__rn") === floor((col("__n") + 1) / 2) ||
        col("__rn") === floor(col("__n") / 2) + 1)
      .groupBy(groupCols.map(col): _*)
      // lo + (hi-lo)*0.5, NOT avg: this is the exact expression both
      // Spark's Percentile and percentile_cont evaluate, and (a+b)/2 can
      // differ from it in the last ulp — which the bit-exact oracle
      // compare would catch
      .agg(min(valueCol).as("__lo"), max(valueCol).as("__hi"))
      .select(groupCols.map(col) :+
        (col("__lo") + (col("__hi") - col("__lo")) * lit(0.5)).as(alias): _*)
  }
}
