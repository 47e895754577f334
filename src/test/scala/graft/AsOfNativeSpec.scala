package graft

import graft.operators.TimeJoin
import graft.plans.{AsOfJoin, AsOfJoinExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

class AsOfNativeSpec extends SparkSpec {
  private lazy val sp = spark
  import sp.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("native == composed: identical rows on the sf events data") {
    val cols = Seq("event_id", "user_id", "ts", "value", "click_id",
      "click_ts", "gap_us").map(col)
    val native = TimeJoin.qAsofNative(spark, sf).select(cols: _*)
      .collect().map(_.toString).toList
    val composed = TimeJoin.qAsof(spark, sf).select(cols: _*)
      .collect().map(_.toString).toList
    assert(native === composed,
      "the custom exec and the union+window form must agree row for row")
  }

  test("merge semantics: <= match, max-tie on co-timestamps, outer nulls") {
    val left = Seq((10L, 1L, ts(100)), (11L, 1L, ts(50)), (12L, 2L, ts(100)))
      .toDF("l_id", "user", "lts")
    val right = Seq(
      (1L, 1L, ts(100)), (2L, 1L, ts(100)),  // co-timestamped: tie 2 wins
      (3L, 1L, ts(60)),                      // after left 11's ts(50)
      (4L, 3L, ts(10)))                      // key with no left rows
      .toDF("r_id", "r_user", "rts")
    val out = AsOfJoin(left, right, "user", "r_user", "lts", "rts", "r_id")
      .orderBy("l_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) null else r.getLong(3))).toList
    // l 10: rts<=100 on user 1 -> {1,2,3}, max (time, tie) = r_id 2
    // l 11: nothing at or before ts(50) -> NULL
    // l 12: user 2 has no right rows -> NULL
    assert(out === List((10L, 2L), (11L, null), (12L, null)), s"got $out")
  }

  test("plan: AsOfJoinExec with exactly one exchange+sort per side") {
    val df = TimeJoin.qAsofNative(spark, sf)
    // inspect the initial physical plan (pre-materialization): after AQE
    // stages materialize, collect() can no longer descend into them
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val execs = plan.collect { case e: AsOfJoinExec => e }
    assert(execs.length == 1, s"expected the custom exec in:\n$plan")
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // 2 key exchanges feeding the merge + the presentation sort's range
    // partitioning — never a nested-loop (which would have zero, and be
    // quadratic instead)
    assert(shuffles.length <= 3,
      s"as-of must shuffle each side once on the key, got ${shuffles.length}")
    val sorts = execs.head.children.flatMap(_.collectFirst {
      case s: org.apache.spark.sql.execution.SortExec => s
    })
    assert(sorts.length == 2, "EnsureRequirements must sort both sides")
  }
}
