package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Merge-vs-exchange cost attribution for the native as-of join
  * (VERDICT r8 next-round #6): `plans/AsOfJoin.scala`'s scaladoc claims
  * the O(|L|+|R|) merge is a small share of its stage (scan + two
  * exchanges + two sorts dominate), and whole-stage codegen of the merge
  * is only worth building if that stops being true at scale. This lab
  * MEASURES the share instead of arguing it.
  *
  * Method: task-time attribution by plan subtraction, at the physical
  * level so the optimizer can't elide the compared work.
  *
  *   native   — the exact [[graft.plans.AsOfJoin]] output drained via
  *              `executedPlan.execute()` with a per-partition row count
  *              (no collect, no final orderBy — the operator's own cost,
  *              not the presentation sort's).
  *   skeleton — the SAME two inputs pushed through the SAME physical
  *              shape minus the merge: hash repartition on the join key +
  *              sortWithinPartitions by (key, time[, tie]), each side
  *              drained the same way. Two jobs; TASK-TIME totals are
  *              additive and parallelism-independent, so
  *              merge_share = (task_native − task_skelL − task_skelR)
  *                            / task_native
  *              attributes exactly the merge + output-projection work.
  *
  * Wall seconds are reported too (min over reps) but the share is
  * computed from summed task time. Run:
  *   SPARK_GRAFT_SF_DIR=testdata-sf10 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.AsOfLab"
  */
object AsOfLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "testdata-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val taskMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        taskMs.addAndGet(t.taskInfo.duration)
    })
    // async listener bus: poll until the task-time total stops moving
    def quiesce(): Long = {
      var prev = -1L; var stable = 0
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (stable < 2 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val cur = taskMs.get()
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
      taskMs.get()
    }

    /** Consume every row of the frame's physical plan; returns row count.
      * Draining `executedPlan.execute()` directly keeps the exchanges and
      * sorts in the measured plan — a `count()` would prune them away. */
    def drain(df: DataFrame): Long =
      df.queryExecution.executedPlan.execute()
        .mapPartitions { it =>
          var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator(n)
        }.collect().sum

    final case class Arm(wall: Double, taskSec: Double, rows: Long)
    def time(mk: () => DataFrame): Arm = {
      var best: Arm = null
      (1 to reps).foreach { _ =>
        taskMs.set(0)
        val t0 = System.nanoTime()
        val rows = drain(mk())
        val wall = (System.nanoTime() - t0) / 1e9
        val ts = quiesce() / 1e3
        if (best == null || wall < best.wall) best = Arm(wall, ts, rows)
      }
      best
    }

    def purchases: DataFrame = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    def clicks: DataFrame = Tables.events(spark, sfDir)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))

    def native: DataFrame = graft.plans.AsOfJoin(
      purchases, clicks, "user_id", "c_user", "ts", "click_ts", "click_id")
    def skelL: DataFrame = purchases.repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts")
    def skelR: DataFrame = clicks.repartition(col("c_user"))
      .sortWithinPartitions("c_user", "click_ts", "click_id")

    // warmup all three shapes (codegen/JIT outside the timed reps)
    drain(native); drain(skelL); drain(skelR)

    val n = time(() => native)
    val l = time(() => skelL)
    val r = time(() => skelR)
    require(n.rows == l.rows,
      s"left-outer as-of must preserve left cardinality: ${n.rows} vs ${l.rows}")
    val share = (n.taskSec - l.taskSec - r.taskSec) / n.taskSec
    def j(a: Arm) =
      f"""{"wall_sec":${a.wall}%.3f,"task_sec":${a.taskSec}%.3f,"rows":${a.rows}}"""
    println(s"""{"experiment":"asof_merge_share","sf":"$sfDir","reps":$reps,""" +
      s""""native":${j(n)},"skeleton_left":${j(l)},"skeleton_right":${j(r)},""" +
      f""""merge_share_of_task_time":$share%.3f}""")
    spark.stop()
  }
}
