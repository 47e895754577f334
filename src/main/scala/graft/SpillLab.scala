package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Measured proof that [[graft.functions.ScalableMedian]]'s spill branch
  * EXECUTES and stays correct (VERDICT r8 next-round #4): the operator's
  * whole reason to exist is that its per-group sort spills to disk where
  * the built-in median's ObjectHashAggregate state cannot, yet every
  * prior measurement ran on a 128 GiB heap where nothing ever spilled —
  * the spill path itself had never run.
  *
  * Two arms, identical query (`kpi_anomalies_at_scale` =
  * `Kpi.anomalies(scalableMedian = true)`), identical input:
  *
  *   comfortable  — session defaults; expected spill: ZERO bytes.
  *   forced_spill — the sorter is forced to spill long before memory
  *     pressure would make it: `spark.shuffle.spill.
  *     numElementsForceSpillThreshold` (UnsafeExternalSorter's row cap,
  *     a core conf — needs its own SparkContext) caps every sort buffer
  *     at 10 k rows, and the WindowExec row buffer gets the matching
  *     SQL-conf caps (`windowExec.buffer.{in.memory,spill}.threshold`).
  *     This exercises the identical code path a small executor heap
  *     triggers organically — deterministic, instead of OOM-roulette
  *     with a shrunken JVM.
  *
  * Evidence per arm: wall seconds (min of reps), bytes spilled to
  * memory/disk summed over task metrics, spilling task count, and the
  * COLLECTED RESULT — the run aborts unless both arms return
  * byte-identical rows. Run:
  *   SPARK_GRAFT_SF_DIR=testdata-sf10 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.SpillLab"
  */
object SpillLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "testdata-sf10")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt

    final case class Arm(wall: Double, memSpill: Long, diskSpill: Long,
                         spillTasks: Int, rows: Seq[String])

    def runArm(forceSpill: Boolean): Arm = {
      val spark = GraftSession.build(extra =
        if (forceSpill) Seq(
          "spark.shuffle.spill.numElementsForceSpillThreshold" -> "10000",
          "spark.sql.windowExec.buffer.in.memory.threshold" -> "4096",
          "spark.sql.windowExec.buffer.spill.threshold" -> "4096")
        else Nil)
      var mem = 0L; var disk = 0L; var tasks = 0
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
          Option(t.taskMetrics).foreach { m =>
            if (m.memoryBytesSpilled > 0 || m.diskBytesSpilled > 0) tasks += 1
            mem += m.memoryBytesSpilled; disk += m.diskBytesSpilled
          }
      })
      def q() = SparkEntry.queries("kpi_anomalies_at_scale")(spark, sfDir)
      q().collect() // warmup: codegen/JIT outside the timed reps
      mem = 0; disk = 0; tasks = 0 // warmup spills count toward evidence? no — reset
      var best = Double.MaxValue
      var rows: Seq[String] = Nil
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        val r = q().collect()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        rows = r.map(_.toString).toSeq
      }
      // one measured pass for the spill counters (reps above share them;
      // per-rep attribution doesn't matter — the claim is "spilled & right")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      Arm(best, mem, disk, tasks, rows)
    }

    val comfy = runArm(forceSpill = false)
    val forced = runArm(forceSpill = true)
    require(comfy.rows == forced.rows,
      s"forced-spill run changed the result: ${comfy.rows.size} vs ${forced.rows.size} rows")
    require(forced.diskSpill > 0,
      "forced arm never spilled to disk — thresholds did not engage")
    def j(a: Arm) =
      f"""{"wall_sec":${a.wall}%.3f,"memory_spilled_bytes":${a.memSpill},""" +
        f""""disk_spilled_bytes":${a.diskSpill},"spilling_tasks":${a.spillTasks}}"""
    println(s"""{"experiment":"scalable_median_spill","sf":"$sfDir",""" +
      s""""query":"kpi_anomalies_at_scale","reps":$reps,""" +
      s""""result_rows":${comfy.rows.size},"rows_identical":true,""" +
      s""""comfortable":${j(comfy)},"forced_spill":${j(forced)}}""")
  }
}
