package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sized evidence for the O(log n) connected-components fallback on the
  * graph shape that motivated it: a CHAIN — diameter = n, the adversary
  * for min-label propagation (needs `diameter` rounds; the production
  * cap is 15) and the shape a crawl's paraphrase-chain near-dups can
  * approximate. ClusterSpec pins correctness at diameter 39; this lab
  * measures the MILLION-vertex case:
  *
  *  1. the auto-degrade path end-to-end: `connectedComponents` on a
  *     10^6-chain hits its cap, hands off to the star variant, and
  *     returns the exact fixpoint (every vertex labeled 0) — wall
  *     recorded;
  *  2. the round-count LAW: minimal star rounds r(n) for chains of
  *     10^3..10^6, found by binary probe against the variant's
  *     refuse-to-return-non-fixpoint guard (the operator does not
  *     expose its round counter; probing the guard measures it without
  *     adding API for a lab). Propagation's round need is n; a
  *     logarithmic r(n) column is the 100 TB argument in one table.
  *
  * Run: sbt "runMain graft.CcLab"  (SPARK_GRAFT_CCLAB_OUT overrides the
  * artifact path; SPARK_GRAFT_CCLAB_N the largest chain size.)
  */
object CcLab {
  def main(args: Array[String]): Unit = {
    val maxN = sys.env.getOrElse("SPARK_GRAFT_CCLAB_N", "1000000").toInt
    val spark = GraftSession.build()

    def chain(n: Int) = spark.range(0, n - 1)
      .select(col("id").as("a"), (col("id") + 1).as("b"))

    // Job counter: sizes the per-round driver overhead (r11 folded the
    // two convergence probes + distinct into ONE action per round; the
    // job count is the direct evidence of what the fold removed).
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })

    // 1. auto-degrade end-to-end at the largest size
    val t0 = System.nanoTime()
    jobs.set(0)
    val cc = graft.operators.Cluster.connectedComponents(chain(maxN))
    val (rows, wrong) = {
      val agg = cc.agg(count(lit(1)), sum(when(col("canonical_id") =!= 0L, 1L).otherwise(0L)))
        .collect()(0)
      (agg.getLong(0), agg.getLong(1))
    }
    val wall = (System.nanoTime() - t0) / 1e9
    // listener events drain async; settle before reading the counter
    // (±1 job of slack is immaterial to the per-round overhead claim)
    Thread.sleep(1000)
    val nJobs = jobs.get()
    require(rows == maxN && wrong == 0,
      s"chain($maxN) must collapse to canonical 0 for every vertex: rows=$rows wrong=$wrong")
    println(f"[cclab] auto-degrade chain($maxN): $wall%.1fs, $rows labels, all canonical=0, $nJobs jobs")

    // 2. minimal star rounds by binary probe at growing n
    def minRounds(n: Int): Int = {
      def succeeds(cap: Int): Boolean =
        try {
          graft.operators.Cluster.connectedComponentsStars(chain(n), cap)
            .agg(count(lit(1))).collect()
          true
        } catch {
          // match the guard by MESSAGE, walking causes: a cap-exceeded
          // refusal that surfaces wrapped in a SparkException from a
          // task must count as a failed probe, not crash the lab
          case e: Throwable =>
            val msgs = Iterator.iterate(e: Throwable)(_.getCause)
              .takeWhile(_ != null).take(8)
              .flatMap(t => Option(t.getMessage)).mkString(" | ")
            if (msgs.contains("did not reach a star fixpoint")) false else throw e
        }
      var hi = 4
      while (!succeeds(hi)) hi *= 2
      var lo = if (hi == 4) 0 else hi / 2 // hi/2 actually failed above
      // when the first probe succeeded, lo=0 is failing by definition
      // (zero rounds cannot star a nonempty chain); otherwise lo was
      // genuinely probed — either way the invariant "lo fails, hi
      // succeeds" holds before the binary search
      while (lo + 1 < hi) {
        val mid = (lo + hi) / 2
        if (succeeds(mid)) hi = mid else lo = mid
      }
      hi
    }
    val sizes = Iterator.iterate(1000)(_ * 10).takeWhile(_ <= maxN).toSeq
    val law = sizes.map { n =>
      val r = minRounds(n)
      println(s"[cclab] chain($n): star fixpoint in $r rounds (propagation would need ${n - 1})")
      s"""{"n":$n,"star_rounds":$r,"propagation_rounds_needed":${n - 1}}"""
    }

    val json =
      f"""{"experiment":"cc_star_fallback","auto_degrade":{"n":$maxN,"wall_sec":$wall%.1f,"labels":$rows,"all_canonical_zero":true,"driver_jobs":$nJobs},"round_law":[${law.mkString(",")}]}"""
    println(json)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_CCLAB_OUT", "CCLAB_r11.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
