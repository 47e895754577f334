package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Sized measurement of Spark's two RUNTIME scan/shuffle-reduction
  * levers on this engine's own join shapes — the levers that engage
  * exactly at the 100 TB regime and are invisible at spec scale:
  *
  *   1. **Runtime bloom-filter join pruning** (SPARK-32268): when a
  *      selective filter sits on the small side of a shuffle join, the
  *      optimizer builds a bloom filter of the small side's join keys
  *      and injects `might_contain(...)` on the BIG side *below* its
  *      Exchange, so non-matching rows never shuffle. This is the
  *      measured answer to the kpi_pivot adjudication (BASELINE.md r11):
  *      past the broadcast cliff, SMJ is the correct regime at true
  *      scale, and the bloom filter is what keeps that regime from
  *      shuffling the full fact table. The probe is the `Tables.fact`
  *      join shape itself — lineitem ⋈ 2-month-filtered orders — with
  *      the broadcast threshold at -1 to pin the at-scale SMJ regime
  *      (at 100 TB the filtered slice exceeds any broadcast threshold;
  *      locally only -1 reproduces that regime).
  *
  *      Engagement contract (why the suite never sees this lever): the
  *      default `applicationSideScanSizeThreshold` is 10 GB — the
  *      injection is *designed* to switch on only when the application
  *      side is large enough that shuffling it is the dominant cost.
  *      The lab lowers it to 0 to measure the effect at lab scale and
  *      records the defaults it would engage under in production.
  *
  *   2. **Dynamic partition pruning** (SPARK-11150): a directory-
  *      partitioned fact joined to a filtered dim on the partition
  *      column prunes fact PARTITIONS at runtime from the dim filter's
  *      result — the star-schema complement to the static month
  *      pushdown `Tables.fact` gets from literal month predicates
  *      (J2/J3 collapse). The probe is the one shape the literal
  *      collapse cannot express: the month set comes from a parquet
  *      calendar dim's attribute filter (quarter), unknowable at plan
  *      time. Fact = orders partitioned by month (the `Sinks`
  *      partitioned layout), dim = a quarter→month calendar.
  *
  * Both arms REQUIRE identical results with the lever on and off (a
  * runtime filter may change cost, never an answer — the ZOrderLab
  * contract), and read scan truth from `FileSourceScanExec` SQLMetrics
  * on a fresh Dataset after exactly one action (the INT96-find
  * discipline: plan strings cannot give pruning ground truth).
  *
  * Run: SPARK_GRAFT_SF_DIR=testdata-sf1 SPARK_GRAFT_RTFILTERLAB_OUT=rtfilter_sf1.json \
  *        sbt "runMain graft.RuntimeFilterLab"
  */
object RuntimeFilterLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "testdata-sf1")
    val spark = GraftSession.build()

    val shufWrite = new AtomicLong(0)
    val shufRecords = new AtomicLong(0)
    val inputBytes = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          inputBytes.addAndGet(m.inputMetrics.bytesRead)
        }
      }
    })
    def resetCounters(): Unit =
      Seq(shufWrite, shufRecords, inputBytes).foreach(_.set(0))
    def quiesce(): Unit = {
      var prev = -1L; var same = 0
      while (same < 2) {
        Thread.sleep(300)
        val now = shufWrite.get() + inputBytes.get() + shufRecords.get()
        if (now == prev) same += 1 else { same = 0; prev = now }
      }
    }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // Production defaults recorded BEFORE the lab overrides them — these
    // are the thresholds under which the lever engages on a real cluster.
    def conf(k: String): String = spark.conf.getOption(k).getOrElse("<unset>")
    val defaults = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.dynamicPartitionPruning.enabled")
      .map(k => s""""$k":"${conf(k)}"""").mkString("{", ",", "}")

    // ---- arm 1: runtime bloom filter on the fact-join SMJ regime --------
    val armBloom: String = {
      // The kpi_pivot shape: lineitem joined to a 2-month orders slice.
      // Threshold -1 pins the SMJ regime (see scaladoc); scan-size
      // threshold 0 lets the injection engage at lab scale.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // creation side must stay under its threshold for injection; the
      // 2-month orders slice crosses the 10 MB default at sf10 (the same
      // size that flipped kpi_pivot's broadcast regime) — raise it so the
      // lab measures the filter, not the threshold.
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "256MB")
      def fact() = graft.sources.Tables
        .fact(spark, sfDir, graft.operators.Kpi.PivotMonths.map(_._1))
        .agg(count(lit(1)).as("n"),
          sum(col("gross")).as("sg"),
          sum(xxhash64(col("emp_id"), col("month")).cast("decimal(38,0)")).as("fp"))
      def mode(on: Boolean): (String, Long, Long, Long, Double, Boolean) = {
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", on.toString)
        resetCounters()
        val q = fact()
        val row = q.collect()(0)
        val plan = q.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        val injected = plan.toString.toLowerCase.contains("might_contain")
        quiesce()
        val (sw, sr, ib) = (shufWrite.get(), shufRecords.get(), inputBytes.get())
        val wall = (1 to 3).map(_ => timed(fact().collect())._2).min
        val fp = s"${row.getLong(0)}|${row.getDecimal(1)}|${row.getDecimal(2)}"
        (fp, sw, sr, ib, wall, injected)
      }
      val (fpOff, swOff, srOff, ibOff, wOff, injOff) = mode(on = false)
      val (fpOn, swOn, srOn, ibOn, wOn, injOn) = mode(on = true)
      require(fpOff == fpOn, s"bloom filter changed the answer: $fpOff vs $fpOn")
      require(injOn && !injOff,
        s"expected might_contain only in the on-plan (off=$injOff, on=$injOn)")
      // restore engine defaults for the DPP arm
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      f""""arm_bloom_smj":{"join":"lineitem x 2-month orders (Tables.fact, broadcast off)","off":{"shuffle_write_bytes":$swOff,"shuffle_records":$srOff,"input_bytes":$ibOff,"wall_sec":$wOff%.2f},"on":{"shuffle_write_bytes":$swOn,"shuffle_records":$srOn,"input_bytes":$ibOn,"wall_sec":$wOn%.2f},"shuffle_records_ratio":${f"${srOn.toDouble / math.max(srOff, 1)}%.4f"},"shuffle_bytes_ratio":${f"${swOn.toDouble / math.max(swOff, 1)}%.4f"}}"""
    }

    // ---- arm 2: dynamic partition pruning on the month-partitioned fact -
    val armDpp: String = {
      val base = java.nio.file.Files.createTempDirectory("graft_rtfilter").toString
      def rm(p: java.io.File): Unit = {
        if (p.isDirectory) p.listFiles().foreach(rm)
        p.delete()
      }
      // try/finally: a require() failure mid-arm (fingerprint mismatch,
      // no pruning, scan not found) must not leak the full fact-table
      // copy into /tmp — repeated failed runs would accumulate large
      // parquet trees.
      try {
      val orders = graft.sources.Tables.orders(spark, sfDir)
        .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
      val (_, buildWall) = timed {
        // repartition by the partition column first: without it each of
        // the 32 write tasks emits a file into every month directory
        // (~2500 tiny files); with it, one file per month.
        orders.repartition(col("month")).write.mode("overwrite")
          .partitionBy("month").parquet(s"$base/orders_by_month")
      }
      // Calendar dim written to parquet so the quarter filter is a real
      // scan-side predicate, not a foldable in-memory relation.
      orders.select(col("month")).distinct()
        .withColumn("quarter",
          concat(substring(col("month"), 1, 4), lit("-Q"),
            ceil(substring(col("month"), 6, 2).cast("int") / 3)))
        .write.mode("overwrite").parquet(s"$base/calendar")
      val totalMonths = spark.read.parquet(s"$base/calendar").count()
      def q() = {
        val f = spark.read.parquet(s"$base/orders_by_month")
        val cal = spark.read.parquet(s"$base/calendar")
          .filter(col("quarter") === "1996-Q1")
        // decimal sum: a double sum is addition-order-dependent, and the
        // on/off fingerprints must be comparable exactly
        f.join(cal, "month")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("sp"))
      }
      // `SparkPlan.collect` stops at AQE's QueryStageExec LEAVES (a
      // materialized stage's plan is not a child), so a post-AQE scan
      // hunt must descend explicitly — the same trap as the INT96 one:
      // the obvious API silently sees nothing.
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val nested = p match {
          case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allNodes(q.plan)
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => allNodes(r.child)
          case _ => Nil
        }
        (p +: p.children.flatMap(allNodes)) ++ nested
      }
      def mode(on: Boolean): (String, Long, Long, Long, Double) = {
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", on.toString)
        resetCounters()
        val query = q()
        val row = query.collect()(0)
        // the partitioned fact scan is the one whose relation path is the
        // orders_by_month layout
        val scan = allNodes(query.queryExecution.executedPlan).collect {
          case s: FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains("orders_by_month")) => s }
        require(scan.nonEmpty, "fact scan not found in executed plan")
        val files = scan.head.metrics.get("numFiles").map(_.value).getOrElse(-1L)
        val scanRows = scan.head.metrics("numOutputRows").value
        quiesce()
        val ib = inputBytes.get()
        val wall = (1 to 3).map(_ => timed(q().collect())._2).min
        (s"${row.getLong(0)}|${row.getDecimal(1)}", files, scanRows, ib, wall)
      }
      val (fpOff, filesOff, rowsOff, ibOff, wOff) = mode(on = false)
      val (fpOn, filesOn, rowsOn, ibOn, wOn) = mode(on = true)
      require(fpOff == fpOn, s"DPP changed the answer: $fpOff vs $fpOn")
      require(filesOn < filesOff,
        s"DPP did not prune fact files: on=$filesOn off=$filesOff")
      f""""arm_dpp":{"fact":"orders partitionBy(month), $totalMonths months","dim_filter":"calendar.quarter = 1996-Q1 (3 months)","layout_build_wall_sec":$buildWall%.2f,"off":{"fact_files_read":$filesOff,"fact_scan_rows":$rowsOff,"input_bytes":$ibOff,"wall_sec":$wOff%.2f},"on":{"fact_files_read":$filesOn,"fact_scan_rows":$rowsOn,"input_bytes":$ibOn,"wall_sec":$wOn%.2f},"files_ratio":${f"${filesOn.toDouble / math.max(filesOff, 1)}%.4f"},"scan_rows_ratio":${f"${rowsOn.toDouble / math.max(rowsOff, 1)}%.4f"}}"""
      } finally rm(new java.io.File(base))
    }

    val json =
      s"""{"experiment":"runtime_filters","sf":"$sfDir","production_defaults":$defaults,$armBloom,$armDpp}"""
    println(json)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_RTFILTERLAB_OUT", "rtfilterlab.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
