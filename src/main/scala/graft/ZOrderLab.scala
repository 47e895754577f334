package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Sized data-skipping measurement for the Z-order layout (the
  * LayoutSpec test proves the mechanism at sf0.01; this lab measures it
  * at the self-gate scale factors, where files carry real row groups and
  * the scan cost is nontrivial). Three layouts of the same `events`
  * rows — flat (as generated), linearly ts-sorted, z-ordered on
  * (user_id, ts) — each probed with the declared `layout_zorder` box
  * (user cohort × time window), reporting per layout:
  *
  *   - rows the SCAN emits (post row-group/page skipping, pre-Filter:
  *     `FileSourceScanExec.metrics("numOutputRows")` — the ground truth
  *     pruning measurement the INT96 find proved plan strings cannot
  *     give)
  *   - box-query wall (min of 3)
  *   - one-time layout build wall (the pay-once range shuffle)
  *
  * Scale note: at the ScaleUp sfs the box's user range [3, 11] selects
  * replica-0 users only, so cohort selectivity SHRINKS as the corpus
  * grows (0.6% at sf1) while the time window stays ~23% — exactly the
  * regime where a time-only sort leaves 40× too many rows on the table
  * and 2-D clustering pays. AQE is disabled for the measured probes so
  * the scan node stays visible to plan collection (same discipline as
  * LayoutSpec).
  *
  * Run: SPARK_GRAFT_SF_DIR=testdata-sf1 SPARK_GRAFT_ZORDERLAB_OUT=zorder_sf1.json \
  *        sbt "runMain graft.ZOrderLab"
  */
object ZOrderLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "testdata-sf1")
    val files = sys.env.getOrElse("SPARK_GRAFT_ZORDER_FILES", "128").toInt
    // AQE off is a LAB INVARIANT (scan-row ground truth must not shift
    // with adaptive coalescing) — extra wins over the SPARK_GRAFT_AQE env.
    val spark = GraftSession.build(extra = Seq(
      "spark.sql.adaptive.enabled" -> "false"))

    val ev = graft.sources.Tables.events(spark, sfDir)
    val total = ev.count()
    val base = java.nio.file.Files.createTempDirectory("graft_zorderlab").toString

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (_, buildLinear) = timed {
      ev.repartitionByRange(files, col("ts")).sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(s"$base/linear")
    }
    val (_, buildZ) = timed {
      graft.sources.ZOrder.zOrdered(ev, "user_id", "ts", files)
        .write.mode("overwrite").parquet(s"$base/zorder")
    }
    val (_, buildH) = timed {
      graft.sources.ZOrder.zOrdered(ev, "user_id", "ts", files, curve = "hilbert")
        .write.mode("overwrite").parquet(s"$base/hilbert")
    }

    import graft.sources.ZOrder.{TsHi, TsLo, UserHi, UserLo}
    // Box A: the declared layout_zorder box (tiny cohort x 23% window).
    // Box B: the Z worst case — a box STRADDLING the domain midpoint in
    // BOTH dimensions (the top interleave bit flips inside the box, so
    // the Z curve teleports across it; Hilbert stays edge-connected).
    // Bounds are data-derived: ±2% of each span around the midpoint.
    val dom = ev.agg(min("user_id"), max("user_id"),
      min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).collect()(0)
    val (uLo, uHi) = (dom.getLong(0), dom.getLong(1))
    val (tLo, tHi) = (dom.getLong(2), dom.getLong(3))
    def mid(lo: Long, hi: Long, f1: Double, f2: Double): (Long, Long) =
      (lo + ((hi - lo) * f1).toLong, lo + ((hi - lo) * f2).toLong)
    // user side is ±10% (the ScaleUp id space is sparse — replica
    // offsets leave gaps, and a ±2% box lands entirely in one); time is
    // dense, ±2% suffices. Both still cross the quantized midpoint.
    val (uA, uB) = mid(uLo, uHi, 0.40, 0.60)
    val (tA, tB) = mid(tLo, tHi, 0.48, 0.52)

    val declaredBox: DataFrame => DataFrame = df => df.filter(
      col("user_id").between(UserLo, UserHi) &&
        col("ts") >= lit(TsLo).cast("timestamp") &&
        col("ts") < lit(TsHi).cast("timestamp"))
    // Bounds as TIMESTAMP LITERALS, not unix_micros(ts) bounds: a
    // function of the column is not a pushable predicate, and an
    // unpushed ts filter would silently disable time pruning on every
    // layout (measured: linear read 100% under the micros form).
    def inst(us: Long) =
      java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)
    val straddleBox: DataFrame => DataFrame = df => df.filter(
      col("user_id").between(uA, uB) &&
        col("ts") >= lit(inst(tA)) && col("ts") <= lit(inst(tB)))

    def probe(path: String, box: DataFrame => DataFrame): (Long, Long, Double) = {
      // Scan SQLMetrics RESET when the same physical plan re-executes
      // (measured: numOutputRows reads 0 after a second collect), so the
      // metric is read from a FRESH Dataset after exactly ONE action;
      // wall timing uses separate fresh instances.
      def fresh() = box(spark.read.parquet(path))
        .agg(count(lit(1)).as("n"), sum("value").as("sv"))
      val q = fresh()
      val rows = q.collect()(0).getLong(0)
      val plan = q.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scan = plan.collect { case f: FileSourceScanExec => f }.head
      // non-vacuous pushdown guard: an empty pushed list renders as
      // "PushedFilters: []" and would match a substring check — read the
      // scan's metadata entry and require actual filter content
      val pushed = scan.metadata.getOrElse("PushedFilters", "[]")
      require(pushed.replaceAll("[\\[\\]\\s]", "").nonEmpty,
        s"box predicates must push down to the scan, got: $pushed")
      val scanRows = scan.metrics("numOutputRows").value
      val walls = (1 to 3).map(_ => timed(fresh().collect())._2)
      (scanRows, rows, walls.min)
    }

    def arm(name: String, box: DataFrame => DataFrame): String = {
      val (flatScan, nFlat, wFlat) = probe(s"$sfDir/events.parquet", box)
      val (linScan, nLin, wLin) = probe(s"$base/linear", box)
      val (zScan, nZ, wZ) = probe(s"$base/zorder", box)
      val (hScan, nH, wH) = probe(s"$base/hilbert", box)
      require(nFlat == nLin && nLin == nZ && nZ == nH && nZ > 0,
        s"layouts must agree on the answer: $nFlat/$nLin/$nZ/$nH")
      f""""$name":{"box_rows":$nZ,"scan_rows":{"flat":$flatScan,"linear_ts_sorted":$linScan,"zorder":$zScan,"hilbert":$hScan},"box_wall_sec":{"flat":$wFlat%.3f,"linear_ts_sorted":$wLin%.3f,"zorder":$wZ%.3f,"hilbert":$wH%.3f},"zorder_vs_linear_rows":${f"${zScan.toDouble / math.max(linScan, 1)}%.3f"},"hilbert_vs_zorder_rows":${f"${hScan.toDouble / math.max(zScan, 1)}%.3f"}}"""
    }

    // ---- r11 arm: 3-D layout (user_id x event_type x ts) ----------------
    // The N-D generalization's measured trade: the 3-D box prunes on ALL
    // three dimensions (vs the 2-D layout, where event_type never prunes),
    // while the 2-D declared box pays the resolution-share cost on the
    // 3-D layout (each dimension keeps 1/3 of the bit positions).
    val arm3d: String = {
      val (_, build3) = timed {
        graft.sources.ZOrder.zOrderedN(ev,
          Seq("user_id", "event_type", "ts"), files)
          .write.mode("overwrite").parquet(s"$base/zorder3")
      }
      import graft.sources.ZOrder.{TypeHi, TypeLo}
      val box3: DataFrame => DataFrame = df => df.filter(
        col("user_id").between(UserLo, UserHi) &&
          col("event_type").between(TypeLo, TypeHi) &&
          col("ts") >= lit(TsLo).cast("timestamp") &&
          col("ts") < lit(TsHi).cast("timestamp"))
      val (fScan, nF, _) = probe(s"$sfDir/events.parquet", box3)
      val (z2Scan, n2, _) = probe(s"$base/zorder", box3)
      val (z3Scan, n3, w3) = probe(s"$base/zorder3", box3)
      val (z3On2d, n23, _) = probe(s"$base/zorder3", declaredBox)
      val (z2On2d, n22, _) = probe(s"$base/zorder", declaredBox)
      require(nF == n2 && n2 == n3 && n22 == n23 && n3 > 0,
        s"layouts must agree: $nF/$n2/$n3 and $n22/$n23")
      f""""arm_3d":{"build_wall_sec":$build3%.2f,"box3_rows":$n3,"box3_scan_rows":{"flat":$fScan,"zorder2d":$z2Scan,"zorder3d":$z3Scan},"box3_wall_sec":$w3%.3f,"declared2d_box_scan_rows":{"zorder2d":$z2On2d,"zorder3d":$z3On2d},"zorder3d_vs_2d_on_box3":${f"${z3Scan.toDouble / math.max(z2Scan, 1)}%.3f"},"resolution_share_cost_on_2d_box":${f"${z3On2d.toDouble / math.max(z2On2d, 1)}%.3f"}}"""
    }

    // ---- r16 arm: N-D HILBERT vs N-D Z on the same 3-D layouts ----------
    // The Skilling N-D kernel's measured ladder (VERDICT r15 #7): same
    // 3-D quantized grid, same file count, curve swapped. Probed with the
    // declared 3-D box AND a midpoint-straddle 3-D box (the Z teleport
    // case the 2-D hilbert arm measures at 0.62-0.75x) — Hilbert's
    // edge-connected tiles should read fewer rows exactly there.
    val armHilbert3d: String = {
      import graft.sources.ZOrder.{TypeHi, TypeLo}
      val (_, buildH3) = timed {
        graft.sources.ZOrder.zOrderedN(ev,
          Seq("user_id", "event_type", "ts"), files, curve = "hilbert")
          .write.mode("overwrite").parquet(s"$base/hilbert3")
      }
      val box3: DataFrame => DataFrame = df => df.filter(
        col("user_id").between(UserLo, UserHi) &&
          col("event_type").between(TypeLo, TypeHi) &&
          col("ts") >= lit(TsLo).cast("timestamp") &&
          col("ts") < lit(TsHi).cast("timestamp"))
      val straddle3: DataFrame => DataFrame = df => df.filter(
        col("user_id").between(uA, uB) &&
          col("event_type").between(TypeLo, TypeHi) &&
          col("ts") >= lit(inst(tA)) && col("ts") <= lit(inst(tB)))
      val (z3Scan, n3, w3)    = probe(s"$base/zorder3", box3)
      val (h3Scan, nH3, wH3)  = probe(s"$base/hilbert3", box3)
      val (z3sScan, nS, w3s)  = probe(s"$base/zorder3", straddle3)
      val (h3sScan, nHS, wH3s) = probe(s"$base/hilbert3", straddle3)
      require(n3 == nH3 && nS == nHS && n3 > 0,
        s"curves must agree on the answer: $n3/$nH3 and $nS/$nHS")
      f""""arm_hilbert3d":{"build_wall_sec":$buildH3%.2f,"box3_rows":$n3,"box3_scan_rows":{"zorder3d":$z3Scan,"hilbert3d":$h3Scan},"box3_wall_sec":{"zorder3d":$w3%.3f,"hilbert3d":$wH3%.3f},"straddle3_rows":$nS,"straddle3_scan_rows":{"zorder3d":$z3sScan,"hilbert3d":$h3sScan},"straddle3_wall_sec":{"zorder3d":$w3s%.3f,"hilbert3d":$wH3s%.3f},"hilbert_vs_z_rows_box3":${f"${h3Scan.toDouble / math.max(z3Scan, 1)}%.3f"},"hilbert_vs_z_rows_straddle3":${f"${h3sScan.toDouble / math.max(z3sScan, 1)}%.3f"}}"""
    }

    // ---- r11 arm: equi-depth vs linear quantizer under 90% skew ---------
    // The ZOrderSpec skew fixture at sf scale, on real event rows: a
    // deterministic remap packs 90% of rows into 11 hot keys of a 1e9
    // domain (linear quantizer collapse), 10% spread wide. Layout files =
    // 128 — tiles finer than the hot keys' rank footprint, the
    // precondition the spec records. Probe = 2 hot keys x ~20% of the
    // time span.
    val armSkew: String = {
      val skewed = ev.withColumn("user_id",
        when(pmod(col("event_id"), lit(10)) < 9, pmod(col("user_id"), lit(11)))
          .otherwise(pmod(col("user_id") * 104729L, lit(1000000000L))))
      val skFiles = 128
      val (_, bLin) = timed {
        graft.sources.ZOrder.zOrdered(skewed, "user_id", "ts", skFiles)
          .write.mode("overwrite").parquet(s"$base/skew_linear")
      }
      val (_, bEq) = timed {
        graft.sources.ZOrder.zOrderedEquiDepth(skewed, "user_id", "ts", skFiles)
          .write.mode("overwrite").parquet(s"$base/skew_equidepth")
      }
      val (t20a, t20b) = mid(tLo, tHi, 0.30, 0.50)
      val hotBox: DataFrame => DataFrame = df => df.filter(
        col("user_id").between(2, 3) &&
          col("ts") >= lit(inst(t20a)) && col("ts") <= lit(inst(t20b)))
      val (linScan, nL, wL) = probe(s"$base/skew_linear", hotBox)
      val (eqScan, nE, wE) = probe(s"$base/skew_equidepth", hotBox)
      require(nL == nE && nE > 0, s"quantizers must agree on the answer: $nL/$nE")
      f""""arm_skew_quantizer":{"files":$skFiles,"box_rows":$nE,"build_wall_sec":{"linear_quant":$bLin%.2f,"equi_depth":$bEq%.2f},"scan_rows":{"linear_quant":$linScan,"equi_depth":$eqScan},"box_wall_sec":{"linear_quant":$wL%.3f,"equi_depth":$wE%.3f},"equidepth_vs_linear_rows":${f"${eqScan.toDouble / math.max(linScan, 1)}%.3f"}}"""
    }

    // ---- r12 arm: N-D equi-depth (skew quantizer x 3-D curve) -----------
    // The same 90%-hot-key skew remap, clustered on THREE columns
    // (user_id x ts x event_type): does the equi-depth rescue survive a
    // categorical third dimension sharing the bit budget, and what does
    // the codegen'd rank kernel cost per extra dimension at build time?
    val armSkew3d: String = {
      val skewed = ev.withColumn("user_id",
        when(pmod(col("event_id"), lit(10)) < 9, pmod(col("user_id"), lit(11)))
          .otherwise(pmod(col("user_id") * 104729L, lit(1000000000L))))
      val skFiles = 128
      val (_, bLin) = timed {
        graft.sources.ZOrder.zOrderedN(skewed,
          Seq("user_id", "ts", "event_type"), skFiles)
          .write.mode("overwrite").parquet(s"$base/skew3_linear")
      }
      val (_, bEq) = timed {
        graft.sources.ZOrder.zOrderedEquiDepthN(skewed,
          Seq("user_id", "ts", "event_type"), skFiles)
          .write.mode("overwrite").parquet(s"$base/skew3_equidepth")
      }
      val (t20a, t20b) = mid(tLo, tHi, 0.30, 0.50)
      val hotBox: DataFrame => DataFrame = df => df.filter(
        col("user_id").between(2, 3) &&
          col("ts") >= lit(inst(t20a)) && col("ts") <= lit(inst(t20b)))
      val (linScan, nL, wL) = probe(s"$base/skew3_linear", hotBox)
      val (eqScan, nE, wE) = probe(s"$base/skew3_equidepth", hotBox)
      require(nL == nE && nE > 0, s"3-D quantizers must agree on the answer: $nL/$nE")
      f""""arm_skew_quantizer_3d":{"files":$skFiles,"box_rows":$nE,"build_wall_sec":{"linear_quant":$bLin%.2f,"equi_depth":$bEq%.2f},"scan_rows":{"linear_quant":$linScan,"equi_depth":$eqScan},"box_wall_sec":{"linear_quant":$wL%.3f,"equi_depth":$wE%.3f},"equidepth_vs_linear_rows":${f"${eqScan.toDouble / math.max(linScan, 1)}%.3f"}}"""
    }

    // ---- r11 arm: append/compact lifecycle ------------------------------
    // Adversarial full-domain-overlap profile: 8 hash-split batches (each
    // spans the whole (user, ts) domain — the worst case for
    // cross-generation tile overlap; time-sliced appends are bounded by
    // construction). Curve recorded: declared-box scan rows + file count
    // after every appendBatch generation, then after compact — the
    // overlap growth appendBatch's scaladoc promises compact reclaims.
    val armLifecycle: String = {
      val lcPath = s"$base/lifecycle"
      val gens = 8
      val slices = (0 until gens).map(g => ev.filter(pmod(col("event_id"), lit(gens)) === g))
      graft.sources.ZOrder.zOrdered(slices.head, "user_id", "ts", files = 16)
        .write.mode("overwrite").parquet(lcPath)
      def fileCount = new java.io.File(lcPath).listFiles()
        .count(_.getName.endsWith(".parquet"))
      def boxScan(): (Long, Long) = {
        val (s, n, _) = probe(lcPath, declaredBox)
        (s, n)
      }
      val curve = scala.collection.mutable.ArrayBuffer[String]()
      val (s0, n0) = boxScan()
      curve += s"""{"gen":0,"files":$fileCount,"box_rows":$n0,"scan_rows":$s0}"""
      slices.tail.zipWithIndex.foreach { case (batch, i) =>
        graft.sources.ZOrder.appendBatch(batch, lcPath, "user_id", "ts", files = 16)
        val (sg, ng) = boxScan()
        curve += s"""{"gen":${i + 1},"files":$fileCount,"box_rows":$ng,"scan_rows":$sg}"""
      }
      val (_, wCompact) = timed {
        graft.sources.ZOrder.compact(spark, lcPath, "user_id", "ts", files)
      }
      val (sc, nc) = boxScan()
      f""""arm_lifecycle":{"generations":$gens,"curve":[${curve.mkString(",")}],"compact_wall_sec":$wCompact%.2f,"post_compact":{"files":$fileCount,"box_rows":$nc,"scan_rows":$sc}}"""
    }

    // ---- r13 arm: time-partitioning × z-clustering composed -------------
    // The layout a real 100 TB warehouse actually runs: the fact is
    // partitionBy(month) — directory pruning serves the time filter —
    // and WITHIN each month the rows are z-tiled on two attribute
    // columns, so footer stats serve the attribute box. Claims under
    // measurement (VERDICT r12 #7), granularity-honest: (a) the levers
    // COMPOSE — z strictly tightens the partition-pruned scan
    // (composed < bymonth at every tile budget); (b) the within-month
    // z fraction follows the tile-resolution law (16 tiles/month prunes
    // harder than 4); (c) partition pruning is UNDISTURBED by the
    // z rewrite (composed touches only the box months' directories).
    // The naive "product of standalone levers" is NOT the right
    // prediction: a global 320-tile z layout carries an ~18×18 grid
    // while 4 tiles/month is a 2×2 grid per month — the residual gap
    // is resolution share, not interference, and the k=4 vs k=16 pair
    // prices exactly that. Events span one month, so this arm runs on
    // ORDERS (7-year span, the DPP table): box = one quarter
    // (3/~84 months) × mid-range custkey × mid-range totalprice.
    val armCompose: String = {
      val z = graft.sources.ZOrder
      val ord = graft.sources.Tables.orders(spark, sfDir)
        .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
      val nMonths = ord.select("month").distinct().count().toInt
      val tileArms = sys.env.getOrElse("SPARK_GRAFT_ZORDER_TILES_PER_MONTH", "4,16")
        .split(",").map(_.trim.toInt).toSeq
      // attribute box: mid-range slices of both clustered columns,
      // data-derived like the straddle box (10% of custkey × 20% of
      // totalprice — selective but multi-tile)
      val od = ord.agg(min("o_custkey"), max("o_custkey"),
        min("o_totalprice"), max("o_totalprice")).collect()(0)
      val (cLo, cHi) = mid(od.getLong(0), od.getLong(1), 0.45, 0.55)
      val (pLo, pHi) = (od.getDouble(2) + (od.getDouble(3) - od.getDouble(2)) * 0.30,
        od.getDouble(2) + (od.getDouble(3) - od.getDouble(2)) * 0.50)
      val q = graft.sources.Partitioned.QuarterMonths
      val attrBox: DataFrame => DataFrame = df => df.filter(
        col("o_custkey").between(cLo, cHi) &&
          col("o_totalprice").between(pLo, pHi))
      // month filter form per layout: a pushable o_orderdate range on
      // unpartitioned layouts, the partition column on partitioned ones
      val dateBox: DataFrame => DataFrame = df => attrBox(df.filter(
        graft.sources.Tables.inMonth(col("o_orderdate"), q.head) ||
          graft.sources.Tables.inMonth(col("o_orderdate"), q(1)) ||
          graft.sources.Tables.inMonth(col("o_orderdate"), q(2))))
      val partBox: DataFrame => DataFrame = df =>
        attrBox(df.filter(col("month").isin(q: _*)))

      // layouts: month-partitioned only; global z only (same total tile
      // count as the largest composed arm, for the resolution context);
      // composed at each tile budget
      val withz = z.withZ(ord, "o_custkey", "o_totalprice")
      val (_, bPart) = timed {
        ord.repartition(col("month"))
          .write.mode("overwrite").partitionBy("month")
          .parquet(s"$base/ord_bymonth")
      }
      val (_, bZ) = timed {
        withz.repartitionByRange(nMonths * tileArms.max, col("z"))
          .sortWithinPartitions("z")
          .drop("z", "month")
          .write.mode("overwrite").parquet(s"$base/ord_zonly")
      }
      val composedBuilds = tileArms.map { k =>
        val (_, b) = timed {
          // range-partition on (month, z): each writer task holds one
          // contiguous (month, z-range) slice → ~k z-tile files inside
          // each month directory
          withz.repartitionByRange(nMonths * k, col("month"), col("z"))
            .sortWithinPartitions("month", "z").drop("z")
            .write.mode("overwrite").partitionBy("month")
            .parquet(s"$base/ord_bymonth_z$k")
        }
        k -> b
      }
      def probeF(path: String, box: DataFrame => DataFrame): (Long, Long, Long, Double) = {
        def fresh() = box(spark.read.parquet(path))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("sp"))
        val qd = fresh()
        val n = qd.collect()(0).getLong(0)
        val plan = qd.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        val scan = plan.collect { case f: FileSourceScanExec => f }.head
        val (sr, nf) = (scan.metrics("numOutputRows").value,
          scan.metrics.get("numFiles").map(_.value).getOrElse(-1L))
        val wall = (1 to 3).map(_ => timed(fresh().collect())._2).min
        (sr, nf, n, wall)
      }
      val (sFlat, fFlat, nFlat, wFlat) = probeF(s"$sfDir/orders.parquet", dateBox)
      val (sPart, fPart, nPart, wPart) = probeF(s"$base/ord_bymonth", partBox)
      val (sZ, fZ, nZ2, wZ2) = probeF(s"$base/ord_zonly", dateBox)
      val composed = tileArms.map { k =>
        k -> probeF(s"$base/ord_bymonth_z$k", partBox)
      }
      composed.foreach { case (k, (sB, fB, nB, _)) =>
        require(nB == nPart && nB > 0,
          s"composed k=$k answer drifted: $nB vs $nPart")
        // claim (a): z strictly tightens the partition-pruned scan
        require(sB < sPart,
          s"composed k=$k did not tighten bymonth: $sB vs $sPart")
        // claim (c): partition pruning undisturbed — only the box
        // months' tile files are touched (k+2 per month: a (month,z)
        // range partition straddling a month boundary writes a file
        // into each neighboring directory)
        require(fB <= 3L * (k + 2),
          s"composed k=$k read $fB files — partition pruning degraded")
      }
      require(nFlat == nPart && nPart == nZ2,
        s"layouts must agree on the answer: $nFlat/$nPart/$nZ2")
      // claim (b): the within-month fraction follows tile resolution
      val fracs = composed.map { case (k, (sB, _, _, _)) =>
        k -> sB.toDouble / sPart }
      require(fracs.sortBy(_._1).sliding(2).forall {
        case Seq((_, a), (_, b)) => b <= a; case _ => true },
        s"within-month pruning must improve with tiles: $fracs")
      val ordTotal = ord.count()
      val monthFrac = sPart.toDouble / ordTotal
      val composedJson = composed.map { case (k, (sB, fB, nB, wB)) =>
        f""""k$k":{"build_wall_sec":${composedBuilds.toMap.apply(k)}%.2f,"scan_rows":$sB,"files_read":$fB,"box_wall_sec":$wB%.3f,"within_month_fraction":${f"${sB.toDouble / sPart}%.4f"}}"""
      }.mkString(",")
      f""""arm_partition_compose":{"table":"orders","months":$nMonths,"box":"quarter(3 months) x 10%% custkey x 20%% totalprice","box_rows":$nPart,"total_rows":$ordTotal,"month_fraction":$monthFrac%.4f,"flat":{"scan_rows":$sFlat,"files_read":$fFlat,"box_wall_sec":$wFlat%.3f},"bymonth":{"build_wall_sec":$bPart%.2f,"scan_rows":$sPart,"files_read":$fPart,"box_wall_sec":$wPart%.3f},"zonly_${nMonths * tileArms.max}tiles":{"build_wall_sec":$bZ%.2f,"scan_rows":$sZ,"files_read":$fZ,"box_wall_sec":$wZ2%.3f,"fraction_of_total":${f"${sZ.toDouble / ordTotal}%.4f"}},"composed":{$composedJson}}"""
    }

    val json =
      f"""{"experiment":"zorder_skipping","sf":"$sfDir","total_rows":$total,"files":$files,"build_wall_sec":{"linear":$buildLinear%.2f,"zorder":$buildZ%.2f,"hilbert":$buildH%.2f},${arm("declared_box", declaredBox)},${arm("midpoint_straddle_box", straddleBox)},$arm3d,$armHilbert3d,$armSkew,$armSkew3d,$armLifecycle,$armCompose}"""
    println(json)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_ZORDERLAB_OUT", "zorderlab.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))

    // temp layouts can be multi-GB at sf10 — reclaim before exit
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rm)
      p.delete()
    }
    rm(new java.io.File(base))
    spark.stop()
  }
}
