package graft

import graft.sources.{Tables, ZOrder}
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("interleaveBits: known values and range bounds") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      (0L, 0L), (0L, 3L), (1L, 2L), (3L, 0L), (3L, 3L), (0xFFFFL, 0xFFFFL))
      .toDF("a", "b")
      .withColumn("z", ZOrder.interleaveBits(col("a"), col("b"), 16))
      .orderBy("a", "b").collect().map(_.getLong(2)).toSeq
    // bit i of a -> position 2i, bit i of b -> position 2i+1
    val expected = Seq(
      0L,           // (0,0)
      10L,          // (0,3): b bits land at 1,3 -> 0b1010
      9L,           // (1,2): a bit0 -> 0b0001; b bit1 -> 0b1000
      5L,           // (3,0): a bits land at 0,2 -> 0b0101
      15L,          // (3,3) -> 0b1111
      0xFFFFFFFFL)  // (0xFFFF,0xFFFF) -> 32 ones
    assert(rows == expected, s"unexpected z values: ${rows.mkString(",")}")
  }

  test("z locality: points close in both dimensions land close on the curve") {
    val sp = spark
    import sp.implicits._
    // quantized ranks are the identity here (min 0, max 65535 present)
    val df = Seq((0L, 0L), (1L, 1L), (65535L, 65535L))
      .toDF("user_id", "v")
    val z = ZOrder.withZ(df, "user_id", "v").orderBy("user_id")
      .select("z").collect().map(_.getLong(0))
    assert(z(0) == 0L && z(1) == 3L && z(2) == 0xFFFFFFFFL,
      s"corner points must map to curve extremes: ${z.mkString(",")}")
  }

  test("zOrdered preserves rows and schema exactly") {
    val ev = Tables.events(spark, sf)
    val out = ZOrder.zOrdered(ev, "user_id", "ts", files = 8)
    assert(out.schema == ev.schema, "layout must not change the schema")
    assert(out.count() == ev.count(), "layout must not change the row set")
    // orderless fingerprint equality: same multiset of event_ids
    val a = ev.agg(sum(col("event_id"))).collect()(0).getLong(0)
    val b = out.agg(sum(col("event_id"))).collect()(0).getLong(0)
    assert(a == b)
  }

  test("hilbert: bijective over the full order-4 grid, every step a unit move") {
    // The property Z lacks and Hilbert exists for: consecutive curve
    // indices are grid NEIGHBORS (|dx|+|dy| == 1), so an index range is
    // an edge-connected tile — no boundary teleports. Checked
    // exhaustively on the 16x16 grid via the scalar twin of the codegen.
    import graft.functions.HilbertIndex
    val cells = for (x <- 0 until 16; y <- 0 until 16)
      yield (HilbertIndex.compute(x, y, 4), (x, y))
    val byD = cells.toMap
    assert(byD.size == 256, "curve must be a bijection on the grid")
    assert(cells.map(_._1).min == 0 && cells.map(_._1).max == 255)
    (0 until 255).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert((x1 - x2).abs + (y1 - y2).abs == 1,
        s"step $d -> ${d + 1} must be a unit move: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("hilbert N-D: bijective + unit-step over full 3-D and 4-D grids, inverse round-trips") {
    // Same exhaustive discipline as the 2-D grid test, on the Skilling
    // N-D kernel: bijection onto [0, 2^(n*order)), every consecutive
    // index a UNIT grid move (the edge-connected-tile property the
    // curve exists for), and inverse(compute(x)) == x everywhere.
    import graft.functions.HilbertIndexN
    for ((n, order) <- Seq((3, 3), (4, 2))) {
      val side = 1 << order
      val total = 1L << (n * order)
      def coords(cell: Int): Array[Long] =
        Array.tabulate(n)(j => ((cell / math.pow(side, j).toInt) % side).toLong)
      val cells = (0 until total.toInt).map { c =>
        val xs = coords(c); HilbertIndexN.compute(xs, order) -> xs.toSeq
      }
      val byD = cells.toMap
      assert(byD.size == total, s"$n-D order-$order curve must be a bijection")
      assert(cells.map(_._1).min == 0 && cells.map(_._1).max == total - 1)
      (0L until total - 1).foreach { d =>
        val a = byD(d); val b = byD(d + 1)
        assert(a.zip(b).map { case (p, q) => (p - q).abs }.sum == 1,
          s"$n-D step $d -> ${d + 1} must be a unit move: $a -> $b")
      }
      cells.foreach { case (d, xs) =>
        assert(HilbertIndexN.inverse(d, n, order).toSeq == xs,
          s"inverse must round-trip $n-D index $d")
      }
    }
  }

  test("hilbert N-D expression: codegen path agrees with the scalar twin; NULL element -> NULL") {
    val sp = spark
    import sp.implicits._
    import graft.functions.HilbertIndexN
    val pts = Seq(Seq(0L, 0L, 0L), Seq(1L, 2L, 3L), Seq(65535L, 0L, 65535L),
      Seq(32767L, 32768L, 12345L), Seq(65535L, 65535L, 65535L))
    val fn = graft.plans.GraftExtensions.HilbertNName
    val got = pts.toDF("xs").selectExpr(s"$fn(xs) AS h")
      .collect().map(_.getLong(0))
    pts.zip(got).foreach { case (xs, h) =>
      assert(h == HilbertIndexN.compute(xs.toArray, 16),
        s"$xs: SQL surface must match the scalar twin")
    }
    val nulls = sp.sql(s"SELECT $fn(array(CAST(1 AS BIGINT), CAST(NULL AS BIGINT)))" +
      s" AS h UNION ALL SELECT $fn(CAST(NULL AS ARRAY<BIGINT>))")
      .collect().map(r => r.isNullAt(0))
    assert(nulls.forall(identity), "NULL array or element must yield NULL index")
  }

  test("hilbert expression: codegen path agrees with the scalar twin") {
    val sp = spark
    import sp.implicits._
    import graft.functions.HilbertIndex
    val pts = Seq((0L, 0L), (1L, 2L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L), (32767L, 32768L))
    val got = pts.toDF("a", "b")
      .selectExpr("a", "b", s"${graft.plans.GraftExtensions.HilbertName}(a, b) AS h")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (a, b) =>
      assert(got((a, b)) == HilbertIndex.compute(a, b, 16),
        s"($a,$b): SQL surface must match the scalar twin")
    }
  }

  test("hilbert-curve layout preserves rows and schema like the z layout") {
    val ev = Tables.events(spark, sf)
    val out = ZOrder.zOrdered(ev, "user_id", "ts", files = 8, curve = "hilbert")
    assert(out.schema == ev.schema)
    assert(out.count() == ev.count())
  }

  test("3-D hilbert layout preserves rows and schema (the layout_hilbert shape)") {
    val ev = Tables.events(spark, sf)
    val out = ZOrder.zOrderedN(ev, Seq("user_id", "event_type", "ts"),
      files = 8, curve = "hilbert")
    assert(out.schema == ev.schema)
    assert(out.count() == ev.count())
    // 4-D at the 16-bit quantizer cannot fit a long — loud, not silent
    val e = intercept[IllegalArgumentException] {
      ZOrder.zOrderedN(ev, Seq("user_id", "event_type", "ts", "event_id"),
        curve = "hilbert").count()
    }
    assert(e.getMessage.contains("fit a long"))
  }

  test("unknown curve name is a loud error") {
    val ev = Tables.events(spark, sf)
    intercept[IllegalArgumentException] {
      ZOrder.withZ(ev, "user_id", "ts", curve = "peano")
    }
  }

  test("bucket-rank native kernel == interpreted HOF on boundaries and duplicates") {
    // the codegen'd binary search (upper bound) must equal the linear
    // count(v >= c) the fallback computes — including values below all
    // cuts, above all cuts, and EQUAL to a duplicated cut (where a
    // lower-bound search would differ)
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.{aggregate => aggr}
    val cuts = Array(-5L, 0L, 0L, 3L, 7L, 7L, 7L, 100L)
    val values = Seq(-100L, -5L, -4L, 0L, 1L, 3L, 7L, 8L, 100L, 1000L) ++
      (0 until 500).map(i => (i.toLong * 104729L) % 250L - 50L)
    val df = values.toDF("v").withColumn("cuts", typedLit(cuts))
    val native = call_function(
      graft.plans.GraftExtensions.BucketRankName, col("v"), col("cuts"))
    val hof = aggr(col("cuts"), lit(0L),
      (acc, c) => acc + when(col("v") >= c, 1L).otherwise(0L))
    val bad = df.select(col("v"), native.as("n"), hof.as("h"))
      .filter(col("n") =!= col("h")).collect()
    assert(bad.isEmpty, s"native != HOF for: ${bad.mkString(", ")}")
  }

  test("equi-depth quantizer restores pruning the linear one loses under skew") {
    // Failure mode pinned: 90% of users in [0,10] of a 1e9 domain →
    // linear scaling maps the dense mass to rank 0, rows tie on z, and
    // the user dimension stops pruning for exactly the hot data. The
    // equi-depth ranks spread the dense mass over the grid; the same
    // box then reads a FRACTION of what the linear layout reads.
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    val n = 20000
    val rows = (0 until n).map { i =>
      // deterministic skew: 90% of users uniform in [0,10], 10% spread
      // to 1e9; ts uniform over one day (µs)
      val u = if (i % 10 < 9) (i * 7) % 11L else (i.toLong * 104729L) % 1000000000L
      val ts = new java.sql.Timestamp(1704067200000L + (i.toLong * 86400000L / n))
      (u, ts, i.toLong)
    }.toDF("user_id", "ts", "v")
    val base = java.nio.file.Files.createTempDirectory("graft_zskew").toString
    // 128 files: tiles must be FINER than the dense users' rank
    // footprint (~21 equi-depth buckets per hot user) or file-level
    // stats still span several hot users and the box prunes nothing —
    // measured: at 32 files the equi-depth layout read as much as the
    // linear one
    graft.sources.ZOrder.zOrdered(rows, "user_id", "ts", files = 128)
      .write.mode("overwrite").parquet(s"$base/linear_quant")
    graft.sources.ZOrder.zOrderedEquiDepth(rows, "user_id", "ts", files = 128)
      .write.mode("overwrite").parquet(s"$base/equidepth")

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def scanRows(path: String): (Long, Long) = {
        // hot-region box: 2 of the 11 dense users x a 20% time window
        val q = spark.read.parquet(path)
          .filter(col("user_id").between(2, 3) &&
            col("ts") >= lit("2024-01-01 02:00:00").cast("timestamp") &&
            col("ts") < lit("2024-01-01 06:48:00").cast("timestamp"))
          .agg(count(lit(1)).as("n"))
        val got = q.collect()(0).getLong(0)
        val scan = q.queryExecution.executedPlan.collect {
          case f: FileSourceScanExec => f
        }.head
        (scan.metrics("numOutputRows").value, got)
      }
      val (linScan, nLin) = scanRows(s"$base/linear_quant")
      val (eqScan, nEq) = scanRows(s"$base/equidepth")
      assert(nLin == nEq && nEq > 0, s"answers must agree: $nLin/$nEq")
      // measured 0.55x: the residual cost above the ~0.2x ideal is the
      // hot users' rank range [~42..101] straddling Z's bit-64 boundary
      // (the same wart ZORDERLAB quantifies; hilbert would shave it) —
      // the assert pins the robust fraction, not the lucky one
      assert(eqScan < linScan * 6 / 10,
        s"equi-depth must cut the skewed-domain scan by >40%: " +
          s"equidepth=$eqScan linear-quant=$linScan of $n")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("append keeps the layout prunable; compact folds it back to target shape") {
    // The maintenance cycle: base layout -> z-ordered batch appends
    // (cheap: one range shuffle of the BATCH) -> amortized compact.
    // Pinned: (a) answers always include appended rows, (b) the scan
    // stays pruned THROUGH the append (appended files are tiles too),
    // (c) compact restores the target file count with the same answer.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir01 = "/root/testdata/sf0.01"
    val ev = Tables.events(spark, dir01)
    val base = java.nio.file.Files.createTempDirectory("graft_zappend").toString + "/layout"
    graft.sources.ZOrder.zOrdered(ev, "user_id", "ts", files = 64)
      .write.mode("overwrite").parquet(base)
    // batch: a fresh day of activity for the boxed cohort (ids offset
    // to stay unique; ts inside the box window)
    val batch = ev.limit(500)
      .withColumn("event_id", col("event_id") + 10000000L)
      .withColumn("user_id", pmod(col("user_id"), lit(15)) + 40L)
      .withColumn("ts", lit("2024-01-17 12:00:00").cast("timestamp"))
    graft.sources.ZOrder.appendBatch(batch, base, "user_id", "ts")

    def boxCount(path: String): (Long, Long) = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val q = spark.read.parquet(path)
          .filter(col("user_id").between(40, 54) &&
            col("ts") >= lit("2024-01-16 00:00:00").cast("timestamp") &&
            col("ts") < lit("2024-01-19 00:00:00").cast("timestamp"))
          .agg(count(lit(1)).as("n"))
        val n = q.collect()(0).getLong(0)
        val scan = q.queryExecution.executedPlan.collect {
          case f: FileSourceScanExec => f
        }.head
        (n, scan.metrics("numOutputRows").value)
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    val total = ev.count() + 500
    val (nAfterAppend, scanAfterAppend) = boxCount(base)
    assert(nAfterAppend >= 500, "appended cohort rows must be visible")
    assert(scanAfterAppend < total / 2,
      s"append must not destroy pruning: scanned $scanAfterAppend of $total")

    graft.sources.ZOrder.compact(spark, base, "user_id", "ts", files = 64)
    val files = new java.io.File(base).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 64, s"compact must restore the target file count, got $files")
    val (nAfterCompact, scanAfterCompact) = boxCount(base)
    assert(nAfterCompact == nAfterAppend, "compact must not change the answer")
    // NOT asserted: scanAfterCompact <= scanAfterAppend. A single
    // point-mass batch is optimally packed in its own delta files, so
    // one compact can mix it into neighboring tiles and scan slightly
    // more (measured 969 -> 1148 of 10500). Compact's contract is the
    // LONG-RUN one — bounded file count and bounded cross-generation
    // overlap as appends accumulate — not per-step monotonicity.
    assert(scanAfterCompact < total / 2,
      s"compacted layout must stay pruned: scanned $scanAfterCompact of $total")
  }

  test("interleaveBitsN: 3-D round-robin positions and long-overflow guard") {
    val sp = spark
    import sp.implicits._
    // bit i of col j lands at 3i + j
    val rows = Seq(
      (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L), (3L, 0L, 0L), (7L, 7L, 7L))
      .toDF("a", "b", "c")
      .withColumn("z", ZOrder.interleaveBitsN(Seq(col("a"), col("b"), col("c")), 16))
      .orderBy("a", "b", "c").collect().map(_.getLong(3)).toSeq
    val expected = Seq(
      4L,    // (0,0,1): c bit0 -> position 2
      2L,    // (0,1,0): b bit0 -> position 1
      1L,    // (1,0,0): a bit0 -> position 0
      9L,    // (3,0,0): a bits 0,1 -> positions 0,3 -> 0b1001
      511L)  // (7,7,7): all 9 low positions set
    assert(rows == expected, s"unexpected 3-D z values: ${rows.mkString(",")}")
    // 4 x 16 bits = 64 > 63 must refuse (the index no longer fits a long)
    intercept[IllegalArgumentException] {
      ZOrder.interleaveBitsN(Seq(col("a"), col("b"), col("c"), col("a")), 16)
    }
  }

  test("string clustering column ranks lexicographically (3-D categorical dim)") {
    val sp = spark
    import sp.implicits._
    // withZN on (k, label): the string image must ORDER like the string,
    // so equal-prefix categories land in contiguous rank ranges
    val df = Seq((0L, "click"), (1L, "error"), (2L, "purchase"),
      (3L, "signup"), (4L, "view"), (5L, "ab"), (6L, "b"))
      .toDF("k", "label")
    val z = ZOrder.withZN(df, Seq("k", "label"))
    assert(z.count() == 7 && z.schema.fieldNames.contains("z"))
    // the underlying packing: byte-lexicographic => "ab" < "b" < "click"
    val ranked = df.select(col("label"),
      org.apache.spark.sql.functions.expr(
        "CAST(conv(hex(substring(encode(rpad(label, 7, '\\u0000'), 'UTF-8'), 1, 7)), 16, 10) AS BIGINT)").as("r"))
      .orderBy("r").collect().map(_.getString(0)).toSeq
    assert(ranked == Seq("ab", "b", "click", "error", "purchase", "signup", "view"),
      s"string ranks must be lexicographic: ${ranked.mkString(",")}")
  }

  test("zOrderedN(3) preserves rows and schema; hilbert covers 3-D since r16") {
    val ev = Tables.events(spark, sf)
    val out = ZOrder.zOrderedN(ev, Seq("user_id", "event_type", "ts"), files = 8)
    assert(out.schema == ev.schema)
    assert(out.count() == ev.count())
    // hilbert 3-D is the Skilling N-D kernel now (r16); the loud refusal
    // moved to the fit-a-long bound (4 dims x 16 bits > 63), pinned in
    // the layout_hilbert shape test above
    assert(ZOrder.withZN(ev, Seq("user_id", "event_type", "ts"),
      curve = "hilbert").count() == ev.count())
  }

  test("equi-depth quantizer shares the hilbert guards with the linear path") {
    val ev = Tables.events(spark, sf)
    // non-default bits on the hilbert path must fail with the explanatory
    // message, not silently degrade clustering (ADVICE r10)
    val e = intercept[IllegalArgumentException] {
      ZOrder.withZEquiDepth(ev, "user_id", "ts", bits = 12, cutBits = 8,
        curve = "hilbert")
    }
    assert(e.getMessage.contains("registered at order"),
      s"expected the order guard, got: ${e.getMessage}")
    // and the equi-depth + hilbert pair is SUPPORTED at default order:
    // the curve consumes the top-shifted equi-depth ranks unchanged
    val z = ZOrder.withZEquiDepth(ev, "user_id", "ts", curve = "hilbert")
    assert(z.count() == ev.count())
  }

  test("equi-depth generalizes to N-D: wrapper == N path, 3-D layout intact, skew still prunes") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    val ev = Tables.events(spark, sf)
    // the 2-D wrapper is the N-D path verbatim: identical z per row
    val byId2 = ZOrder.withZEquiDepth(ev, "user_id", "ts")
      .select("event_id", "z")
    val byIdN = ZOrder.withZEquiDepthN(ev, Seq("user_id", "ts"))
      .select("event_id", "z")
    assert(byId2.exceptAll(byIdN).isEmpty && byIdN.exceptAll(byId2).isEmpty)
    // 3-D equi-depth layout preserves rows and schema like the linear one
    val out = ZOrder.zOrderedEquiDepthN(ev, Seq("user_id", "event_type", "ts"))
    assert(out.schema == ev.schema && out.count() == ev.count())
    // and the quantizer still rescues a skewed dimension with a third
    // dimension sharing the bit budget: same fixture as the 2-D skew
    // test, plus a low-cardinality category column
    val n = 20000
    val rows = (0 until n).map { i =>
      val u = if (i % 10 < 9) (i * 7) % 11L else (i.toLong * 104729L) % 1000000000L
      val ts = new java.sql.Timestamp(1704067200000L + (i.toLong * 86400000L / n))
      (u, ts, s"cat${i % 5}", i.toLong)
    }.toDF("user_id", "ts", "cat", "v")
    val base = java.nio.file.Files.createTempDirectory("graft_zskew3").toString
    ZOrder.zOrderedN(rows, Seq("user_id", "ts", "cat"), files = 128)
      .write.mode("overwrite").parquet(s"$base/linear3")
    ZOrder.zOrderedEquiDepthN(rows, Seq("user_id", "ts", "cat"), files = 128)
      .write.mode("overwrite").parquet(s"$base/equidepth3")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def scanRows(path: String): (Long, Long) = {
        val q = spark.read.parquet(path)
          .filter(col("user_id").between(2, 3) &&
            col("ts") >= lit("2024-01-01 02:00:00").cast("timestamp") &&
            col("ts") < lit("2024-01-01 06:48:00").cast("timestamp"))
          .agg(count(lit(1)).as("n"))
        val got = q.collect()(0).getLong(0)
        val scan = q.queryExecution.executedPlan.collect {
          case f: FileSourceScanExec => f
        }.head
        (scan.metrics("numOutputRows").value, got)
      }
      val (linScan, nLin) = scanRows(s"$base/linear3")
      val (eqScan, nEq) = scanRows(s"$base/equidepth3")
      assert(nLin == nEq && nEq > 0, s"answers must agree: $nLin/$nEq")
      assert(eqScan < linScan,
        s"3-D equi-depth must still out-prune linear under skew: " +
          s"equidepth=$eqScan linear=$linScan of $n")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("qZOrder3 over the 3-D layout == the same query on the flat table") {
    val flat = Tables.events(spark, sf)
      .filter(col("user_id").between(ZOrder.UserLo, ZOrder.UserHi) &&
        col("event_type").between(ZOrder.TypeLo, ZOrder.TypeHi) &&
        col("ts") >= lit(ZOrder.TsLo).cast("timestamp") &&
        col("ts") < lit(ZOrder.TsHi).cast("timestamp"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        graft.functions.Num.dbl(sum(graft.functions.Num.dec(col("value")))).as("sum_value"))
      .orderBy("event_type")
    val viaLayout = ZOrder.qZOrder3(spark, sf)
    assert(viaLayout.collect().toSeq == flat.collect().toSeq)
    assert(viaLayout.count() > 0, "3-D box must be nonempty at every sf")
  }

  test("qZOrder over the clustered layout == the same query on the flat table") {
    val flat = Tables.events(spark, sf)
      .filter(col("user_id").between(ZOrder.UserLo, ZOrder.UserHi) &&
        col("ts") >= lit(ZOrder.TsLo).cast("timestamp") &&
        col("ts") < lit(ZOrder.TsHi).cast("timestamp"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        graft.functions.Num.dbl(sum(graft.functions.Num.dec(col("value")))).as("sum_value"))
      .orderBy("event_type")
    val viaLayout = ZOrder.qZOrder(spark, sf)
    assert(viaLayout.collect().toSeq == flat.collect().toSeq)
    assert(viaLayout.count() > 0, "box must be nonempty at every sf")
  }
}
