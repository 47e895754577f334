package graft

import graft.sources.Catalog
import org.apache.spark.sql.DataFrame

/** Data-validation operators: the orderless partition fingerprint and the
  * integer-exact equi-width histogram. The fingerprint's contract is
  * INVARIANCE (same rows => same checksum, regardless of partitioning or
  * order) plus SENSITIVITY (one changed value flips exactly its
  * partition's fingerprint); the histogram's is exact integer bucket
  * edges with no float boundary drift. */
class CatalogSpec extends SparkSpec {
  private lazy val sp = spark
  import sp.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  private def ordersFx: DataFrame = Seq(
    (1L, 10L, "O", 100.50, ts("1997-03-05"), "1-URGENT"),
    (2L, 11L, "F", 200.25, ts("1997-03-20"), "2-HIGH"),
    (3L, 12L, "O", 300.00, ts("1997-04-01"), "3-MEDIUM"),
    (4L, 10L, "F", 400.75, ts("1997-04-28"), "2-HIGH"),
  ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority")

  private def fp(df: DataFrame): Map[String, (Long, Long, Long)] =
    Catalog.checksum(df).collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("checksum is invariant to partitioning and row order") {
    val base = fp(ordersFx)
    assert(base.keySet === Set("1997-03", "1997-04"))
    assert(fp(ordersFx.repartition(7)) === base)
    assert(fp(ordersFx.orderBy($"o_orderkey".desc)) === base)
  }

  test("checksum pinpoints the changed partition and only it") {
    import org.apache.spark.sql.functions._
    val base = fp(ordersFx)
    val tweaked = fp(ordersFx.withColumn("o_totalprice",
      when($"o_orderkey" === 3L, 300.01).otherwise($"o_totalprice")))
    assert(tweaked("1997-03") === base("1997-03"), "untouched month must hold")
    assert(tweaked("1997-04")._1 === base("1997-04")._1, "row count unchanged")
    assert(tweaked("1997-04")._2 !== base("1997-04")._2, "sum_hash must flip")
  }

  test("histogram: integer edges, floor bucketing, exact sums") {
    val vals = (0 until 100).map(i => i.toDouble).toDF("v")
    val out = Catalog.histogram(vals, "v").orderBy("bucket")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // lo=0, hi=100, width=5 -> 20 full buckets of 5 values each
    assert(out.length === 20)
    assert(out.head === ((0, 0L, 5L, 5L, 10.0)))       // 0+1+2+3+4
    assert(out.last === ((19, 95L, 100L, 5L, 485.0)))  // 95+..+99
  }

  test("histogram: a constant column collapses to one bucket, not a crash") {
    val out = Catalog.histogram(Seq(42.0, 42.0, 42.0).toDF("v"), "v").collect()
    assert(out.length === 1 && out.head.getLong(3) === 3L)
  }

  test("drift: shared bucket grid, conditional arms, chi-square terms") {
    import org.apache.spark.sql.functions._
    // Window A (1996): fv 0..99; window B (1999): fv 95..194 — shifted
    // mass. Shared grid must come from the UNION of both windows:
    // lo=0, hi=195 -> w=(195+19) div 20 = 10.
    val rows = (0 until 100).map(i => (i + 0.5, ts(s"1996-03-0${i % 9 + 1}"))) ++
      (0 until 100).map(i => (i + 95.5, ts(s"1999-03-0${i % 9 + 1}")))
    val df = rows.toDF("o_totalprice", "o_orderdate")
    val out = Catalog.drift(df).orderBy("bucket").collect()
    val byBucket = out.map(r => r.getInt(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(byBucket(0) === ((10L, 0L)), s"got ${byBucket.toSeq.sorted}")
    assert(byBucket(19) === ((0L, 5L)), s"got ${byBucket.toSeq.sorted}")
    // bucket 9 (fv 90..99) holds A's tail and B's head
    assert(byBucket(9) === ((10L, 5L)), s"got ${byBucket.toSeq.sorted}")
    // shares within each window sum to 1
    val (sa, sb) = out.map(r => (r.getDouble(5), r.getDouble(6)))
      .foldLeft((0.0, 0.0)) { case ((a, b), (x, y)) => (a + x, b + y) }
    assert(math.abs(sa - 1.0) < 1e-12 && math.abs(sb - 1.0) < 1e-12)
    // a bucket exclusive to one window has chi2 = share (d²/d = d)
    val r0 = out.find(_.getInt(0) == 0).get
    assert(math.abs(r0.getDouble(8) - r0.getDouble(5)) < 1e-15)
  }

  test("benford: leading digit from exact cents; shares sum to 1; nonpositive excluded") {
    // 123.45 -> cents 1234500 -> digit 1; 0.071 -> 710 -> 7; 9000.0 -> 9;
    // 0 and -5 are excluded from the population
    val df = Seq(123.45, 0.071, 9000.0, 1.0, 0.0, -5.0).toDF("v")
    val out = Catalog.benford(df, "v").orderBy("digit")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toList
    assert(out === List((1, 2L, 0.5), (7, 1L, 0.25), (9, 1L, 0.25)), s"got $out")
    // expectations are the Scala-side literals, not engine log10
    val exp = Catalog.benford(df, "v").orderBy("digit")
      .collect().map(r => r.getDouble(3)).toList
    assert(exp === List(math.log10(2.0), math.log10(8.0 / 7), math.log10(10.0 / 9)))
  }

  test("histogramDepth: decile cuts give equal-count buckets on uniform data") {
    val sp2 = spark
    import sp2.implicits._
    // quartile cuts of 1..8 are (2.75, 4.5, 6.25) -> buckets of exactly 2
    val df = (1 to 8).map(_.toDouble).toDF("o_totalprice")
    val out = Catalog.histogramDepth(df, "o_totalprice", buckets = 4)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toList
    assert(out === List((0, 2L, 1.0, 2.0), (1, 2L, 3.0, 4.0),
      (2, 2L, 5.0, 6.0), (3, 2L, 7.0, 8.0)), s"got $out")
  }

  test("corr: signed r² = ±1 on perfect (anti)correlation, NULL on zero variance") {
    val sp2 = spark
    import sp2.implicits._
    // price = 2·qty (r²=+1); tax anti-linear with qty/price (r²=-1);
    // disc constant (zero variance -> NULL, never a 0/0 NaN)
    val li = Seq(
      (1.0, 2.0, 5.0, 3.0), (2.0, 4.0, 5.0, 2.0), (3.0, 6.0, 5.0, 1.0)
    ).toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val out = Catalog.corrReport(li).orderBy("x_col", "y_col").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        if (r.isNullAt(6)) null else r.getDouble(6))).toMap
    assert(out(("qty", "price")) == 1.0, s"got $out")
    assert(out(("price", "tax")) == -1.0, s"got $out")
    assert(out(("qty", "disc")) == null && out(("disc", "tax")) == null,
      "zero-variance pairs must be NULL")
  }
}
