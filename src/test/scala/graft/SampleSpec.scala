package graft

import graft.operators.Sample
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling: rate adherence, rerun stability,
  * monotonicity under rate increases, unknown-stratum drop. */
class SampleSpec extends SparkSpec {
  private lazy val sp = spark
  import sp.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, if (i % 2 == 0) "en" else "xx"))
      .toDF("doc_id", "lang")

  test("observed rate tracks the configured rate") {
    val n = 2000
    val kept = Sample.stratified(docs(n), Seq("en" -> 5000)).count()
    // 1000 'en' docs at rate 0.5: binomial-ish bound, hash should land
    // well within ±10 percentage points
    assert(kept > 400 && kept < 600, s"kept $kept of 1000 at rate 0.5")
  }

  test("unknown stratum is dropped entirely (explicit config only)") {
    val out = Sample.stratified(docs(100), Seq("en" -> 10000))
    assert(out.filter(col("lang") === "xx").count() == 0)
    assert(out.count() == 50, "rate 1.0 keeps every 'en' row")
  }

  test("rerun-stable and partitioning-independent") {
    val a = Sample.stratified(docs(500).repartition(1)).collect().map(_.getLong(0)).toSet
    val b = Sample.stratified(docs(500).repartition(13)).collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("raising a rate keeps every previously sampled row (superset)") {
    val low = Sample.stratified(docs(1000), Seq("en" -> 2000))
      .collect().map(_.getLong(0)).toSet
    val high = Sample.stratified(docs(1000), Seq("en" -> 6000))
      .collect().map(_.getLong(0)).toSet
    assert(low.subsetOf(high))
  }

  test("buckets lie in [0, Denom) and differ from the raw hash of the id") {
    val b = docs(200).select(Sample.bucket(col("doc_id")).as("b"))
      .collect().map(_.getLong(0))
    assert(b.forall(x => x >= 0 && x < Sample.Denom))
    assert(b.distinct.length > 100, "buckets spread, not degenerate")
  }

  test("assignSplit: total coverage, rough proportions, growth never moves a row") {
    val n = 2000
    val ids = (0 until n).map(_.toLong).toDF("doc_id")
    val out = Sample.assignSplit(ids, col("doc_id"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.sum === n.toLong, "every row assigned exactly one split")
    assert(out("train") > n * 7 / 10 && out("train") < n * 9 / 10, s"train share off: $out")
    assert(out.keySet === Set("train", "val", "test"))
    // stability: assignment over the first half is a restriction of the full map
    val half = Sample.assignSplit((0 until n / 2).map(_.toLong).toDF("doc_id"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = Sample.assignSplit(ids, col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    half.foreach { case (id, s) => assert(full(id) === s, s"doc $id moved splits") }
  }

  test("split and sample salts decorrelate: both-selected rate is the product, not the overlap") {
    // A doc's sampling bucket must not predict its split; check 'train'
    // share among sampled docs tracks the global train share.
    val n = 4000
    val d = (0 until n).map(i => (i.toLong, "en")).toDF("doc_id", "lang")
    val sampled = Sample.applyRates(d, Seq("en" -> 5000))
    val trainShare = Sample.assignSplit(sampled, col("doc_id"))
      .filter(col("split") === "train").count().toDouble / sampled.count()
    assert(trainShare > 0.7 && trainShare < 0.9, s"correlated salts? share=$trainShare")
  }

  test("epochs: full copies always present, fractional copy hash-gated, zero-weight drops") {
    val docs = (0 until 1000).map(i => (i.toLong, s"s${i % 4}"))
      .toDF("doc_id", "source")
      .withColumn("text", org.apache.spark.sql.functions.lit("x"))
    val weights = Seq("s0" -> 250, "s1" -> 100, "s2" -> 40, "s3" -> 0)
    val out = Sample.epochs(docs, weights)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // s0: 250 docs × (2 + ~0.5) ≈ 625; s1: exactly 250 (one epoch each);
    // s2: ~40% of 250 ≈ 100; s3: dropped entirely
    assert(bySrc("s1") === 250L, s"got $bySrc")
    assert(!bySrc.contains("s3"), s"zero-weight source present: $bySrc")
    assert(bySrc("s0") > 250 * 2 && bySrc("s0") < 250 * 3, s"got $bySrc")
    assert(bySrc("s2") > 25 && bySrc("s2") < 250, s"got $bySrc")
    // every s0 doc has epochs 0 and 1 (full part is unconditional), and
    // any epoch-2 copy implies epochs 0 and 1 exist for that doc
    val s0 = out.filter(col("source") === "s0")
      .groupBy("doc_id").agg(org.apache.spark.sql.functions.collect_set("epoch").as("es"))
      .collect().map(_.getSeq[Int](1).sorted.toList)
    assert(s0.forall(es => es.startsWith(List(0, 1))), "missing full epochs")
    assert(s0.exists(_ == List(0, 1, 2)) && s0.exists(_ == List(0, 1)),
      "fractional epoch should split s0 docs into 2- and 3-copy groups")
  }

  test("epochs: unlisted source defaults to exactly one epoch") {
    val docs = Seq((1L, "unknown_src"), (2L, "unknown_src")).toDF("doc_id", "source")
    val out = Sample.epochs(docs, Seq("other" -> 200))
      .collect().map(r => (r.getLong(0), r.getInt(2))).toList.sorted
    assert(out === List((1L, 0), (2L, 0)), s"got $out")
  }

  test("match: rate>=1 keeps all, target-empty bin keeps none, deterministic") {
    // target src0: bins {0: 2 docs, 1: 2}; cand src14: {0: 4, 1: 1, 2: 5}
    // bin0 rate = min(1, (2*10)/(4*4)) = 1 -> all 4; bin1 = 5 -> capped,
    // keeps the single doc; bin2 has no target mass -> rate 0
    val docs = (Seq((1L, "src0", 50L), (2L, "src0", 60L), (3L, "src0", 150L),
      (4L, "src0", 160L), (90L, "other", 10L)) ++
      Seq(10L -> 10L, 11L -> 20L, 12L -> 30L, 13L -> 40L, 14L -> 110L,
        15L -> 210L, 16L -> 220L, 17L -> 230L, 18L -> 240L, 19L -> 250L)
        .map { case (id, n) => (id, "src14", n) })
      .toDF("doc_id", "source", "n_chars")
    val out = Sample.matchResample(docs).orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    assert(out === List((0L, 2L, 4L, 4L), (1L, 2L, 1L, 1L), (2L, 0L, 5L, 0L)),
      s"got $out")
    val again = Sample.matchResample(docs).orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    assert(again === out, "hash acceptance is rerun-stable")
  }
}
