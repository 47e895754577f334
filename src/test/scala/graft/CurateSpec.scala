package graft

import graft.operators.Curate

/** The curation pipeline on planted fixtures: each stage drops exactly
  * the doc planted for it, survivors flow through. */
class CurateSpec extends SparkSpec {
  private lazy val sp = spark
  import sp.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm mat near the door"
  private val nearDup =
    "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm rug near the door"
  private val unrelated =
    "a completely different account of the way spark schedules shuffles partitions and broadcast joins " +
      "across the executors of a large cluster with careful attention to skew"

  private def docs = Seq(
    (1L, base, "en"),           // kept: canonical of everything below
    (2L, base.toUpperCase, "en"), // exact dup of 1 -> dropped (stage 1)
    (3L, nearDup, "en"),        // near dup of 1 -> non-canonical cluster member (stage 2)
    (4L, unrelated, "en"),      // kept: clean, high quality
    (5L, "too short", "en"),    // quality 0.6 < 0.7 -> dropped (stage 3)
  ).toDF("doc_id", "text", "lang")

  test("each stage drops its planted doc; survivors keep scores and buckets") {
    // rate 1.0 so stage 4 passes everything — sampling itself is pinned
    // separately in SampleSpec
    val out = Curate.curated(docs, rates = Seq("en" -> 10000))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.keySet == Set(1L, 4L), s"kept ${out.keySet}")
    assert(out.values.forall(_ >= Curate.QualityMin))
  }

  test("sampling stage composes: rate 0 empties the result") {
    assert(Curate.curated(docs, rates = Seq("en" -> 0)).isEmpty)
  }

  test("full-corpus query returns a nonempty curated subset") {
    val out = Curate.qCurate(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(0)).distinct.length == out.length, "one row per doc")
  }
}
