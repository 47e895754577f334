package graft

import graft.operators.Decontam
import org.apache.spark.sql.functions._
import graft.sources.Catalog

/** Benchmark decontamination: planted-passage detection, zero-overlap
  * reporting, bench-set exclusion; plus the expectations audit. */
class DecontamSpec extends SparkSpec {
  private lazy val sp = spark
  import sp.implicits._

  /** ids 0..n-1 partitioned by benchmark membership (evaluated through
    * the same expression the operator uses). */
  private def benchIds(n: Int): (Seq[Long], Seq[Long]) = {
    val ids = (0L until n.toLong).toDF("doc_id")
    val flagged = ids.withColumn("b", Decontam.isBench(col("doc_id")))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    (flagged.collect { case (i, true) => i }.toSeq,
      flagged.collect { case (i, false) => i }.toSeq)
  }

  test("planted passage is flagged; clean doc reports zero overlap; bench docs excluded") {
    val (bench, train) = benchIds(100)
    assert(bench.nonEmpty && train.size >= 2, s"split degenerate: ${bench.size} bench")
    val b = bench.head
    val (t, u) = (train.head, train(1))
    val docs = Seq(
      (b, "alpha beta gamma delta epsilon zeta"),              // benchmark doc
      (t, "one two three alpha beta gamma delta epsilon four"), // contains a bench 5-gram
      (u, "u1 u2 u3 u4 u5 u6 u7 u8"),                           // clean
    ).toDF("doc_id", "text")
    val out = Decontam.report(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(!out.contains(b), "benchmark docs must not appear in the train report")
    // t: 9 words -> 5 shingles, exactly one ("alpha beta gamma delta epsilon") in bench
    assert(out(t) === ((5L, 1L, true)), s"got ${out(t)}")
    assert(out(u) === ((4L, 0L, false)), s"got ${out(u)}")
  }

  test("short doc (< k words) matches only on whole-text equality") {
    val (bench, train) = benchIds(100)
    val docs = Seq(
      (bench.head, "tiny doc"),
      (train.head, "tiny doc"),       // exact copy of a short bench doc
      (train(1), "tiny other"),
    ).toDF("doc_id", "text")
    val out = Decontam.report(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(train.head) === 1L && out(train(1)) === 0L)
  }

  test("embed decontam: every planted bench replica is flagged at cosine 1.0; sides are asymmetric; bench broadcasts") {
    val out = Decontam.qEmbedReport(spark, sf)
    // one action: the collected rows AND the executed AQE plan below
    // come from the same run
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val bench = graft.sources.Tables.embeddings(spark, sf)
      .filter(Decontam.isBench(col("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(bench.nonEmpty, "fixture needs a nonempty bench set")
    // every planted twin (bench id + offset) meets EXACTLY its original
    // at cosine 1.0 — identical vectors through the integer dot
    val planted = rows.filter(_._1 >= graft.operators.Dedup.PlantOffset)
    assert(planted.map(_._1).toSet ==
      bench.map(_ + graft.operators.Dedup.PlantOffset),
      "every planted replica must be flagged, none missed")
    planted.foreach { case (t, b, c) =>
      assert(t - graft.operators.Dedup.PlantOffset == b,
        s"twin $t should hit its own original, hit $b")
      // dot/(sqrt(dot))^2 can land an ulp either side of 1.0 in IEEE;
      // both engines compute the identical value (the hash gate pins it)
      assert(math.abs(c - 1.0) <= 1e-12,
        s"verbatim replica cosine must be 1.0 within one ulp, got $c")
    }
    // asymmetry: the train column never holds a bench id, the bench
    // column only bench ids (no bench x bench, no train x train)
    rows.foreach { case (t, b, _) =>
      assert(!bench.contains(t) || t >= graft.operators.Dedup.PlantOffset)
      assert(bench.contains(b))
    }
    // scale shape: the candidate join and the verify both broadcast the
    // bench side — the train corpus never shuffles for the match
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bench side must broadcast:\n${plan.take(1200)}")
  }

  test("audit: expected rules fire on testdata, FK and PK hold, pass is consistent") {
    val out = Catalog.qAudit(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out.size === 7)
    out.foreach { case (rule, (n, v, pass)) =>
      assert(pass === (v === 0L), s"$rule pass flag inconsistent")
      assert(n > 0, s"$rule checked nothing")
    }
    assert(out("events_type_accepted")._2 > 0, "error events must violate the accepted set")
    assert(out("customer_acctbal_nonneg")._2 > 0, "TPC-H negative balances must fire")
    assert(out("orders_fk_customer")._2 === 0L)
    assert(out("orders_pk_unique")._2 === 0L)
    assert(out("documents_text_nonempty")._2 === 0L)
  }
}
