package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Heavy

/** Misra-Gries heavy hitters: kernel guarantee, pigeonhole coverage of
  * the candidate union, and end-to-end exactness + partitioning
  * invariance of the two-phase query. */
class HeavySpec extends SparkSpec {
  private lazy val sp = spark
  import sp.implicits._

  private def draw[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("misraGries: token over n/m always survives; partition count exact") {
    // 30 a's in 100 tokens, m = 5 counters: 30 > 100/5 = 20 -> must survive
    val toks = Seq.fill(30)("a") ++ (0 until 70).map(i => s"w$i")
    val (cands, n) = Heavy.misraGries(toks.iterator, 5)
    assert(n === 100L)
    assert(cands.contains("a"), s"heavy token evicted: ${cands.keySet}")
    assert(cands.size <= 5, s"summary exceeded m: ${cands.size}")
  }

  test("property: pigeonhole — candidate union over any partitioning covers global heavies") {
    val tokenGen = Gen.frequency((8, Gen.oneOf("x", "y")), (5, Gen.choose(0, 40).map("t" + _)))
    val caseGen = for {
      toks <- Gen.listOfN(120, tokenGen)
      m <- Gen.choose(2, 6)
      nParts <- Gen.choose(1, 4)
    } yield (toks, m, nParts)
    (1 to 8).foreach { s =>
      val (toks, m, nParts) = draw(caseGen, 900L + s)
      val n = toks.size
      val parts = toks.grouped(math.max(1, (n + nParts - 1) / nParts)).toSeq
      val union = parts.flatMap(p => Heavy.misraGries(p.iterator, m)._1.keys).toSet
      val global = toks.groupBy(identity).view.mapValues(_.size).toMap
      global.foreach { case (w, c) =>
        if (c.toLong * m > n)
          assert(union.contains(w),
            s"seed $s: global heavy '$w' ($c/$n, m=$m) missing from candidate union")
      }
    }
  }

  test("heavyHitters: exact counts, strict threshold, invariant to partitioning") {
    // N=100, m=3: heavy iff count*3 > 100 — "the" (120) in, "of" (75) out
    val words = Seq.fill(40)("the") ++ Seq.fill(25)("of") ++
      (0 until 35).map(i => s"rare$i")
    val out1 = Heavy.heavyHitters(words.toDF("token").repartition(1), m = 3)
      .orderBy(desc("n")).as[(String, Long)].collect().toSeq
    val out7 = Heavy.heavyHitters(words.toDF("token").repartition(7), m = 3)
      .orderBy(desc("n")).as[(String, Long)].collect().toSeq
    assert(out1 === Seq(("the", 40L)), s"got $out1")
    assert(out7 === out1, "result depends on partitioning")
  }
}
