package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("brute force: k results per probe, descending cosine, probe excluded") {
    val out = Similarity.qTopK(spark, sf).collect()
    assert(out.length == Similarity.ProbeIds.length * Similarity.TopK)
    Similarity.ProbeIds.foreach { p =>
      val rows = out.filter(_.getLong(0) == p)
      val cos = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b }, "descending")
      assert(!rows.exists(_.getLong(1) == p), "probe never its own neighbor")
      assert(cos.forall(c => c >= -1.0001 && c <= 1.0001), "cosine in range")
    }
  }

  test("partitioned-member ANN is row-identical to the in-flight k-means path") {
    // same codebook, same assignment arithmetic, different physical
    // posture (persisted cluster-partitioned members + DPP-pruned scan
    // vs per-query full-corpus assignment) — a layout may change cost,
    // never an answer
    val inflight = Similarity.qIvfKmeans(spark, sf).collect().map(_.toString).toList
    val part = Similarity.qIvfKmeansPartitioned(spark, sf).collect().map(_.toString).toList
    assert(part == inflight)
  }

  test("IVF recall vs brute force: measured recall@10 within expected band") {
    // The testdata embeddings are RANDOM unit vectors — the worst case for
    // any ANN (no cluster structure to exploit). Expected recall for
    // nprobe=3 of 10 proximity cells on random 64-d data is ~0.4-0.5
    // (measured 0.47 at sf0.001, 0.40 at sf0.01). The assertion pins the
    // band: well above the 0.3 a random 3-of-10 partition scan would give
    // is not achievable here, so we assert >= 0.3 (structure-free floor)
    // and that the result is a strict subset of cells, not garbage.
    val bf = Similarity.qTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val ivf = Similarity.qIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ivfSet = ivf.map(t => (t._1, t._2)).toSet
    val hits = bf.count(t => ivfSet.contains((t._1, t._2)))
    val recall = hits.toDouble / bf.length
    info(f"IVF recall@${Similarity.TopK} = $recall%.2f (nprobe=${Similarity.NProbe}/10, random vectors)")
    assert(recall >= 0.3, s"recall $recall below the structure-free floor")
    // every IVF cosine must match the brute-force cosine for that pair
    // (ANN approximates WHICH vectors to score, never the score itself)
    val bfCos = Similarity.qTopK(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    ivf.foreach { case (p, v, c) =>
      bfCos.get((p, v)).foreach(expected => assert(expected == c, s"cosine drift for ($p,$v)"))
    }
  }

  test("k-means codebook: Lloyd refinement beats the raw seed codebook") {
    // Deterministic (tie-broken assignment, integer-mean centroids), so
    // these are fixed numbers, not a flaky statistical bound: measured
    // recall@10 seed=0.467 / kmeans=0.533 at sf0.001 (0.400/0.467 at
    // sf0.01) — training the codebook must never LOSE recall here.
    def recallOf(df: org.apache.spark.sql.DataFrame, truth: Set[(Long, Long)]): Double = {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    val truth = Similarity.qTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val seedR = recallOf(Similarity.qIvf(spark, sf), truth)
    val kmR = recallOf(Similarity.qIvfKmeans(spark, sf), truth)
    info(f"recall@10: seed=$seedR%.3f kmeans=$kmR%.3f")
    assert(kmR >= seedR, s"k-means codebook regressed recall: $kmR < $seedR")
    assert(kmR >= 0.5, s"expected the measured 0.533, got $kmR")
  }

  test("integerized dot product is partitioning-independent (exact math)") {
    val v = Similarity.prepared(spark, sf)
    val a = v.repartition(13).agg(sum(Similarity.dotL(col("ie"), col("ie")))).head.getLong(0)
    val b = v.repartition(3).agg(sum(Similarity.dotL(col("ie"), col("ie")))).head.getLong(0)
    assert(a == b, "exact integer norms cannot depend on partitioning")
  }

  test("unit-norm data: self-cosine is exactly 1 within integerization error") {
    val v = Similarity.prepared(spark, sf).limit(5).collect()
    v.foreach { r =>
      val n = r.getAs[Double]("nrm")
      // norm of an integerized unit vector ~ 1e7, off by at most ~dim/2 units
      assert(math.abs(n - Similarity.Scale.toDouble) < 3000, s"norm $n")
    }
  }
}
