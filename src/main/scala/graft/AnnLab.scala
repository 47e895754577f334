package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Similarity

/** ANN recall measurement (VERDICT r15 #5): the `similar_ann_*` gates
  * prove hash-identity with the unrolled oracle — i.e. the engine
  * computes exactly the IVF search it declares — but recall@k vs the
  * exact brute force was only spec-pinned at small scale. This lab
  * measures recall@10 over a wide deterministic probe sample at the big
  * self-gate sfs, across the nprobe ladder, for all three ANN variants:
  *
  *   - `ivf_seed`       — fixed seed codebook ([[Similarity.ivfTopK]])
  *   - `kmeans`         — Lloyd-refined codebook, trained once and
  *                        reused across the ladder (the persisted-query
  *                        artifact path, so the lab measures the same
  *                        codebook the declared queries serve)
  *   - `kmeans_part`    — the persisted cluster-PARTITIONED layout
  *                        ([[Similarity.ivfPartitionedTopK]]); recall
  *                        must EQUAL `kmeans` at every nprobe (a layout
  *                        changes cost, never an answer) — asserted.
  *
  * Probe sample: every (n/probes)-th vec_id — deterministic, spread
  * across the id range, independent of partitioning. Ground truth is
  * [[Similarity.bruteForceTopK]] on the same probes (exact integer
  * dots; ties pinned by (cosine desc, vec_id asc) on both sides, so
  * top-k sets are well-defined and the intersection is exact).
  *
  * Output: one JSON line + SPARK_GRAFT_ANNLAB_OUT (default annlab.json).
  */
object AnnLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "testdata-sf10")
    val nProbes = sys.env.getOrElse("SPARK_GRAFT_ANNLAB_PROBES", "128").toInt
    val ladder = sys.env.getOrElse("SPARK_GRAFT_ANNLAB_NPROBE", "1,2,3,5,10")
      .split(",").map(_.trim.toInt).toSeq
    val k = Similarity.TopK
    val spark = GraftSession.build(defaultCpus = "32", logLevel = "WARN")

    val vecs = Similarity.prepared(spark, sfDir)
    val n = vecs.count()
    // every (n/probes)-th EXISTING id in sorted order — ids are not dense
    // at the ScaleUp sfs, so rank-stride, not id-stride
    val stride = math.max(1L, n / nProbes)
    val probeIds: Seq[Long] = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      vecs.select(col("vec_id"))
        .withColumn("rn", row_number().over(Window.orderBy("vec_id")))
        .where((col("rn") - 1) % stride === 0)
        .orderBy("vec_id").limit(nProbes)
        .collect().map(_.getLong(0)).toSeq
    }

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    /** probe -> ordered top-k vec ids (bounded collect: probes × k). */
    def topk(df: DataFrame): Map[Long, Seq[Long]] =
      df.select("probe_id", "vec_id", "rank").collect()
        .groupBy(_.getLong(0))
        .map { case (p, rows) =>
          p -> rows.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq }

    val (truth, bfSec) = timed(topk(Similarity.bruteForceTopK(spark, sfDir, probeIds, k)))
    require(truth.size == nProbes, s"expected $nProbes probes, got ${truth.size}")

    def recallOf(ann: Map[Long, Seq[Long]]): Double = {
      val per = truth.map { case (p, t) =>
        ann.getOrElse(p, Seq.empty).toSet.intersect(t.toSet).size.toDouble / t.size }
      per.sum / per.size
    }

    // train / persist ONCE through the same artifact path the declared
    // persisted+partitioned queries use, so the lab grades their codebook
    val src = s"$sfDir/embeddings.parquet"
    val (codebook, trainSec) = timed {
      graft.sources.Artifacts.cached(spark, Similarity.CodebookKind, src) {
        Similarity.kmeansCodebook(spark, vecs)
      }.cache()
    }
    codebook.count()

    case class Arm(recall: Double, sec: Double)
    def arm(f: => DataFrame): Arm = {
      val (r, sec) = timed(recallOf(topk(f)))
      Arm(r, sec)
    }
    val results: Seq[(Int, Arm, Arm, Arm)] = ladder.map { np =>
      val seed = arm(Similarity.ivfTopK(spark, sfDir, probeIds, k, np))
      val km = arm(Similarity.ivfTopK(spark, sfDir, probeIds, k, np,
        codebook = Some(codebook)))
      val part = arm(Similarity.ivfPartitionedTopK(spark, sfDir, probeIds, k, np))
      (np, seed, km, part)
    }
    // the layout-identity claim: partitioned == in-flight kmeans recall
    results.foreach { case (np, _, km, part) =>
      require(math.abs(km.recall - part.recall) < 1e-12,
        s"nprobe=$np: partitioned recall ${part.recall} != kmeans ${km.recall}")
    }

    // WIDENED codebook arm — the nlist-scales-with-corpus rule, measured:
    // 40 data-seeded cells (rank-strided ids offset half a stride so they
    // never collide with the probe sample), Lloyd-refined like the
    // 10-cell codebook. Compared at EQUAL SCANNED FRACTION: nprobe 1/2/4
    // of 40 cells reads 2.5/5/10% of the corpus, vs nprobe 1 of 10
    // reading 10% — if the rule holds, recall at 10% scanned is far
    // higher under the wider codebook.
    val wideN = sys.env.getOrElse("SPARK_GRAFT_ANNLAB_WIDE_CELLS", "40").toInt
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val seedIds = vecs.select(col("vec_id"))
      .withColumn("rn", row_number().over(Window.orderBy("vec_id")))
      .where((col("rn") - 1 - stride / 2) % math.max(1L, n / wideN) === 0)
      .orderBy("vec_id").limit(wideN)
      .collect().map(_.getLong(0)).toSeq
    val seeds0 = vecs.filter(col("vec_id").isin(seedIds: _*))
      .select(col("vec_id").as("cluster"), col("ie").as("se"), col("nrm").as("sn"))
    val (cbWide, wideTrainSec) = timed {
      Similarity.kmeansCodebook(spark, vecs, seeds0 = Some(seeds0)).cache()
    }
    val wideCells = cbWide.count()
    val wide = Seq(1, 2, 4, 8).map { np =>
      (np, arm(Similarity.ivfTopK(spark, sfDir, probeIds, k, np,
        codebook = Some(cbWide))))
    }
    def curve(pick: ((Int, Arm, Arm, Arm)) => Arm): String =
      results.map { r => f""""${r._1}":{"recall":${pick(r).recall}%.4f,"sec":${pick(r).sec}%.2f}""" }
        .mkString("{", ",", "}")
    val wideCurve = wide.map { case (np, a) =>
      f""""$np":{"recall":${a.recall}%.4f,"scanned_fraction":${np.toDouble / wideCells}%.3f,"sec":${a.sec}%.2f}"""
    }.mkString("{", ",", "}")
    val json =
      f"""{"experiment":"ann_recall","sf":"$sfDir","corpus_rows":$n,"probes":$nProbes,"k":$k,"cells":${codebook.count()},"bf_truth_sec":$bfSec%.2f,"kmeans_train_sec":$trainSec%.2f,"recall_at_10":{"ivf_seed":${curve(_._2)},"kmeans":${curve(_._3)},"kmeans_partitioned":${curve(_._4)}},"partitioned_equals_kmeans":true,"wide_codebook":{"cells":$wideCells,"train_sec":$wideTrainSec%.2f,"recall_at_10":$wideCurve}}"""
    println(json)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_ANNLAB_OUT", "annlab.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
