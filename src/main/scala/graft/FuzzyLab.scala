package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Measured evidence for the d=2 blocking-entropy law that
  * `Dedup.fuzzyPairs`' scaladoc states (VERDICT r13 #5 asked for the
  * d≤2 rung; the house standard is that a claimed cost law ships with
  * numbers, not prose):
  *
  *   the cost of FastSS d=2 blocking is bucket occupancy, and bucket
  *   occupancy is a function of KEY ENTROPY, not corpus size — on the
  *   low-entropy key (bare zero-padded supplier digits) the candidate
  *   set grows ~quadratically with id density, on the composited key
  *   (name ‖ exact account cents) it stays ~linear.
  *
  * Arms, per scale factor (default sf0.1 → sf1, a 10× row step):
  *   d1_bare       — depth-1 keys on s_name (the dedup_fuzzy blocking)
  *   d2_bare       — depth-2 keys on s_name: the quadratic trap
  *   d2_composite  — depth-2 keys on name‖cents (the dedup_fuzzy2 key)
  *
  * Per arm: keyed rows (explode output), candidate pairs (distinct
  * equi-join output BEFORE the levenshtein verify — the number that
  * prices the shuffle), verified pairs, wall seconds. The law is the
  * candidate growth ratio across the 10× row step: ~100× for d2_bare,
  * ~10× for d2_composite.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.FuzzyLab"
  */
object FuzzyLab {
  def main(args: Array[String]): Unit = {
    // Relative entries resolve against the repo root (where the
    // gitignored testdata-sf1/ scale-up lives), not the launch CWD —
    // the r14 default mixed an absolute path with a CWD-relative one
    // and silently broke outside the repo root (ADVICE r14). Override
    // SPARK_GRAFT_REPO_ROOT if the checkout lives elsewhere.
    val repoRoot = sys.env.getOrElse("SPARK_GRAFT_REPO_ROOT", "/root/repo")
    val sfDirs = sys.env.getOrElse("SPARK_GRAFT_FUZZYLAB_SFS",
      "/root/testdata/sf0.1,testdata-sf1").split(",").toSeq
      .map(d => if (new java.io.File(d).isAbsolute) d else s"$repoRoot/$d")
    val spark = GraftSession.build()

    def keyedOf(ents: DataFrame, depth: Int): DataFrame = {
      val keys = if (depth == 1) Dedup.deletionKeys(col("name"))
                 else Dedup.deletionKeys2(col("name"))
      Tables.balanced(ents).select(col("id"), col("name"))
        .withColumn("k", explode(keys))
    }

    case class Arm(keyed: Long, candidates: Long, verified: Long, wall: Double)
    def run(ents: DataFrame, depth: Int): Arm = {
      val keyed = keyedOf(ents, depth)
      // keyed-row count BEFORE the timed window: counting after would
      // re-run the explode pipeline as a second, untimed job (r14
      // review finding); here it doubles as the arm's warmup and the
      // timed window below still prices the FULL candidate job
      // (keying included — cand recomputes keyed inside its own plan)
      val nKeyed = keyed.count()
      val t0 = System.nanoTime()
      val cand = keyed.as("x").join(keyed.as("y"),
          col("x.k") === col("y.k") && col("x.id") < col("y.id"))
        .select(col("x.id").as("a"), col("x.name").as("an"),
          col("y.id").as("b"), col("y.name").as("bn"))
        .distinct()
      // one pass prices candidates AND verified (conditional count), so
      // the expensive distinct is not re-run per metric
      val row = cand.agg(count(lit(1)).as("n_cand"),
        count(when(levenshtein(col("an"), col("bn")) <= depth, 1)).as("n_ok")).head()
      val wall = (System.nanoTime() - t0) / 1e9
      Arm(nKeyed, row.getLong(0), row.getLong(1), wall)
    }

    val results = sfDirs.map { dir =>
      val sup = Tables.supplier(spark, dir)
      val bare = sup.select(col("s_suppkey").as("id"), col("s_name").as("name"))
      val composite = sup.select(col("s_suppkey").as("id"),
        concat(col("s_name"), lit("|"),
          round(col("s_acctbal") * 100).cast("long").cast("string")).as("name"))
      val n = sup.count()
      val arms = Map(
        "d1_bare" -> run(bare, 1),
        "d2_bare" -> run(bare, 2),
        "d2_composite" -> run(composite, 2))
      (dir, n, arms)
    }

    def j(a: Arm): String =
      s"""{"keyed":${a.keyed},"candidates":${a.candidates},"verified":${a.verified},"wall_sec":${math.round(a.wall * 100) / 100.0}}"""
    val perSf = results.map { case (dir, n, arms) =>
      val name = new java.io.File(dir).getName
      s""""$name":{"suppliers":$n,${arms.toSeq.sortBy(_._1).map { case (k, a) => s""""$k":${j(a)}""" }.mkString(",")}}"""
    }.mkString(",")
    // the law: candidate growth across the row step, per arm
    val law = if (results.size >= 2) {
      val (_, n0, a0) = results.head
      val (_, n1, a1) = results.last
      val rowStep = n1.toDouble / n0
      val ratios = a0.keys.map { k =>
        val r = a1(k).candidates.toDouble / math.max(1, a0(k).candidates)
        s""""$k":${math.round(r * 10) / 10.0}"""
      }.mkString(",")
      s""","row_step":${math.round(rowStep * 10) / 10.0},"candidate_growth":{$ratios}"""
    } else ""
    println(s"""{"experiment":"fuzzy_blocking_entropy","arms":{$perSf}$law}""")
  }
}
