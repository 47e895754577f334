package graft

import org.apache.spark.sql.functions._
import graft.functions.Num.dbl
import graft.sources.Tables

/** Scratch probe (r16): price the OLD Expand-over-fact rollup against the
  * NEW Expand-over-preaggregate form and the bare fact spine, same JVM,
  * min-of-3 each — isolates how much of kpi_rollup's sf10 floor the
  * grouping-set Expand actually carried. */
object ProbeRollup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata-sf10")
    val spark = GraftSession.build(defaultCpus = "32")
    def run(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def old() = {
      val f = Tables.fact(spark, dir, Seq(operators.Kpi.M1, operators.Kpi.M2))
      f.rollup(col("dept"), col("month"))
        .agg(dbl(sum("gross")).as("gross"), dbl(sum("net")).as("net"),
          count(lit(1)).as("n"), grouping_id().cast("int").as("gid"))
        .select(coalesce(col("dept"), lit("ALL")).as("dept"),
          coalesce(col("month"), lit("ALL")).as("month"),
          col("gross"), col("net"), col("n"), col("gid"))
        .orderBy("gid", "dept", "month")
    }
    def neu() = operators.Kpi.qRollup(spark, dir)
    def spine() = Tables.fact(spark, dir, Seq(operators.Kpi.M1, operators.Kpi.M2))
      .groupBy(col("dept"), col("month"))
      .agg(sum("gross").as("g"), sum("net").as("nt"), count(lit(1)).as("c"))
    // warmup all three shapes
    Seq(old(), neu(), spine()).foreach(run)
    def min3(f: () => org.apache.spark.sql.DataFrame) =
      (1 to 3).map(_ => run(f())).min
    println(f"PROBE spine=${min3(() => spine())}%.2f new=${min3(() => neu())}%.2f old=${min3(() => old())}%.2f")
    println(f"PROBE2 old=${min3(() => old())}%.2f new=${min3(() => neu())}%.2f spine=${min3(() => spine())}%.2f")
    spark.stop()
  }
}
