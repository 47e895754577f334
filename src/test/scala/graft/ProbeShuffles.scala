package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

object ProbeShuffles {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.spark
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, SparkSpec.Sf)
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val n = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.length
      println(s"SHUF $name $n")
    }
  }
}
