package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan audit over EVERY declared query — the invariants that
  * decide whether a plan survives a 100× scale-up, enforced per round:
  *
  *  - no CartesianProduct anywhere (the non-broadcast all-pairs killer)
  *  - month-filtered KPI queries push their range predicate into the
  *    orders scan (PushedFilters) — the reference's month-index analog
  *  - the star join broadcasts the nation dim, never shuffles it
  */
class PlanAuditSpec extends SparkSpec {

  private def executed(name: String) = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  test("no query contains a CartesianProduct") {
    SparkEntry.queries.keys.foreach { name =>
      val plan = executed(name).toString
      assert(!plan.contains("CartesianProduct"),
        s"$name has a cartesian product:\n${plan.take(2000)}")
    }
  }

  test("month-filtered KPI scans push the date range into the orders scan") {
    Seq("kpi_summary", "kpi_by_dept", "kpi_delta_by_dept", "kpi_anomalies").foreach { name =>
      val scans = executed(name).collectLeaves().map(_.toString)
      val ordersScan = scans.find(_.contains("orders")).getOrElse(fail(s"$name: no orders scan"))
      assert(ordersScan.contains("PushedFilters: [") && ordersScan.contains("o_orderdate"),
        s"$name orders scan lacks pushed o_orderdate filter:\n${ordersScan.take(600)}")
    }
  }

  test("star join broadcasts the nation dim") {
    val plan = executed("kpi_by_dept").toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "nation dim should broadcast, not shuffle")
  }

  test("column pruning: kpi_summary reads only needed lineitem columns") {
    val scans = executed("kpi_summary").collectLeaves().map(_.toString)
    val li = scans.find(_.contains("lineitem")).get
    // query needs quantity/extendedprice/discount/tax/orderkey — NOT
    // partkey/suppkey/shipdate/returnflag/linestatus/linenumber
    Seq("l_partkey", "l_shipdate", "l_returnflag").foreach { c =>
      assert(!li.contains(c), s"lineitem scan reads unneeded column $c")
    }
  }

  test("shuffle counts stay bounded for the hot queries (broadcasts excluded)") {
    // regression tripwire: a rewrite that introduces an extra shuffle
    // stage should fail loudly here. Broadcast exchanges are excluded —
    // they are the plan we WANT for dims. Current counts: summary = 2
    // (two-phase countDistinct), by_dept = 3 (+ presentation sort),
    // delta = 2, sessions/window = 2 (keyed shuffle + range sort; the
    // session groupBy reuses the window's user_id partitioning).
    val bounds = Map(
      "kpi_summary" -> 2, "kpi_by_dept" -> 3, "kpi_delta_by_dept" -> 3,
      "events_sessions" -> 2, "events_window" -> 2)
    bounds.foreach { case (name, maxEx) =>
      val n = executed(name).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.length
      assert(n <= maxEx, s"$name has $n shuffle exchanges (bound $maxEx)")
    }
  }
}
