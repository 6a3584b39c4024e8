package graft

import graft.queries.ParityQueries

/** Plan-quality regression guards: the scale claims in README/PLANS.md as
  * assertions, so a refactor that silently degrades the plan (extra
  * shuffle, lost pushdown, un-broadcast join) fails CI rather than a
  * cluster bill. String-matching the formatted plan is deliberate — it's
  * what a human reviews. */
class PlanGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    ParityQueries.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q17 fact branch: exactly one hash exchange feeding exactly two Window ops") {
    val plan = planOf("q17_transaction_pipeline")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    val windows = "Window ".r.findAllIn(plan).size
    val broadcasts = "BroadcastExchange".r.findAllIn(plan).size
    assert(windows == 2, s"expected 2 Window operators, plan:\n$plan")
    assert(broadcasts == 1, "stats join must broadcast")
    // one exchange for the windows + one inside the stats partial/final agg
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges")
  }

  test("q01: filter pushed to parquet scan, columns pruned") {
    val plan = planOf("q01_pricing_summary")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      "shipdate filter must reach the scan")
    assert(!plan.contains("l_shipmode"), "untouched columns must not be read")
  }

  test("q10: top-k plans TakeOrderedAndProject, not a global sort") {
    val plan = planOf("q10_topk")
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q08: grouped stats join is broadcast (fact side never shuffles for it)") {
    val plan = planOf("q08_anomaly_join")
    assert(plan.contains("BroadcastHashJoin"))
  }
}
