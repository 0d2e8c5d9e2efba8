package graft

import org.apache.spark.sql.functions._

/** Physical-plan guards: the scale properties argued in README must hold in
  * the actual executed plans, not just in intent — regressions here are
  * invisible to result-correctness tests.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.count()
    df.queryExecution.executedPlan.toString
  }

  test("q01 joins broadcast the dimensions (fact side never shuffles for joins)") {
    val plan = executedPlan("q01_client_stats")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q03 filter predicates reach the parquet scan") {
    val df = SparkEntry.queries("q03_filter_range")(spark, dir)
    df.count()
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_quantity), GreaterThanOrEqual(l_shipdate")
      || scan.contains("GreaterThan(l_quantity,45.0)"), scan)
  }

  test("q15 top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = executedPlan("q15_topk")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("scans prune columns to the projection") {
    val df = SparkEntry.queries("q01_client_stats")(spark, dir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // lineitem has 11 columns; the mart needs exactly 2 from it
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double>"), plan)
  }
}
