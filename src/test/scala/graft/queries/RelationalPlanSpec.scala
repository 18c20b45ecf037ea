package graft.queries

import graft.SparkSpec

/** Asserts the physical-plan properties that matter at 100 TB — filters
  * and projections reaching the parquet scan, dimension joins broadcast,
  * top-k planned as per-partition heaps instead of a global sort.
  */
class RelationalPlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = Relational.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("q2 filter and projection are pushed to the parquet scan") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("IsNotNull(o_totalprice)") || p.contains("GreaterThan(o_totalprice"), p)
    // column pruning: l_comment-free narrow read schema
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("o_orderpriority"), "unneeded column not read: " + p)
  }

  test("q4 dimension joins are broadcast (no shuffle for the join)") {
    val p = plan("q4_supplier_by_region")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q9 top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q9_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q1 aggregation is partial+final (map-side combine)") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_sum") || p.contains("partial"), p)
  }

  test("whole-stage codegen covers the q1 pipeline") {
    val df = Relational.queries("q1_pricing_summary")(spark, sfDir)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    // codegen'd stages print as "*(id)" in the simple plan string
    assert(p.contains("*(1)") && p.contains("*(2)"),
      "expected both pipeline stages codegen'd: " + p)
  }
}
