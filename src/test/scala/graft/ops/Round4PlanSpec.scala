package graft.ops

import graft.SparkSpec

/** Physical-plan shape of the round-4 operators — the properties that
  * hold the designs together at 100 TB: probes hash-join against
  * broadcast sketch tables, scan-side filters stay shuffle-free, and
  * sketch aggregation runs partial+final.
  */
class Round4PlanSpec extends SparkSpec {

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize the adaptive plan
    df.queryExecution.executedPlan.toString
  }

  test("bloom probe is broadcast hash joins, never a sort-merge or BNLJ scan") {
    val p = executed(Sketches.bloomJoinStats(
      graft.Tables.customer(spark, sfDir), graft.Tables.orders(spark, sfDir)))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("gopher rules run scan-side: no exchange anywhere in the plan") {
    val df = TextAnalysis.gopherRules(graft.Tables.documents(spark, sfDir))
    df.collect()
    val hasExchange = df.queryExecution.executedPlan
      .exists(_.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange])
    assert(!hasExchange, df.queryExecution.executedPlan.toString)
  }

  test("KMV sketch aggregates partial+final (map-side combinable state)") {
    val p = executed(Sketches.kmvDistinct(graft.Tables.documents(spark, sfDir)))
    // the custom Aggregator plans as ObjectHashAggregate with a partial pass
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial"), p)
  }

  test("PQ search broadcasts the query ids against the codes (no codes re-shuffle)") {
    val p = executed(Similarity.pqSearch(spark,
      graft.Tables.embeddings(spark, sfDir),
      Similarity.queryVectors(spark, sfDir), 5))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("pagerank: no static broadcast of the mass vector; edge list cached") {
    val df = GraphOps.pagerank(graft.Tables.events(spark, sfDir))
    // no broadcast HINT anywhere — AQE alone decides from runtime sizes
    // (broadcast when the rank vector is small, shuffle join on a
    // billion-node graph); a pinned broadcast would collect+reship
    // O(nodes) per iteration at scale
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("strategy=broadcast"), opt)
    val p = executed(df)
    assert(p.contains("InMemoryTableScan"), "edge list served from cache: " + p)
    // at fixture scale AQE still promotes the tiny vector to broadcast
    assert(p.contains("BroadcastHashJoin"), p)
  }
}
