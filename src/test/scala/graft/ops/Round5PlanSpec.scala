package graft.ops

import graft.SparkSpec

/** Physical-plan shape of the round-5 scale fixes: the properties the
  * 100 TB designs hang on — no corpus row through a single-partition
  * exchange, iteration joins free of pinned broadcasts.
  */
class Round5PlanSpec extends SparkSpec {

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize the adaptive plan
    df.queryExecution.executedPlan.toString
  }

  test("pipe_pack: shard-parallel prefix sum — no single-partition exchange") {
    val df = PipelineOps.packSequences(
      graft.Tables.documents(spark, sfDir), PipelineOps.PackBudget)
    val p = executed(df)
    assert(!p.contains("SinglePartition"),
      "global window would serialize the corpus through one task: " + p)
    // the cumsum window runs under the shard partitioning
    assert(p.contains("Window") && p.contains("shard"), p)
  }

  test("HLL register build is a partial+final aggregation (map-side combine)") {
    val df = Sketches.hllRegisters(
      graft.Tables.documents(spark, sfDir)
        .selectExpr("source", "explode(split(text, ' ')) AS tok")
        .filter("length(tok) > 0"))
    val p = executed(df)
    // two HashAggregates around the exchange = partial max per mapper,
    // final max per (source, bucket) — the combinable-sketch contract
    assert(p.split("HashAggregate").length > 2, p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("BFS rounds never broadcast the adjacency (big) side") {
    val df = GraphOps.bfsLandmarks(graft.Tables.events(spark, sfDir))
    val p = executed(df)
    assert(!p.contains("SinglePartition"), p)
    // the frontier/distance table may broadcast; the edge list must not
    // (on a billion-edge graph that would collect the graph per round).
    // Heuristic: no broadcast subtree may sit directly on a parquet scan
    // — the bounded dist side reads from the iteration cache instead
    p.split("BroadcastExchange").drop(1).foreach { sub =>
      assert(!sub.take(600).contains("FileScan parquet"),
        "broadcast over a raw scan:\n" + sub.take(600))
    }
  }

  test("pipe_pack two-pass offsets reproduce the global prefix-sum bins") {
    // same doc set through a 1-shard pack (degenerate = the old global
    // window semantics) and the default sharded one: identical bins
    val docs = graft.Tables.documents(spark, sfDir)
    val one = PipelineOps.packSequences(docs, PipelineOps.PackBudget, shards = 1)
      .orderBy("doc_id").collect().toSeq
    val many = PipelineOps.packSequences(docs, PipelineOps.PackBudget)
      .orderBy("doc_id").collect().toSeq
    assert(one == many)
  }
}
