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
