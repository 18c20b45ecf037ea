package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Empty-input robustness for the round-5 operators: return empty,
  * never throw — the filtered-out-partition property.
  */
class Round5EmptySpec extends SparkSpec {

  private def noDocs = graft.Tables.documents(spark, sfDir)
    .filter(col("doc_id") < 0)

  test("shard-parallel packing tolerates an empty corpus") {
    assert(PipelineOps.packSequences(noDocs, PipelineOps.PackBudget)
      .count() == 0)
  }

  test("sketch-native overlap and minhash error tolerate an empty corpus") {
    assert(Sketches.kmvOverlap(noDocs).count() == 0)
    assert(Dedup.minhashErrorDocs(noDocs).count() == 0)
  }

  test("HLL, weighted sample, and landmark BFS tolerate empty input") {
    assert(Sketches.hllDistinct(noDocs).count() == 0)
    assert(PipelineOps.weightedSample(noDocs).count() == 0)
    val noEvents = graft.Tables.events(spark, sfDir)
      .filter(col("event_id") < 0)
    assert(GraphOps.bfsLandmarks(noEvents).count() == 0)
  }

  test("BPE merges, token budget, harmonic centrality tolerate empty input") {
    assert(TextAnalysis.bpeMerges(noDocs).count() == 0)
    assert(PipelineOps.tokenBudget(noDocs).count() == 0)
    val noEvents = graft.Tables.events(spark, sfDir)
      .filter(col("event_id") < 0)
    assert(GraphOps.harmonicCentrality(noEvents).count() == 0)
  }

  test("epoch order, soft dedup, quantile sketch tolerate empty input") {
    assert(PipelineOps.epochOrder(noDocs).count() == 0)
    assert(Dedup.softDedupDocs(noDocs).count() == 0)
    val noOrders = graft.Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") < 0)
    assert(Sketches.quantileSketch(noOrders).count() == 0)
  }

  test("length buckets and SRP-LSH tolerate empty input") {
    assert(PipelineOps.lengthBuckets(noDocs).count() == 0)
    val noVecs = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 0)
    assert(Similarity.srpLshTopK(spark, noVecs, noVecs, 5).count() == 0)
  }
}
