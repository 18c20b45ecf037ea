package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Round-7 robustness: empty inputs return empty (or the zero summary
  * row), never throw; the fixed-point soft-EM keeps the broadcast shape
  * its 100 TB story depends on.
  */
class Round7Spec extends SparkSpec {

  test("fixed-point soft-EM tolerates an empty corpus") {
    val noVecs = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 0)
    assert(Similarity.gmmFixedPoint(noVecs).count() == 0)
  }

  test("degree-ordered triangle census on an empty graph is the zero row") {
    val noEvents = graft.Tables.events(spark, sfDir)
      .filter(col("event_id") < 0)
    val rows = GraphOps.triangleCensus(noEvents).collect()
    assert(rows.length == 1)
    assert((0 to 2).forall(i => rows.head.getLong(i) == 0L), rows.head)
  }

  test("soft-EM plan: corpus rows never cross a single-partition " +
      "exchange; the K x dim centroid side broadcasts") {
    val df = Similarity.gmmFixedPoint(graft.Tables.embeddings(spark, sfDir))
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"),
      "a global exchange would serialize the corpus through one task: " + p)
    assert(p.contains("BroadcastExchange"),
      "the bounded centroid/denominator sides should broadcast: " + p)
  }
}
