package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Empty-input robustness for the session-5 operators: return empty,
  * never throw — the filtered-out-partition property.
  */
class Session5EmptySpec extends SparkSpec {

  private def noDocs = graft.Tables.documents(spark, sfDir)
    .filter(col("doc_id") < 0)
  private def noEvents = graft.Tables.events(spark, sfDir)
    .filter(col("event_id") < 0)

  test("covisitation, hits, and forget tolerate an empty event stream") {
    assert(GraphOps.covisitation(noEvents).count() == 0)
    assert(GraphOps.hits(noEvents).count() == 0)
    assert(GraphOps.temporalPaths(noEvents).count() == 0)
    assert(graft.ops.Warehouse.forget(noEvents).count() == 0)
  }

  test("k-anonymity, dataset card, and normalization tolerate empty input") {
    assert(PipelineOps.kAnonymity(noEvents).count() == 0)
    assert(PipelineOps.datasetCard(noDocs).count() == 0)
    assert(TextAnalysis.unicodeNormalize(noDocs).count() == 0)
  }

  test("cluster canonicalization tolerates an empty pair set") {
    import spark.implicits._
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.clustersFromPairs(spark, noPairs).count() == 0)
  }
}
