package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Empty-input robustness for the round-4 operators: every one must
  * return an empty (or zero-valued) frame, never throw — the property
  * that matters when a 100 TB pipeline stage receives a filtered-out
  * partition.
  */
class Round4EmptySpec extends SparkSpec {

  private def noDocs = graft.Tables.documents(spark, sfDir)
    .filter(col("doc_id") < 0)
  private def noEvents = graft.Tables.events(spark, sfDir)
    .filter(col("event_id") < 0)

  test("sketches tolerate an empty corpus") {
    assert(Sketches.kmvDistinct(noDocs).count() == 0)
    assert(Sketches.countMinTopTokens(noDocs).count() == 0)
    assert(Sketches.amsF2(noDocs).count() == 0)
  }

  test("bloom join with an empty build side passes nothing and claims nothing") {
    val noCust = graft.Tables.customer(spark, sfDir)
      .filter(col("c_custkey") < 0)
    val out = Sketches.bloomJoinStats(noCust, graft.Tables.orders(spark, sfDir))
    import spark.implicits._
    val rows = out.select("n_orders", "n_pass", "n_true", "n_false_pos")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty, "orders still report, nothing passes")
    rows.foreach { case (n, pass, truth, fp) =>
      assert(n > 0 && pass == 0 && truth == 0 && fp == 0)
    }
  }

  test("graph operators tolerate an empty event stream") {
    assert(GraphOps.pagerank(noEvents).count() == 0)
    import spark.implicits._
    val (nodes, edges, tris) = GraphOps.triangleCensus(noEvents)
      .as[(Long, Long, Long)].head()
    assert(nodes == 0 && edges == 0 && tris == 0)
  }

  test("text LM and rule gates tolerate an empty corpus") {
    assert(TextAnalysis.bigramLm(noDocs).count() == 0)
    assert(TextAnalysis.gopherRules(noDocs).count() == 0)
  }
}
