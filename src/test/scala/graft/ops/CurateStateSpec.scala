package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-11 contract for [[PipelineOps.curateStep]]'s state: the dedup
  * digest is PERSISTED at commit time and the standing-state read is a
  * narrow digest-only scan — the anti-join must never touch (or
  * re-hash) the standing corpus's text bytes.
  */
class CurateStateSpec extends SparkSpec {

  private def prose(tag: String) =
    (s"the story of $tag is that it was good for all of them and " +
      "then the end came to pass as it should in a town by the sea ") * 3

  test("curateStep persists the digest column and standingDigests reads " +
      "ONLY it (schema and parquet ReadSchema exclude text)") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val root = java.nio.file.Files
      .createTempDirectory("graft_state").toString + "/curated"
    val b1 = Seq((10L, "s1", prose("alpha")), (11L, "s1", prose("beta")))
      .toDF("doc_id", "source", "text")
    PipelineOps.curateStep(spark, b1, root, "w0")
    // the stored table carries the digest column, equal to md5(text)
    val stored = SnapshotTable.read(spark, root)
    assert(stored.columns.toSeq ==
      Seq("doc_id", "source", "text", "digest"))
    assert(stored.filter(col("digest") =!= md5(col("text"))).count() == 0L)
    // the state frame is digest-only...
    val state = PipelineOps.standingDigests(spark, root)
    assert(state.columns.toSeq == Seq("digest"))
    // ...and the SCAN is too: parquet column pruning reads the digest
    // pages alone — the O(delta + narrow state) bound at 100 TB
    val plan = state.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<digest:string>"),
      s"state scan must read only the digest column, got:\n$plan")
    assert(!plan.contains("text"), "state scan must not touch text")
  }

  test("the second increment's anti-join prunes the state scan to the " +
      "digest column in the executed plan") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_state2").toString + "/curated"
    val b1 = Seq((10L, "s1", prose("alpha"))).toDF("doc_id", "source", "text")
    PipelineOps.curateStep(spark, b1, root, "w0")
    val b2 = Seq((20L, "s2", prose("alpha")), (21L, "s2", prose("gamma")))
      .toDF("doc_id", "source", "text")
    PipelineOps.curateStep(spark, b2, root, "w1")
    // first arrival won: doc 10 kept, 20 dropped, 21 fresh
    val got = graft.sources.SnapshotTable.read(spark, root)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(10L, 21L))
  }
}
