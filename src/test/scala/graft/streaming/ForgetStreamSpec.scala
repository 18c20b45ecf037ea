package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming deletion audit: the converged audit must be independent of
  * how events arrive across micro-batches — a user's 'forgotten' status
  * can flip in both directions as later-timestamped events surface.
  */
class ForgetStreamSpec extends SparkSpec {

  private def t(m: Int) =
    new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + m * 60000L)

  test("late-arriving newer events flip the forgotten flag both ways") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val in = mem.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val name = "forget_sink"
    val q = ForgetStream.audit(in).writeStream
      .outputMode(OutputMode.Update).format("memory").queryName(name).start()
    try {
      // batch 1: user 1 ends on error (forgotten), user 2 ends on click
      mem.addData((0L, t(0), 1L, "click"), (1L, t(5), 1L, "error"),
        (2L, t(5), 2L, "click"))
      q.processAllAvailable()
      // batch 2: user 1's LATER purchase un-forgets them; user 2's later
      // error forgets them — the fold must re-derive from (ts, event_id)
      mem.addData((3L, t(9), 1L, "purchase"), (4L, t(9), 2L, "error"))
      q.processAllAvailable()
    } finally q.stop()
    val audit = ForgetStream.finalizeAudit(spark.table(name))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // user 1 kept (3 events: click, error, purchase); user 2 purged
    // (click + error)
    assert(audit("click") == ((1L, 1L, 1L)))
    assert(audit("error") == ((1L, 1L, 1L)))
    assert(audit("purchase") == ((1L, 0L, 0L)))
  }

  test("covisit stream converges across batches to the batch index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, String)]
    val in = mem.toDF().toDF("user_id", "item", "tag")
      .select(col("user_id"),
        concat(lit("""{"k": """), col("item"), lit("}")).as("props"))
    val name = "covisit_sink"
    val q = CovisitStream.counts(in).writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
      .format("memory").queryName(name).start()
    try {
      // batch 1: users 1 and 2 both see item 10 — no pairs possible yet
      mem.addData((1L, 10L, "a"), (2L, 10L, "a"))
      q.processAllAvailable()
      // batch 2: both also see item 11 — pair (10, 11) now has 2 users
      mem.addData((1L, 11L, "b"), (2L, 11L, "b"), (2L, 12L, "b"))
      q.processAllAvailable()
    } finally q.stop()
    // checkpoint like runToMemorySink does: finalize self-joins the
    // counts, and a memory-sink lineage reused on both sides trips
    // Catalyst's conflicting-reference resolution
    val idx = CovisitStream.finalizeIndex(
      spark.table(name).localCheckpoint(true))
      .select("item_a", "item_b", "n_users", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(idx.contains((10L, 11L, 2L, 1)))
    assert(idx.contains((10L, 12L, 1L, 2)))
    assert(idx.contains((11L, 12L, 1L, 1)))
  }

  test("streaming audit equals the batch forget on the driver table") {
    val stream = ForgetStream.forgetStream(spark, sfDir)
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    val batch = graft.ops.Warehouse.forget(graft.Tables.events(spark, sfDir))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(stream == batch)
  }
}
