package graft.streaming

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

  test("streaming audit equals the batch forget on the driver table") {
    val stream = ForgetStream.forgetStream(spark, sfDir)
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    val batch = graft.ops.Warehouse.forget(graft.Tables.events(spark, sfDir))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(stream == batch)
  }
}
