package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Cross-micro-batch state: the oracle gate drains the events file in one
  * batch, so this spec is what proves the `mapGroupsWithState` totals
  * genuinely accumulate across batches — two source files, one file per
  * trigger, state carried between triggers.
  */
class StreamingStateSpec extends SparkSpec {

  test("user totals accumulate across micro-batches (state survives triggers)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    try {
      val events = graft.Tables.events(spark, sfDir)
        .select("event_id", "user_id", "value")
      // two disjoint halves as separate files => two triggers
      events.filter(col("event_id") % 2 === 0)
        .coalesce(1).write.parquet(s"$dir/half0")
      events.filter(col("event_id") % 2 === 1)
        .coalesce(1).write.parquet(s"$dir/half1")
      val files = new java.io.File(dir).listFiles().flatMap(_.listFiles())
        .filter(_.getName.endsWith(".parquet"))
      val src = s"$dir/src"
      new java.io.File(src).mkdirs()
      files.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(s"$src/part$i.parquet"))
      }

      val schema = StructType(Seq(
        StructField("event_id", LongType),
        StructField("user_id", LongType),
        StructField("value", DoubleType)))
      val stream = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
      val sink = EventStreams.runToMemorySink(
        spark, EventStreams.userTotalsStats(stream), OutputMode.Update)
      // at least one user must have been emitted in BOTH batches, or the
      // test isn't exercising cross-batch state at all
      val emissions = sink.groupBy("user_id").count()
        .filter(col("count") >= 2).count()
      assert(emissions > 0, "no user spanned two micro-batches")

      val streamed = EventStreams.finalizeUserTotals(sink)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val batch = events.groupBy("user_id")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(streamed == batch)
    } finally graft.tera.TeraIO.delete(spark, dir)
  }

  test("event-time timeout evicts idle state; in-window totals stay batch-equal") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val in = mem.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "0 seconds")
    val out = EventStreams.userTotalsEvictingStats(in, 3600L * 1000) // 1h
    val name = "evict_sink"
    val q = out.writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName(name).start()
    try {
      mem.addData((1L, ts(10, 0), 1.0), (2L, ts(10, 0), 2.0))
      q.processAllAvailable() // watermark after batch: 10:00
      mem.addData((2L, ts(13, 0), 3.0))
      q.processAllAvailable() // watermark after batch: 13:00
      // user 1's timeout (11:00) is now behind the watermark → this
      // batch must emit its final state and drop it from the store
      mem.addData((3L, ts(13, 30), 4.0))
      q.processAllAvailable()
      // user 1 returns AFTER eviction: totals must restart from zero
      mem.addData((1L, ts(13, 40), 5.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name)
      .select("user_id", "n_events", "sum_value", "evicted")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    val evictions = rows.filter(_._4)
    assert(evictions == Seq((1L, 1L, 1.0, true)),
      s"exactly user 1's state evicts, with its pre-eviction totals: $rows")
    // state genuinely dropped: the post-eviction emission restarts at 1
    // event (a surviving state would have counted 2)
    assert(rows.contains((1L, 1L, 5.0, false)), rows.toString)
    // keys that stayed inside the retention window accumulate exactly
    // the batch totals (the oracle-equal half of the contract)
    val last = rows.filterNot(_._4).groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(r => (r._2, r._3)).maxBy(_._1) }
    assert(last(2L) == ((2L, 5.0)), last.toString)
    assert(last(3L) == ((1L, 4.0)), last.toString)
  }

  test("streaming top-k state is batch-chop independent and truly bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // 30 events, one key, values permuted so the top-10 spreads across
    // batches; run once as 1 batch and once as 3 — identical final rows
    val vals = (1 to 30).map(i => (i.toLong, ((i * 17) % 30 + 1) * 1.0))
    def drive(chunks: Seq[Seq[(Long, Double)]]) = {
      val mem = MemoryStream[(String, Long, Double)]
      val in = mem.toDF().toDF("event_type", "event_id", "value")
      val out = EventStreams.topkStats(in, 10)
      val name = "topk_sink_" + chunks.length
      val q = out.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName(name).start()
      try chunks.foreach { c =>
        mem.addData(c.map { case (id, v) => ("click", id, v) })
        q.processAllAvailable()
      } finally q.stop()
      val r = EventStreams.finalizeTopk(spark.table(name))
        .as[(String, Int, Long, Long)].collect().toSeq.sorted
      spark.catalog.dropTempView(name)
      r
    }
    val oneShot = drive(Seq(vals))
    val chopped = drive(Seq(vals.take(7), vals.slice(7, 19), vals.drop(19)))
    assert(oneShot == chopped)
    assert(oneShot.length == 10)
    // the kept set is the true batch top-10 (cents fixed point, id tiebreak)
    val expect = vals.map { case (id, v) => (math.round(v * 100), id) }
      .sortBy(p => (-p._1, p._2)).take(10)
      .zipWithIndex
      .map { case ((fp, id), i) => ("click", i + 1, id, fp) }.sorted
    assert(oneShot == expect)
  }

  test("left-outer interval join emits watermark-evicted null rows, batch-equal") {
    val out = EventStreams.clickPurchaseLeftJoin(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
      .sorted
    val unmatched = out.count(_._3 == -1L)
    // outer rows must actually exist, or the sentinel watermark-advance
    // machinery silently degraded to an inner join
    assert(unmatched > 0, "no null-extended click rows emitted")
    val ev = graft.Tables.events(spark, sfDir)
    val batch = ev.filter(col("event_type") === "click").as("c")
      .join(ev.filter(col("event_type") === "purchase").as("p"),
        col("p.user_id") === col("c.user_id") &&
          col("p.ts") >= col("c.ts") - expr("INTERVAL 2 HOURS") &&
          col("p.ts") < col("c.ts"),
        "left_outer")
      .select(col("c.event_id"), col("c.user_id"), col("p.event_id"),
        round(col("p.value"), 2))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
      .sorted
    assert(out.length == batch.length && out.sameElements(batch))
  }

  test("minhash signature store is arrival-split independent: two-batch " +
    "stream equals the batch pipeline") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // a planted near-dup pair (21-token docs differing in the last token:
    // 16 of 18 distinct shingles shared, J ≈ 0.89 ≥ 0.8) plus two
    // unrelated docs, split across micro-batches so signature rows must
    // merge across batches to match the batch result
    val words = (0 until 21).map(i => s"tok$i")
    val d1 = words.mkString(" ")
    val d2 = (words.take(20) :+ "tokX").mkString(" ")
    val d3 = (0 until 21).map(i => s"alt$i").mkString(" ")
    val d4 = (0 until 21).map(i => s"oth$i").mkString(" ")
    val docs = Seq((1L, d1), (2L, d2), (3L, d3), (4L, d4))
    val mem = MemoryStream[(Long, String)]
    val in = mem.toDF().toDF("doc_id", "text")
    val sigStream = graft.ops.Dedup.minhashSignatures(
      graft.ops.Dedup.shingles(in))
    val name = "minhash_sig_sink"
    val q = sigStream.writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName(name).start()
    try {
      mem.addData((1L, d1), (3L, d3))
      q.processAllAvailable()
      mem.addData((2L, d2), (4L, d4))
      q.processAllAvailable()
    } finally q.stop()
    val streamedSig = spark.table(name).localCheckpoint(eager = true)
    val batchDocs = docs.toDF("doc_id", "text")
    val sh = graft.ops.Dedup.shingles(batchDocs)
    val streamed = graft.ops.Dedup.verifyJaccard(
      graft.ops.Dedup.lshCandidatesFromSignatures(streamedSig), sh)
      .collect().map(_.toSeq).toSet
    val batch = graft.ops.Dedup.minhashLshDocs(batchDocs)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty,
      s"stream $streamed vs batch $batch")
  }

  test("stream_outliers equals the batch flag set (arrival-order independence)") {
    val streamed = graft.ops.PipelineOps.outlierStream(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val batch = graft.ops.PipelineOps.outlierFlags(
      graft.Tables.events(spark, sfDir)).collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("built-in session_window agrees with the custom-state sessionize fold") {
    import org.apache.spark.sql.functions._
    val sw = EventStreams.sessionWindowStream(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fold = EventStreams.sessionize(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sw.nonEmpty && sw == fold)
  }
}
