package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming throughput/latency probe — the streaming analog of
  * OpScaleProbe: drives the three stateful stream shapes through a
  * RATE-LIMITED source at several offered rates and records what the
  * engine actually sustains, from the engine's own progress metrics
  * (`StreamingQueryProgress`): achieved rows/s, micro-batch latency
  * (median + max triggerExecution), and state-store row count at stop.
  * The gate queries prove streaming CORRECTNESS (cross-batch state,
  * arrival-order independence); this probe supplies the missing RATE
  * evidence — where each state shape saturates on one node and what
  * the state store holds when it does.
  *
  * Probed shapes (the three distinct state disciplines):
  *  - user_totals: mapGroupsWithState over a BOUNDED key space (15k
  *    users) — state plateaus at the key count; throughput is the
  *    shuffle + state-store update path.
  *  - hll_native:  the custom `TypedImperativeAggregate` as streaming
  *    aggregation, 20 keys x 64-byte buffers — state is constant;
  *    throughput is hash + aggregate-buffer serde.
  *  - cdc_apply:   mapGroupsWithState over an UNBOUNDED key space with
  *    a 20% update mix — state grows with distinct keys in flight (the
  *    documented O(keys) contract); the probe records that growth
  *    rather than hiding it.
  *
  * Sink is `noop` (no memory-sink accumulation — the probe measures
  * the pipeline, not a test sink filling up). Env knobs:
  * SCALE_RATES (default "20000,200000,2000000" rows/s offered),
  * SCALE_SECS (default 20 per point), SCALE_OPS (prefix filter, same
  * contract as OpScaleProbe). Run points SEQUENTIALLY in one JVM but
  * time nothing else alongside (see memory: contention manufactures
  * phantom regressions).
  */
object StreamScaleProbe {

  private def rateSource(s: SparkSession, rowsPerSec: Long): DataFrame =
    s.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSec)
      .option("numPartitions", 8)
      .load()

  /** (name, outputMode, rate -> streaming frame). */
  private def pipelines(s: SparkSession): Seq[(String, OutputMode, Long => DataFrame)] = Seq(
    ("user_totals", OutputMode.Update, r =>
      graft.streaming.EventStreams.userTotalsStats(
        rateSource(s, r).select(
          (col("value") % 15000).as("user_id"),
          ((col("value") % 997) / 10.0).as("value")))),
    ("hll_native", OutputMode.Complete, r =>
      rateSource(s, r)
        .select(concat(lit("src"), col("value") % 20).as("source"),
          graft.ops.Sketches.h48((col("value") % 50000).cast("string")).as("h"))
        .groupBy("source")
        .agg(graft.functions.HllRegsAgg.hll_regs(col("h")).as("reg"))),
    ("cdc_apply", OutputMode.Update, r =>
      graft.streaming.ChangelogStream.materialize(
        rateSource(s, r).select(
          // 80% inserts of fresh keys, 20% version-1 updates of keys
          // seen ~1000 rows earlier — unbounded key space, mixed ops
          when(col("value") % 5 < 4, col("value"))
            .otherwise(col("value") - 1000).as("key"),
          when(col("value") % 5 < 4, lit(0)).otherwise(lit(1))
            .cast("int").as("version"),
          when(col("value") % 5 < 4, lit("I")).otherwise(lit("U")).as("op"),
          lit("O").as("status"),
          ((col("value") % 100000) / 7.0).as("price"),
          lit("1-URGENT").as("priority"),
          col("timestamp").as("odate")))),
    // the 4th state discipline: bounded O(k) per-key top-k — state
    // NEVER grows past keys x k no matter the offered rate; throughput
    // is the merge-and-truncate update path
    // the 5th state discipline: MERGING-INTERVAL session state — every
    // row extends or merges its user's open session_window; with all
    // keys hot the windows never close, so state rows plateau at the
    // key count while each update exercises the interval-merge path
    ("session_window", OutputMode.Append, r =>
      rateSource(s, r)
        .select((col("value") % 15000).as("user_id"),
          col("timestamp").as("ts"),
          ((col("value") % 997) / 10.0).as("value"))
        .withWatermark("ts", "10 seconds")
        .groupBy(col("user_id"),
          session_window(col("ts"), "5 seconds").as("sw"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))),
    // the 6th discipline: per-key MAP state (type counts + latest-event
    // marker per user) with a per-batch flatMap re-emission — bounded
    // keys (15k users x ≤8 types), each update folds into a small map
    ("forget", OutputMode.Update, r =>
      graft.streaming.ForgetStream.audit(
        rateSource(s, r).select(
          col("value").as("event_id"),
          col("timestamp").as("ts"),
          (col("value") % 15000).as("user_id"),
          concat(lit("t"), col("value") % 8).as("event_type")))),
    ("topk", OutputMode.Update, r =>
      graft.streaming.EventStreams.topkStats(
        rateSource(s, r).select(
          concat(lit("t"), col("value") % 8).as("event_type"),
          col("value").as("event_id"),
          ((col("value") % 9973) / 100.0).as("value")),
        graft.streaming.EventStreams.TopkK)))

  private def median(xs: Seq[Double]): Double =
    if (xs.isEmpty) Double.NaN
    else xs.sorted.apply(xs.size / 2)

  /** Round-15 sink-debt axis (`SCALE_OPS=sink_debt`): the streaming
    * snapshot sink is the system's most prolific small-file producer —
    * one file per batch per partition, forever — and round 15 wired
    * the same compaction cadence the maintained indexes got in r14
    * into it. This axis drives `SINK_BATCHES` (default 500)
    * micro-batch commits through [[graft.sources.SnapshotStreamSink
    * .writer]]'s foreachBatch body (the identical code path a live
    * query runs, minus the trigger scheduling this probe is not
    * measuring), cadence ON and OFF, recording every tenth: live data
    * file count, append latency, full-read latency. ON must saw-tooth
    * the file count under the debt threshold with read latency flat;
    * OFF grows O(batches) — the counterfactual. Ends by proving the
    * exactly-once floor (a redelivered batch id commits nothing) and
    * the row-level change feed (compactions contribute empty steps;
    * summed `A` rows equal the appended total) both survived the
    * cadence.
    */
  private def sinkDebtAxis(s: SparkSession): Unit = {
    import graft.sources.{SnapshotStreamSink, SnapshotTable}
    val batches = sys.env.getOrElse("SINK_BATCHES", "500").toInt
    val rowsPer = 20L
    Seq(("cadence_on", "24"), ("cadence_off", "0")).foreach {
      case (label, maxSmall) =>
        s.conf.set("graft.index.compact.max.small", maxSmall)
        val root = java.nio.file.Files
          .createTempDirectory("graft_sinkdebt").toString + "/t"
        val w = SnapshotStreamSink.writer(root, "probe",
          statsCol = Some("k"))
        def files(): Int = SnapshotTable.fileList(s, root,
          SnapshotTable.currentSnapshot(s, root)).size
        var maxFiles = 0
        val every = math.max(1, batches / 10)
        val t0 = System.nanoTime()
        (0 until batches).foreach { b =>
          val df = s.range(b * rowsPer, (b + 1) * rowsPer)
            .select(col("id").as("k")).repartition(2)
          w(df, b.toLong)
          maxFiles = math.max(maxFiles, files())
          if ((b + 1) % every == 0 || b == batches - 1) {
            val tRead0 = System.nanoTime()
            val n = SnapshotTable.read(s, root).count()
            val readSec = (System.nanoTime() - tRead0) / 1e9
            println(f"[sink-debt] $label%-11s batch=${b + 1}%4d " +
              f"files=${files()}%5d max_files=$maxFiles%5d " +
              f"read=$readSec%5.2fs rows=$n%7d " +
              f"elapsed=${(System.nanoTime() - t0) / 1e9}%6.1fs")
          }
        }
        // exactly-once floor survived the compaction commits: a
        // redelivered batch id is skipped (head does not advance)
        val head = SnapshotTable.currentSnapshot(s, root)
        w(s.range(0, 5).select(col("id").as("k")), (batches - 1).toLong)
        require(SnapshotTable.currentSnapshot(s, root) == head,
          s"[sink-debt] $label: redelivered batch advanced the head")
        // CDF consumers undisturbed: compaction steps are empty, the
        // summed appends equal what the stream wrote
        val fed = SnapshotTable.changeFeed(s, root, 0L, head)
          .groupBy("_op").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        require(fed.getOrElse("A", 0L) == batches * rowsPer,
          s"[sink-debt] $label: change feed saw $fed, expected " +
            s"A=${batches * rowsPer}")
        println(f"[sink-debt] $label%-11s DONE batches=$batches " +
          f"max_files=$maxFiles%5d floor_ok=true cdf_A=${fed("A")}")
    }
    s.conf.unset("graft.index.compact.max.small")
  }

  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[32]")
      .appName("graft-stream-scale")
      .config("spark.sql.shuffle.partitions", "8") // state-store count
      .config("spark.sql.streaming.metricsEnabled", "true")
      .config("spark.ui.enabled", "false")
    // SCALE_STATE=rocksdb swaps in the disk-backed state store — the
    // cluster-scale choice for UNBOUNDED key spaces (cdc_apply), where
    // the default in-memory provider's state must fit the executor heap.
    // The probe records what that durability costs in rows/s.
    if (sys.env.get("SCALE_STATE").contains("rocksdb"))
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val s = builder.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val rates = sys.env.getOrElse("SCALE_RATES", "20000,200000,2000000")
      .split(",").map(_.trim.toLong).toSeq
    val secs = sys.env.getOrElse("SCALE_SECS", "20").toInt
    val only = sys.env.get("SCALE_OPS").map(_.split(",").map(_.trim).toSeq)

    if (only.forall(_.exists("sink_debt".startsWith))) sinkDebtAxis(s)

    for {
      (name, mode, mk) <- pipelines(s)
      if only.forall(_.exists(name.startsWith))
      rate <- rates
    } {
      val ckpt = java.nio.file.Files.createTempDirectory(s"ssp_$name").toString
      val q = mk(rate).writeStream.format("noop").outputMode(mode)
        .option("checkpointLocation", ckpt).start()
      Thread.sleep(secs * 1000L)
      val progress = q.recentProgress.toSeq
      q.stop()
      // drop warmup batches (JIT + state-store open dominate the first few)
      val steady = progress.filter(_.numInputRows > 0).drop(3)
      val rows = steady.map(_.processedRowsPerSecond)
      val lat = steady.map(_.durationMs.get("triggerExecution").toDouble)
      val stateRows = steady.lastOption
        .flatMap(p => p.stateOperators.headOption).map(_.numRowsTotal).getOrElse(-1L)
      println(f"$name%-12s offered=$rate%9d achieved=${median(rows)}%11.0f rows/s " +
        f"batch_ms median=${median(lat)}%7.0f max=${if (lat.isEmpty) -1 else lat.max}%7.0f " +
        f"batches=${steady.size}%3d state_rows=$stateRows%9d")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
    s.stop()
  }
}
