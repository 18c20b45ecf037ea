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
