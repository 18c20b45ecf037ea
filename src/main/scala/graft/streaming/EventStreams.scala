package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table (the reference is batch-only
  * — `iterative_support` is an unused flag, reference `Panda.h:128` — so
  * this is pure capability extension per the north star).
  *
  * Both pipelines are driven synchronously off the parquet file for
  * testability (`processAllAvailable` + memory sink); swapping the source
  * for Kafka and the sink for a real table changes nothing upstream. At
  * scale: windowed aggregation state is bounded by watermark retention;
  * the custom-state pipelines keep O(1) state PER KEY — bounded for a
  * bounded key space (users), while an unbounded/rotating key space
  * would additionally need a `GroupStateTimeout` eviction policy (the
  * drained-file demos run with NoTimeout).
  */
object EventStreams {

  /** events schema with ts as raw nanos (the file stores TIMESTAMP(NANOS),
    * which the vectorized reader only accepts as long).
    */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Stateful-streaming parallelism should track state volume and input
    * rate, not the batch shuffle width: every shuffle partition carries a
    * state store (x2 for stream-stream joins), and dozens of stores over
    * kilobytes of state are pure overhead. Scope the partition count to
    * the streaming query; batch conf is restored after.
    */
  private val StreamPartitions = 8

  private def withStreamPartitions[T](s: SparkSession)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, StreamPartitions.toString)
    try f finally s.conf.set(key, prev)
  }

  /** Per-JVM-stable warehouse root for the catalog-registering stream
    * queries. Spark's CatalogManager caches catalog instances BY NAME
    * and keeps the first invocation's `warehouse` conf forever, so a
    * per-call temp warehouse under a fixed catalog name pins run 1's
    * directory and every later in-JVM run collides (the round-11 bench
    * recorded both catalog stream queries as failed for exactly this).
    * The fix is the same as `fmt_snapshot_sql`'s: ONE deterministic
    * warehouse for the JVM's lifetime — matching what the pinned
    * catalog instance actually uses — plus `DROP TABLE IF EXISTS`
    * before each CREATE so re-runs start from a fresh table root.
    * Checkpoints and sink names stay per-call unique.
    */
  private lazy val catalogWarehouseRoot: java.io.File = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_stream_cat_wh").toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(root)
    }))
    root
  }

  private def catalogWarehouse(tag: String): String =
    new java.io.File(catalogWarehouseRoot, tag).getAbsolutePath

  /** Start `df` as a streaming query into a uniquely-named memory sink,
    * drain it synchronously, stop it, and return the result — with the
    * streaming partition scoping applied. All engine stream queries
    * funnel through here so none can forget the scoping.
    *
    * The sink rows are eagerly checkpointed and the temp view DROPPED
    * before returning: a MemorySink holds every emitted row on the
    * driver heap for as long as its view is registered, and a bench or
    * verify pass running 13 stream queries × several iterations in one
    * JVM would otherwise accumulate dozens of retained sinks — exactly
    * the neighborhood-GC pressure the per-query cache clearing exists
    * to avoid. Callers get a self-contained checkpointed frame.
    */
  private[graft] def runToMemorySink(s: SparkSession, df: DataFrame,
      mode: OutputMode): DataFrame = {
    val name = "stream_" + java.util.UUID.randomUUID().toString.replace("-", "")
    withStreamPartitions(s) {
      val q = df.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    val out = s.table(name).localCheckpoint(eager = true)
    s.catalog.dropTempView(name)
    out
  }

  /** [[runToMemorySink]] with EXTRA DRAIN PHASES: after the first drain,
    * each callback runs (typically appending files to a source
    * directory) followed by another synchronous drain. This is how a
    * test or query advances the WATERMARK deterministically past all
    * real data — outer-join results and timed-out state are only
    * emitted once a LATER batch runs with the advanced watermark, so a
    * single drain can never surface them.
    */
  private[graft] def runToMemorySinkPhased(s: SparkSession, df: DataFrame,
      mode: OutputMode)(betweenDrains: Seq[() => Unit]): DataFrame = {
    val name = "stream_" + java.util.UUID.randomUUID().toString.replace("-", "")
    withStreamPartitions(s) {
      val q = df.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
      try {
        q.processAllAvailable()
        betweenDrains.foreach { f => f(); q.processAllAvailable() }
      } finally q.stop()
    }
    // same checkpoint-and-drop contract as runToMemorySink
    val out = s.table(name).localCheckpoint(eager = true)
    s.catalog.dropTempView(name)
    out
  }

  /** Streaming scan of one table out of a shared sf directory, resolving
    * BOTH physical layouts: a single `<table>.parquet` file (the driver's
    * fixtures) via a glob filter, or a Spark-written `<table>.parquet/`
    * directory of part files (DataGen output, any engine-written table)
    * by streaming the directory itself — pathGlobFilter matches file
    * names, so pointing it at a part-file directory would silently
    * stream zero files.
    */
  private[graft] def tableStream(s: SparkSession, dir: String, table: String,
      schema: StructType): DataFrame = {
    val sub = s"$dir/$table.parquet"
    val base = s.readStream.schema(schema)
    if (new java.io.File(sub).isDirectory) base.parquet(sub)
    else base.option("pathGlobFilter", s"$table.parquet").parquet(dir)
  }

  private[graft] def eventStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Streaming sources take a user schema on faith — declaring ts:Long
    // against a micros/INT96 file fails at read (or worse, silently
    // shifts the epoch by 1000x). One batch footer inference picks the
    // right decode per physical type, then the stream declares EXACTLY
    // what the footer says and normalizes to TimestampType afterwards:
    // TIMESTAMP(NANOS) surfaces as Long under nanosAsLong and needs the
    // div-1000 rebase; non-UTC-adjusted micros surface as TIMESTAMP_NTZ
    // and cast to tz-aware under the UTC session; UTC-adjusted
    // micros/INT96 surface as TimestampType and pass through.
    val tsType = s.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    val declared = tableStream(s, dir, "events",
      StructType(rawSchema.map(f =>
        if (f.name == "ts") f.copy(dataType = tsType) else f)))
    tsType match {
      // integer `div`: float division loses microseconds on epoch-nanos
      case LongType => declared.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        declared.withColumn("ts", col("ts").cast(TimestampType))
      case _ => declared
    }
  }

  /** Tumbling-window aggregation with a watermark; complete mode so the
    * memory sink holds every window once the file is drained.
    */
  def hourlyWindowed(s: SparkSession, dir: String): DataFrame = {
    val agg = eventStream(s, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
    // materialize before the in-memory sink table goes away
    runToMemorySink(s, agg, OutputMode.Complete)
  }

  final case class UserStat(user_id: Long, n_events: Long, sum_value: Double)
  final case class Ev(user_id: Long, value: Double)

  /** Arbitrary stateful processing: running per-user totals via
    * `mapGroupsWithState` (the reference's reduce-with-state contract has
    * no analog for streams; this is the Spark-native shape for it).
    */
  /** The stateful transform alone, over any (streaming) events frame —
    * split out so tests can drive it across multiple micro-batches.
    */
  private[graft] def userTotalsStats(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val updateFn: (Long, Iterator[Ev], GroupState[UserStat]) => UserStat =
      (uid, evs, state) => {
        var st = state.getOption.getOrElse(UserStat(uid, 0L, 0.0))
        evs.foreach(e =>
          st = st.copy(n_events = st.n_events + 1, sum_value = st.sum_value + e.value))
        state.update(st)
        st
      }
    events
      .select(col("user_id"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(updateFn)
      .toDF()
  }

  /** Update mode may emit a key several times across batches; keep the
    * final (largest) state per user.
    */
  private[graft] def finalizeUserTotals(sink: DataFrame): DataFrame =
    sink
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("sum_value"))).as("last"))
      .select(col("user_id"), col("last.n_events").as("n_events"),
        round(col("last.sum_value"), 2).as("sum_value"))

  def userTotals(s: SparkSession, dir: String): DataFrame = {
    val out = finalizeUserTotals(
      runToMemorySink(s, userTotalsStats(eventStream(s, dir)), OutputMode.Update))
    out.localCheckpoint(eager = true)
  }

  final case class TkEv(event_type: String, event_id: Long, value_fp: Long)
  final case class TopItem(value_fp: Long, event_id: Long)
  final case class TopkSt(event_type: String, n_seen: Long, items: Seq[TopItem])

  /** Streaming top-k per key kept as BOUNDED state: each key's state is
    * its k best (value, id) pairs so far — merging a micro-batch into
    * the kept set is lossless for top-k (an item once outside the
    * running top-k can never re-enter it), so the final state equals
    * the batch top-k no matter how the stream was chopped into batches
    * or ordered. State per key is O(k) forever — the shape that
    * replaces "sort the stream" (unbounded) for leaderboard/threshold
    * queries. Values rank as exact cents (round(value*100) as BIGINT)
    * with id tiebreak, so the ranking is integer-deterministic
    * cross-engine.
    */
  val TopkK = 10

  private[graft] def topkStats(events: DataFrame, k: Int): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val updateFn: (String, Iterator[TkEv], GroupState[TopkSt]) => TopkSt =
      (et, evs, state) => {
        val st = state.getOption.getOrElse(TopkSt(et, 0L, Seq.empty))
        val batch = evs.map(e => TopItem(e.value_fp, e.event_id)).toArray
        val merged = (st.items ++ batch)
          .sortBy(i => (-i.value_fp, i.event_id)).take(k)
        val next = TopkSt(et, st.n_seen + batch.length, merged)
        state.update(next)
        next
      }
    events
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("value_fp"))
      .as[TkEv]
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(updateFn)
      .toDF()
  }

  /** Update mode re-emits a key per batch; the state with the largest
    * n_seen is the final one. Ranks come from the state's own order.
    */
  private[graft] def finalizeTopk(sink: DataFrame): DataFrame =
    sink.groupBy("event_type")
      .agg(max(struct(col("n_seen"), col("items"))).as("last"))
      .select(col("event_type"), posexplode(col("last.items")))
      .select(col("event_type"), (col("pos") + 1).cast("int").as("rank"),
        col("col.event_id").as("event_id"), col("col.value_fp").as("value_fp"))

  def topkStream(s: SparkSession, dir: String): DataFrame =
    finalizeTopk(runToMemorySink(s, topkStats(eventStream(s, dir), TopkK),
      OutputMode.Update)).localCheckpoint(eager = true)

  final case class TimedEv(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserStatE(user_id: Long, n_events: Long, sum_value: Double,
    evicted: Boolean)

  /** Running per-user totals WITH STATE EVICTION — the rotating-key-space
    * policy [[userTotalsStats]]'s NoTimeout demo leaves out: each key's
    * state registers an EVENT-TIME timeout `retentionMs` past its last
    * event, and once the watermark passes that point the state is
    * emitted one final time (`evicted = true`) and REMOVED from the
    * store. State volume is then bounded by keys active inside the
    * retention horizon, not by all keys ever seen — the difference
    * between a demo and a deployable stream on an unbounded key space.
    * Event-time (not processing-time) timeouts keep the behavior
    * deterministic and replayable; the input must carry a watermark on
    * `ts` (EventTimeTimeout requires one).
    */
  private[graft] def userTotalsEvictingStats(events: DataFrame,
      retentionMs: Long): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val fn: (Long, Iterator[TimedEv], GroupState[UserStat]) => UserStatE =
      (uid, evs, state) => {
        if (state.hasTimedOut) {
          val st = state.get
          state.remove()
          UserStatE(uid, st.n_events, st.sum_value, evicted = true)
        } else {
          var st = state.getOption.getOrElse(UserStat(uid, 0L, 0.0))
          var lastMs = Long.MinValue
          evs.foreach { e =>
            st = st.copy(n_events = st.n_events + 1,
              sum_value = st.sum_value + e.value)
            lastMs = math.max(lastMs, e.ts.getTime)
          }
          state.update(st)
          // the registered timeout must sit strictly past the watermark
          state.setTimeoutTimestamp(
            math.max(state.getCurrentWatermarkMs + 1, lastMs + retentionMs))
          UserStatE(uid, st.n_events, st.sum_value, evicted = false)
        }
      }
    events.select(col("user_id"), col("ts"), col("value")).as[TimedEv]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout)(fn)
      .toDF()
  }

  final case class SessEv(user_id: Long, ts_us: Long)
  final case class SessState(last_ts: Long, n_sessions: Long, n_events: Long)

  private val SessionGapUs = 30L * 60 * 1000000

  /** Streaming gap-based sessionization via `flatMapGroupsWithState`:
    * per-user state carries (last event time, session count) across
    * batches; a >= 30 min silence opens a new session — the streaming
    * twin of the batch q19 window query, checked against the same
    * oracle. Events inside a batch are sorted per group before folding
    * (the file source delivers no order guarantee); across batches the
    * watermarkless demo assumes in-order arrival, which the single-file
    * drain satisfies.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fold: (Long, Iterator[SessEv], GroupState[SessState]) =>
        Iterator[(Long, Long, Long)] =
      (uid, evs, state) => {
        var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
        evs.toArray.sortBy(_.ts_us).foreach { e =>
          if (st.last_ts == Long.MinValue || e.ts_us - st.last_ts >= SessionGapUs)
            st = st.copy(n_sessions = st.n_sessions + 1)
          st = st.copy(last_ts = e.ts_us, n_events = st.n_events + 1)
        }
        state.update(st)
        Iterator((uid, st.n_sessions, st.n_events))
      }
    val sessions = eventStream(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us")).as[SessEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fold)
      .toDF("user_id", "n_sessions", "n_events")
    val out = runToMemorySink(s, sessions, OutputMode.Update)
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("n_sessions"))).as("last"))
      .select(col("user_id"), col("last.n_sessions").as("n_sessions"),
        col("last.n_events").as("n_events"))
    out.localCheckpoint(eager = true)
  }

  /** Stream-stream interval join: each click joined to the same user's
    * purchases within the preceding two hours. Both sides carry
    * watermarks and the join condition bounds the time skew, so state
    * for either side is evicted once the watermark passes — the
    * unbounded-state hazard of stream-stream joins is capped by
    * construction. Oracle: the equivalent batch range join.
    */
  def clickPurchaseJoin(s: SparkSession, dir: String): DataFrame = {
    val clicks = eventStream(s, dir)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "3 hours")
    val purchases = eventStream(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", "3 hours")
    val joined = clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") - expr("INTERVAL 2 HOURS") &&
        col("p_ts") < col("c_ts"))
      .select(col("click_id"), col("c_user").as("user_id"),
        col("purchase_id"), round(col("value"), 2).as("purchase_value"))
    runToMemorySink(s, joined, OutputMode.Append)
  }

  /** Stream-stream interval LEFT-OUTER join — [[clickPurchaseJoin]]
    * completed with the missing half of the semantics: clicks with NO
    * purchase in the preceding two hours emit one null-extended row.
    * This is the part of the outer-join contract single-pass drains
    * cannot show: Spark emits an outer row only when the WATERMARK has
    * closed the click's join window, i.e. during a LATER micro-batch.
    * The query makes that deterministic by unioning the event stream
    * with an initially-empty sentinel directory, then appending
    * far-future sentinel click/purchase pairs (negative user ids,
    * filtered from the result) and re-draining, twice: the first
    * sentinel batch advances the watermark past all real events, the
    * second GUARANTEES a data batch runs WITH that watermark — state
    * for every real click is evicted and each unmatched one emits its
    * null row before the final drain returns. No reliance on no-data
    * micro-batch scheduling, no timing dependence.
    *
    * At scale the state story is the interval join's: each side holds
    * only rows inside watermark + join-window horizon (3 h + 2 h), so
    * state is rate × horizon regardless of stream length; the sentinel
    * mechanism is test-harness scaffolding — a live deployment gets
    * the same eviction continuously from real event-time progress.
    * Oracle: the plain batch LEFT JOIN over the same interval.
    */
  def clickPurchaseLeftJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scratch =
      java.nio.file.Files.createTempDirectory("graft_ssj_sentinel").toString
    val sentinelSchema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    def evPlusSentinels(): DataFrame =
      eventStream(s, dir).unionByName(
        s.readStream.schema(sentinelSchema).parquet(scratch))
    val clicks = evPlusSentinels()
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "3 hours")
    val purchases = evPlusSentinels()
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", "3 hours")
    val joined = clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") - expr("INTERVAL 2 HOURS") &&
        col("p_ts") < col("c_ts"),
      "left_outer")
      .select(col("click_id"), col("c_user").as("user_id"), col("purchase_id"),
        round(col("value"), 2).as("purchase_value"))
    val tMax = graft.Tables.events(s, dir)
      .select(max(col("ts"))).first().getTimestamp(0)
    // one far-future click + one purchase per phase: BOTH sides must
    // advance (the global watermark is the MIN across watermark ops);
    // distinct negative users and a >2 h gap keep sentinels unmatchable
    def writeSentinels(days: Int): () => Unit = () => {
      val base = tMax.toInstant.plus(java.time.Duration.ofDays(days.toLong))
      Seq(
        (-1L, java.sql.Timestamp.from(base), -1L, "click", 0.0, "{}"),
        (-2L, java.sql.Timestamp.from(base.plusSeconds(10800L)), -2L,
          "purchase", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .repartition(1).write.mode("append").parquet(scratch)
    }
    runToMemorySinkPhased(s, joined, OutputMode.Append)(
      Seq(writeSentinels(30), writeSentinels(60)))
      .filter(col("user_id") >= 0)
      .localCheckpoint(eager = true)
  }

  /** Gap-based sessionization through Spark's BUILT-IN session_window
    * aggregation (the merging-interval state machine in the streaming
    * engine itself) — the second implementation of the session contract
    * next to the hand-rolled flatMapGroupsWithState fold
    * ([[sessionize]]): per (user, session) event count and value sum,
    * sessions closing as the watermark passes their end. Append mode
    * only emits CLOSED sessions, so the run borrows the
    * left-join family's sentinel discipline — far-future events advance
    * the watermark past every real session, flushing all of them
    * deterministically. The oracle is the batch lag/cumsum
    * sessionization with Spark's window bounds (start = first event,
    * end = last event + gap) — engine state machine vs SQL window
    * arithmetic must agree session-for-session.
    */
  def sessionWindowStream(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scratch =
      java.nio.file.Files.createTempDirectory("graft_sw_sentinel").toString
    val sentinelSchema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val ev = eventStream(s, dir)
      .unionByName(s.readStream.schema(sentinelSchema).parquet(scratch))
      .withWatermark("ts", "1 hour")
    val agg = ev
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"),
        col("n_events"), col("sum_value"))
    val tMax = graft.Tables.events(s, dir)
      .select(max(col("ts"))).first().getTimestamp(0)
    def writeSentinel(days: Int): () => Unit = () => {
      val base = tMax.toInstant.plus(java.time.Duration.ofDays(days.toLong))
      Seq((-1L, java.sql.Timestamp.from(base), -1L, "click", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .repartition(1).write.mode("append").parquet(scratch)
    }
    runToMemorySinkPhased(s, agg, OutputMode.Append)(
      Seq(writeSentinel(30), writeSentinel(60)))
      .filter(col("user_id") >= 0)
      .localCheckpoint(eager = true)
  }

  /** documents schema for streaming reads — ONE definition shared by
    * every doc-driven stream query so a schema change can't silently
    * diverge one of them from its oracle.
    */
  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming scan of the documents table (file-source twin of
    * `Tables.documents`).
    */
  private def docStream(s: SparkSession, dir: String): DataFrame =
    tableStream(s, dir, "documents", docSchema)

  /** The shared (source, tok) streaming tokenization — the same split/
    * filter the batch sketch queries use.
    */
  private def docTokenStream(s: SparkSession, dir: String): DataFrame =
    docStream(s, dir)
      .select(col("source"), explode(split(col("text"), " ", -1)).as("tok"))
      .filter(length(col("tok")) > 0)

  /** Streaming exact-dedup as an aggregation: group by content digest,
    * keep min doc_id + copy count (deterministic regardless of arrival
    * order, unlike streaming `dropDuplicates` whose keeper is
    * first-seen). Shares the batch dedup_exact oracle.
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    val agg = docStream(s, dir)
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("text_md5"), col("n_copies"))
    runToMemorySink(s, agg, OutputMode.Complete)
  }

  /** Streaming NEAR-DUP dedup — MinHash at ingest. The part of the
    * pipeline that must stream is the SIGNATURE STORE: each arriving
    * document is shingled and reduced to its 64-component MinHash
    * signature by the one streaming aggregation (64 `min`s per doc —
    * order-insensitive and merge-safe across micro-batches, the same
    * property that makes KMV/HLL valid streaming state; the store is
    * the product, so its size IS the state, exactly as a production
    * ingest-time signature table would be). LSH banding, bucket-join
    * candidate generation, and exact-Jaccard verification then run as
    * the batch finalization over the drained store — identical code to
    * `dedup_minhash` ([[graft.ops.Dedup.lshCandidatesFromSignatures]]),
    * so the streamed signatures are checked by the SAME DuckDB oracle:
    * any drift the stream introduced into any signature component
    * surfaces as a candidate-set (and therefore hash) change.
    */
  def minhashDedupStream(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Dedup
    val sigStream = Dedup.minhashSignatures(Dedup.shingles(docStream(s, dir)))
    val sig = runToMemorySink(s, sigStream, OutputMode.Complete)
      .localCheckpoint(eager = true)
    val sh = Dedup.shingles(graft.Tables.documents(s, dir))
    Dedup.verifyJaccard(Dedup.lshCandidatesFromSignatures(sig), sh)
  }

  /** The batch Gopher rule gates running UNCHANGED on a stream: the
    * operator is pure per-row arithmetic, so the identical function
    * composes over a streaming frame in Append mode — the streaming
    * curation shape where documents are gated as they arrive, state-free.
    * Shares the batch text_gopher_rules oracle.
    */
  def gopherRulesStream(s: SparkSession, dir: String): DataFrame = {
    val gated = graft.ops.TextAnalysis.gopherRules(docStream(s, dir))
    runToMemorySink(s, gated, OutputMode.Append)
  }

  /** Streaming KMV distinct-count sketch: the same custom combinable
    * Aggregator as the batch sketch_kmv — KMV state is order-insensitive
    * and merge-safe, which is exactly what makes it valid streaming
    * state (each micro-batch folds in, arrival order irrelevant). The
    * STREAM carries only the sketch (bounded state: k longs per
    * source); the exact distinct count — a pure error-reference column
    * that no real deployment would compute — joins in from a batch read
    * of the same file. Output schema equals the batch query's, so the
    * SAME DuckDB oracle checks stream/batch sketch equivalence.
    */
  /** Streaming HLL: the register build ([[graft.ops.Sketches.hllRegisters]])
    * runs AS the streaming aggregation — per-(source, bucket) max is
    * order-insensitive and needs no distinct pass, so state is bounded
    * at sources x m rows however long the stream runs (the property that
    * makes HLL the streaming NDV sketch). Finalization and the exact
    * error-reference column are the same code the batch query uses, so
    * the SAME DuckDB oracle checks stream/batch register equivalence.
    */
  /** Batch exact per-source token NDV — the error-reference column both
    * HLL stream twins join against.
    */
  private def docExactTokenNdv(s: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ", -1)).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("source").agg(count_distinct(col("tok")).as("n_exact"))

  /** The reference's flagship app as a STREAM: wordcount over the
    * documents feed (Complete mode — per-word counts refresh each
    * micro-batch; state is one long per distinct word, the same
    * combinable sum the batch/MR flavors run). Shares the batch
    * wordcount oracle verbatim: the reference's map/combine/reduce
    * demo, arrival-order-independent on an unbounded corpus.
    */
  def wordcountStream(s: SparkSession, dir: String): DataFrame =
    runToMemorySink(s,
      graft.apps.WordCount.countWords(docStream(s, dir), "text"),
      OutputMode.Complete).localCheckpoint(eager = true)

  def hllDistinctStream(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Sketches
    val reg = runToMemorySink(s, Sketches.hllRegisters(docTokenStream(s, dir)),
      OutputMode.Complete)
    Sketches.hllFinalize(reg, docExactTokenNdv(s, dir))
  }

  /** [[hllDistinctStream]] with the registers built by the native
    * [[graft.functions.HllRegsAgg]] aggregate AS the streaming
    * aggregation — the custom `TypedImperativeAggregate` carries its
    * 64-byte buffer in the state store across micro-batches, proving
    * the extension point works under Structured Streaming, not just
    * batch. State: one 64-byte sketch per source, however long the
    * stream runs (vs the composed path's sources x buckets max-rows).
    * Registers are identical to every other HLL path → same oracle.
    */
  def hllDistinctStreamNative(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Sketches
    val reg = runToMemorySink(s,
      docTokenStream(s, dir)
        .select(col("source"), Sketches.h48(col("tok")).as("h"))
        .groupBy("source")
        .agg(graft.functions.HllRegsAgg.hll_regs(col("h")).as("reg")),
      OutputMode.Complete)
    Sketches.hllFinalizeArray(reg, docExactTokenNdv(s, dir))
  }

  /** Streaming quantile sketch: the bucket build
    * ([[graft.ops.Sketches.quantileBuckets]]) runs AS the streaming
    * aggregation — bounded 16 x 64 bucket states however long the order
    * stream runs; finalization and the exact reference reuse the batch
    * code, so the SAME DuckDB oracle checks stream/batch equivalence.
    */
  def quantileSketchStream(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Sketches
    val orderSchema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_totalprice", DoubleType)))
    val vals = Sketches.quantileCents(tableStream(s, dir, "orders", orderSchema))
    val buckets = runToMemorySink(s, Sketches.quantileBuckets(vals),
      OutputMode.Complete)
    Sketches.quantileFinalize(buckets,
      Sketches.quantileCents(graft.Tables.orders(s, dir)))
  }

  def kmvDistinctStream(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Sketches
    val toks = docTokenStream(s, dir)
    val kmv = udaf(new Sketches.KMinValues(Sketches.KmvK))
    val sketch = runToMemorySink(s,
      toks.select(col("source"), Sketches.h48(col("tok")).as("h"))
        .groupBy("source").agg(kmv(col("h")).as("mins")),
      OutputMode.Complete)
    val numerator = (Sketches.KmvK - 1).toLong * (1L << 48)
    val exact = graft.Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ", -1)).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("source").agg(count_distinct(col("tok")).as("n_exact"))
    exact.join(sketch, "source")
      .select(col("source"), col("n_exact"),
        size(col("mins")).cast("long").as("n_kept"),
        element_at(col("mins"), size(col("mins"))).as("kth_hash"))
      .withColumn("ndv_est",
        when(col("n_kept") < Sketches.KmvK, col("n_kept"))
          .otherwise(expr(s"$numerator div kth_hash")))
  }

  /** Exactly-once streaming ingest into the snapshot layer
    * ([[graft.sources.SnapshotStreamSink]]): stream the events table
    * through `foreachBatch` into a [[graft.sources.SnapshotTable]] —
    * each micro-batch an atomic append snapshot carrying its batch id —
    * then read the FINAL table and aggregate, which the batch oracle
    * checks against the source table directly: the ingested table must
    * be the stream, exactly once. The replay audit drives the
    * post-restart path in-query: a FRESH writer (forced to recover its
    * floor from the manifest headers, as a restarted query would)
    * redelivers batch 0, and the table must not advance. The full
    * checkpoint-stop-restart discipline is spec-locked
    * (`SnapshotSinkSpec`) on top of this gate.
    */
  def snapshotSinkStream(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.{SnapshotStreamSink, SnapshotTable}
    // unique root per invocation: the table is the OUTPUT under test, so
    // bench/verify re-runs must start from an empty one, not append
    val base = java.nio.file.Files
      .createTempDirectory("graft_snapsink").toString
    val root = s"$base/table"
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val src = tableStream(s, dir, "events", schema)
    withStreamPartitions(s) {
      val q = src.writeStream
        .foreachBatch(SnapshotStreamSink.writer(root, "events"))
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val before = SnapshotTable.currentSnapshot(s, root)
    val replayWriter = SnapshotStreamSink.writer(root, "events")
    replayWriter(SnapshotTable.read(s, root).limit(1), 0L)
    val advanced = SnapshotTable.currentSnapshot(s, root) - before
    SnapshotTable.read(s, root)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .withColumn("replay_advanced", lit(advanced))
  }

  /** `writeStream.toTable` INTO A CATALOG SNAPSHOT TABLE — the pure-SQL
    * twin of [[snapshotSinkStream]]: no foreachBatch, no library call;
    * the V2 `StreamingWrite` ([[graft.sources.SnapshotStreamingWrite]])
    * lands every micro-batch as an atomic append snapshot with the
    * `stream.<tag>.batch` floor recorded, and the catalog read path
    * (with its transparent file skipping) serves the result. The
    * replay audit drives a SECOND query over the same checkpoint —
    * nothing redelivers, so the snapshot id must not advance.
    */
  def snapshotToTableStream(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.{SnapshotCatalog, SnapshotTable}
    // per-JVM warehouse + DROP/CREATE: re-runnable in one session (see
    // [[catalogWarehouseRoot]]); checkpoint stays per-call unique
    val wh = catalogWarehouse("snaptt_wh")
    val ckptBase = java.nio.file.Files
      .createTempDirectory("graft_snaptt").toString
    s.conf.set("spark.sql.catalog.gsnapst", classOf[SnapshotCatalog].getName)
    s.conf.set("spark.sql.catalog.gsnapst.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gsnapst.db")
    s.sql("DROP TABLE IF EXISTS gsnapst.db.ev")
    s.sql("CREATE TABLE gsnapst.db.ev " +
      "(event_id BIGINT, event_type STRING, value DOUBLE)")
    val root = s"$wh/db/ev"
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    withStreamPartitions(s) {
      val q = tableStream(s, dir, "events", schema).writeStream
        .option("checkpointLocation", s"$ckptBase/ckpt")
        .toTable("gsnapst.db.ev")
      try q.processAllAvailable() finally q.stop()
    }
    val before = SnapshotTable.currentSnapshot(s, root)
    withStreamPartitions(s) {
      // same checkpoint, no new data: every epoch is below the floor →
      // the restarted query must commit NOTHING
      val q = tableStream(s, dir, "events", schema).writeStream
        .option("checkpointLocation", s"$ckptBase/ckpt")
        .toTable("gsnapst.db.ev")
      try q.processAllAvailable() finally q.stop()
    }
    val advanced = SnapshotTable.currentSnapshot(s, root) - before
    s.sql("SELECT * FROM gsnapst.db.ev")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .withColumn("replay_advanced", lit(advanced))
  }

  /** The snapshot-table STREAM SOURCE end-to-end
    * ([[graft.sources.SnapshotStreamSourceProvider]],
    * `readStream.format("graft-snap-stream")`) — the read twin of
    * [[snapshotSinkStream]], closing the incremental loop: three append
    * commits land BEFORE the stream starts and a fourth lands
    * MID-STREAM; the tail delivers all four exactly once into a memory
    * sink (offsets are snapshot ids in the checkpoint, each micro-batch
    * reads only the appended files via `changesBetween` — O(metadata)
    * planning, never a table scan). The hash gate proves the delivered
    * rows equal the four batches' union; `mid_stream_rows` pins that
    * the post-start commit was tailed incrementally, not re-read.
    */
  def snapshotSourceStream(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.SnapshotTable
    // unique root + memory-sink name per invocation: the tail is the
    // unit under test, so bench/verify re-runs must start fresh
    val base = java.nio.file.Files
      .createTempDirectory("graft_snapsrc").toString
    val root = s"$base/table"
    val sinkName = s"snap_src_${java.util.UUID.randomUUID()
      .toString.replace("-", "")}"
    val o = graft.Tables.orders(s, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    SnapshotTable.commit(o.filter(col("o_orderkey") % 10 <= 3), root)
    SnapshotTable.commit(
      o.filter(col("o_orderkey") % 10 >= 4 && col("o_orderkey") % 10 <= 6),
      root)
    SnapshotTable.commit(o.filter(col("o_orderkey") % 10 >= 7), root)
    val (delivered, midRows) = withStreamPartitions(s) {
      val q = s.readStream.format("graft-snap-stream").load(root)
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      try {
        q.processAllAvailable()
        val before = s.table(sinkName).count()
        SnapshotTable.commit( // v4: lands while the query is running
          o.filter(col("o_orderkey") % 10 === 0)
            .withColumn("o_totalprice", col("o_totalprice") + 100.0),
          root)
        q.processAllAvailable()
        (s.table(sinkName), s.table(sinkName).count() - before)
      } finally q.stop()
    }
    delivered.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"),
        sum(col("o_orderkey")).as("sum_okey"))
      .withColumn("mid_stream_rows", lit(midRows))
  }

  /** STREAMING change-feed consumption end-to-end
    * (`readStream.format("graft-snap-stream")
    * .option("readChangeFeed", "true")`): a snapshot table takes a
    * merge (`UB`/`U`/`I`), a copy-on-write delete (`D`), and an append
    * (`A`) while a CDF tail is running; the delivered change frames
    * maintain an [[graft.ops.IncrementalView]] bootstrapped at the
    * stream's start snapshot, and the maintained view hash-equals the
    * oracle's from-scratch recomputation of the final table state.
    * This is the capability the batch gates can't show: derived state
    * kept consistent through row-level churn WITHOUT re-reading the
    * table — each micro-batch plans O(metadata) and scans only the
    * commit's own churn, and the append tail's refusal on merges and
    * deletes does not apply (the feed crosses them as ordinary
    * delta-priced steps). Sums are integer cents, so the maintained
    * algebra is exact regardless of micro-batch boundaries. The audit
    * pins the three commits and the full op vocabulary crossing the
    * wire.
    */
  def snapshotCdfStream(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.IncrementalView
    import graft.sources.SnapshotTable
    import org.apache.spark.sql.sources.{GreaterThan, LessThanOrEqual}
    val base = java.nio.file.Files
      .createTempDirectory("graft_snapcdfs").toString
    val root = s"$base/table"
    val sinkName = s"snap_cdfs_${java.util.UUID.randomUUID()
      .toString.replace("-", "")}"
    val o = graft.Tables.orders(s, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val mx = o.agg(max("o_orderkey")).head.getAs[Number](0).longValue
    val (dlo, dhi) = (mx / 2, mx * 6 / 10)
    // exact view algebra: integer cents, derived per-row on both the
    // bootstrap read and the feed (round-trips double repricing exactly)
    def cents(df: DataFrame): DataFrame =
      df.withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
    val v1 = SnapshotTable.commit(
      o.filter(col("o_orderkey") % 10 <= 3)
        .repartitionByRange(8, col("o_orderkey")),
      root, statsCol = Some("o_orderkey"))
    val view0 = IncrementalView.build(
      cents(SnapshotTable.readAt(s, root, v1)),
      Seq("o_orderstatus"), Seq("cents", "o_orderkey"))
    val feed = withStreamPartitions(s) {
      val q = s.readStream.format("graft-snap-stream")
        .option("readChangeFeed", "true")
        .option("startSnapshot", v1.toString)
        .load(root)
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      try {
        SnapshotTable.merge( // v2: reprice %10∈{2,3} (+500), insert +30M
          o.filter(col("o_orderkey") % 10 === 2 ||
              col("o_orderkey") % 10 === 3)
            .withColumn("o_totalprice", col("o_totalprice") + 500.0)
            .unionByName(o.filter(col("o_orderkey") % 10 === 7)
              .withColumn("o_orderkey", col("o_orderkey") + 30000000L)),
          root, "o_orderkey")
        q.processAllAvailable()
        SnapshotTable.deleteWhere(s, root, // v3: COW key-band delete
          Seq(GreaterThan("o_orderkey", dlo),
            LessThanOrEqual("o_orderkey", dhi)))
        q.processAllAvailable()
        SnapshotTable.commit( // v4: plain append
          o.filter(col("o_orderkey") % 10 === 9), root)
        q.processAllAvailable()
        s.table(sinkName)
      } finally q.stop()
    }
    val maintained = IncrementalView.maintain(view0, cents(feed),
      Seq("o_orderstatus"), Seq("cents", "o_orderkey"))
    val audits = feed.agg(
      countDistinct(col("_commit")).as("n_commits"),
      concat_ws(",", sort_array(collect_set(col("_op")))).as("ops_seen"))
    maintained.select(col("o_orderstatus"), col("n_rows"),
        col("sum_cents").as("total_cents"),
        col("sum_o_orderkey").as("sum_okey"))
      .crossJoin(broadcast(audits))
  }

  /** STREAMING ANN index maintenance — the live form of
    * [[graft.ops.AnnIndex]]'s batch catch-up: a change-feed tail over
    * the corpus snapshot table drives `foreachBatch`, and every
    * micro-batch folds into the SQ8 index through
    * [[graft.ops.AnnIndex.applyFeed]] (quantize-and-merge the arrived
    * keys under the FROZEN codebook, keyed-delete the departed ones,
    * last-commit-wins within the batch) while the corpus takes a
    * merge, a COW band delete, and an append mid-stream. Exactly-once
    * rides the index's own maintenance floor, so a replayed batch is
    * a no-op — the index is a downstream TABLE of the stream, never a
    * recomputation. The hash gate replays the whole pipeline in the
    * oracle (codebook from the original corpus, quantization of the
    * final churned corpus, ADC ranks), and the audit pins in-engine
    * confluence: the streamed index row-for-row equals a from-scratch
    * rebuild under the frozen codebook. At 100 TB this is the vector
    * index that FOLLOWS the corpus within a micro-batch — per-batch
    * cost O(churn), the index never rebuilt, search always served
    * from a consistent snapshot.
    */
  def annMaintainStream(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.{AnnIndex, Similarity}
    import graft.sources.SnapshotTable
    import org.apache.spark.sql.sources.{GreaterThan, LessThanOrEqual}
    val base = java.nio.file.Files
      .createTempDirectory("graft_annstream").toString
    val corpusRoot = s"$base/corpus"
    val indexRoot = s"$base/index"
    val emb = graft.Tables.embeddings(s, dir).select("vec_id", "embedding")
    val v1 = SnapshotTable.commit(
      emb.repartitionByRange(8, col("vec_id")), corpusRoot,
      statsCol = Some("vec_id"))
    AnnIndex.buildSq8Index(s, corpusRoot, indexRoot)
    withStreamPartitions(s) {
      val q = s.readStream.format("graft-snap-stream")
        .option("readChangeFeed", "true")
        .option("startSnapshot", v1.toString)
        .load(corpusRoot)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            val through = batch.agg(max(col("_commit"))).head.getLong(0)
            AnnIndex.applyFeed(s, indexRoot, batch, through)
            ()
          }
        }
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      try {
        SnapshotTable.merge( // v2: replace %10==3 doubled, insert +10M
          emb.filter(col("vec_id") % 10 === 3)
            .withColumn("embedding",
              transform(col("embedding"), x => x * lit(2.0f)))
            .unionByName(emb.filter(col("vec_id") % 10 === 7)
              .select((col("vec_id") + 10000000L).as("vec_id"),
                col("embedding"))),
          corpusRoot, "vec_id")
        q.processAllAvailable()
        SnapshotTable.deleteWhere(s, corpusRoot, // v3: COW band delete
          Seq(GreaterThan("vec_id", 100L), LessThanOrEqual("vec_id", 200L)))
        q.processAllAvailable()
        SnapshotTable.commit( // v4: plain append of shifted copies
          emb.filter(col("vec_id") % 10 === 1)
            .select((col("vec_id") + 20000000L).as("vec_id"),
              col("embedding")),
          corpusRoot)
        q.processAllAvailable()
      } finally q.stop()
    }
    // in-engine confluence audit + the oracle-replayed search
    val (nIndex, diff) = AnnIndex.confluenceAudit(s, corpusRoot, indexRoot)
    AnnIndex.searchSq8Index(s, indexRoot,
        Similarity.queryVectors(s, dir), Similarity.DefaultK)
      .withColumn("index_matches_rebuild",
        lit(if (diff == 0L) 1L else 0L))
      .withColumn("n_index_rows", lit(nIndex))
  }

  /** STREAMING lexical-index maintenance — [[annMaintainStream]]'s
    * retrieval twin ([[graft.ops.Bm25Index]]): the corpus table's live
    * change feed drives per-micro-batch tf/dl folds (`applyFeed` —
    * delete+append per touched doc, exactly-once on the dl floor)
    * through merge, COW band-delete, and plain-append churn; the gate
    * returns the maintained-index BM25 search plus the in-engine
    * confluence audit, and the DuckDB oracle replays the whole
    * pipeline over the reconstructed final corpus.
    */
  def bm25MaintainStream(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Bm25Index
    import graft.sources.SnapshotTable
    import org.apache.spark.sql.sources.{GreaterThan, LessThanOrEqual}
    val base = java.nio.file.Files
      .createTempDirectory("graft_bm25stream").toString
    val corpusRoot = s"$base/corpus"
    val indexRoot = s"$base/bm25"
    val docs = graft.Tables.documents(s, dir).select("doc_id", "text")
    val v1 = SnapshotTable.commit(
      docs.repartitionByRange(8, col("doc_id")), corpusRoot,
      statsCol = Some("doc_id"))
    Bm25Index.buildBm25Index(s, corpusRoot, indexRoot)
    withStreamPartitions(s) {
      val q = s.readStream.format("graft-snap-stream")
        .option("readChangeFeed", "true")
        .option("startSnapshot", v1.toString)
        .load(corpusRoot)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            val through = batch.agg(max(col("_commit"))).head.getLong(0)
            Bm25Index.applyFeed(s, indexRoot, batch, through)
            ()
          }
        }
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      try {
        SnapshotTable.merge( // v2: rewrite %10==3 texts, insert +10M
          docs.filter(col("doc_id") % 10 === 3)
            .withColumn("text",
              concat(col("text"), lit(" zzupdatedtoken")))
            .unionByName(docs.filter(col("doc_id") % 10 === 7)
              .select((col("doc_id") + 10000000L).as("doc_id"),
                col("text"))),
          corpusRoot, "doc_id")
        q.processAllAvailable()
        SnapshotTable.deleteWhere(s, corpusRoot, // v3: COW band delete
          Seq(GreaterThan("doc_id", 100L), LessThanOrEqual("doc_id", 200L)))
        q.processAllAvailable()
        SnapshotTable.commit( // v4: plain append of shifted copies
          docs.filter(col("doc_id") % 10 === 1)
            .select((col("doc_id") + 20000000L).as("doc_id"), col("text")),
          corpusRoot)
        q.processAllAvailable()
      } finally q.stop()
    }
    val (nTf, diff) = Bm25Index.confluenceAudit(s, corpusRoot, indexRoot)
    Bm25Index.searchBm25Index(s, corpusRoot, indexRoot)
      .withColumn("index_matches_rebuild",
        lit(if (diff == 0L) 1L else 0L))
      .withColumn("n_tf_rows", lit(nTf))
  }

  /** `spark.readStream.table("cat.db.t")` — the catalog twin of
    * [[snapshotSourceStream]] (same contract: snapshot-id offsets,
    * appended-files batches, exactly-once), through the table's own
    * `MicroBatchStream` instead of the path-based provider: two
    * commits land before the stream starts, a third lands mid-stream;
    * everything delivers exactly once into a memory sink.
    */
  def snapshotReadTableStream(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.{SnapshotCatalog, SnapshotTable}
    // per-JVM warehouse + DROP/CREATE: re-runnable in one session (see
    // [[catalogWarehouseRoot]]); checkpoint stays per-call unique
    val wh = catalogWarehouse("snaprt_wh")
    val base = java.nio.file.Files
      .createTempDirectory("graft_snaprt").toString
    s.conf.set("spark.sql.catalog.gsnaprt", classOf[SnapshotCatalog].getName)
    s.conf.set("spark.sql.catalog.gsnaprt.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gsnaprt.db")
    s.sql("DROP TABLE IF EXISTS gsnaprt.db.ord")
    s.sql("CREATE TABLE gsnaprt.db.ord " +
      "(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)")
    val root = s"$wh/db/ord"
    val sinkName = s"snap_rt_${java.util.UUID.randomUUID()
      .toString.replace("-", "")}"
    val o = graft.Tables.orders(s, dir)
      .select(col("o_orderkey").cast("bigint").as("o_orderkey"),
        col("o_orderstatus"),
        col("o_totalprice").cast("double").as("o_totalprice"))
    SnapshotTable.commit(o.filter(col("o_orderkey") % 10 <= 4), root)
    SnapshotTable.commit(
      o.filter(col("o_orderkey") % 10 >= 5 && col("o_orderkey") % 10 <= 8),
      root)
    val (delivered, midRows) = withStreamPartitions(s) {
      val q = s.readStream.table("gsnaprt.db.ord")
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      try {
        q.processAllAvailable()
        val before = s.table(sinkName).count()
        SnapshotTable.commit( // lands while the query is running
          o.filter(col("o_orderkey") % 10 === 9), root)
        q.processAllAvailable()
        (s.table(sinkName), s.table(sinkName).count() - before)
      } finally q.stop()
    }
    delivered.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"),
        sum(col("o_orderkey")).as("sum_okey"))
      .withColumn("mid_stream_rows", lit(midRows))
  }
}
