package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Warehouse-maintenance operators: the dimension/CDC machinery a
  * 100 TB lake runs nightly next to the training-data pipeline. The
  * reference's contract covers them implicitly (they are map → group →
  * reduce shapes, `src/panda/PandaMapReduceJob.cpp:885-955`), but a
  * user migrating a production pipeline needs them as first-class
  * operators:
  *
  *  - SCD2 dimension build ([[scd2OrderStatus]]): fold an ordered
  *    change history into validity intervals — two window passes over
  *    ONE partitioning (a single shuffle by the dimension key).
  *  - CDC MERGE apply ([[cdcApply]]): upsert + delete a change batch
  *    into a snapshot — the copy-on-write MERGE INTO kernel, one
  *    key-equi join (broadcast when the change batch is small, which
  *    in production it almost always is).
  *
  * Both are deterministic over the driver tables (the change batch is
  * derived from key residues, so the DuckDB oracle replays it exactly)
  * and hash-checked end-to-end.
  */
object Warehouse {

  private val Ts = "yyyy-MM-dd HH:mm:ss"

  /** SCD2 (slowly-changing-dimension type 2) build: per customer, the
    * o_orderstatus history ordered by (o_orderdate, o_orderkey),
    * consecutive duplicates collapsed, each surviving change emitted as
    * a versioned row with [valid_from, valid_to) — valid_to of the
    * current version is the open-ended 9999-12-31 sentinel.
    *
    * Scale shape: lag() to find change points and lead()+row_number()
    * to close the intervals share the SAME (o_custkey, o_orderdate,
    * o_orderkey) window ordering, so Catalyst plans ONE shuffle and one
    * sort for the whole build; state per key is the history length,
    * never the table.
    */
  def scd2OrderStatus(s: SparkSession, dir: String): DataFrame =
    scd2(Tables.orders(s, dir))

  def scd2(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val changes = orders
      .withColumn("prev_status", lag(col("o_orderstatus"), 1).over(w))
      .filter(col("prev_status").isNull ||
        col("prev_status") =!= col("o_orderstatus"))
    changes
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from", date_format(col("o_orderdate"), Ts))
      .withColumn("valid_to",
        coalesce(date_format(lead(col("o_orderdate"), 1).over(w), Ts),
          lit("9999-12-31 00:00:00")))
      .select(col("o_custkey"), col("version"),
        col("o_orderstatus").as("status"),
        col("valid_from"), col("valid_to"))
  }

  /** The deterministic change batch both engines derive from key
    * residues: keys ≡ 0..2 (mod 10) are updates (price bumped 100),
    * keys ≡ 3 (mod 10) are deletes. In production this frame is the
    * CDC feed (Debezium/binlog); deriving it from the snapshot keeps
    * the operator oracle-replayable without a second test table.
    */
  private def changeBatch(orders: DataFrame): DataFrame =
    orders
      .filter(col("o_orderkey") % 10 <= lit(3))
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 10 === lit(3), lit("D"))
          .otherwise(lit("U")).as("op"),
        (col("o_totalprice") + lit(100.0)).as("new_price"))

  /** CDC MERGE apply: the upsert/delete kernel of `MERGE INTO` on a
    * copy-on-write lake. One left equi-join of the snapshot against the
    * change batch on the primary key; matched 'D' rows drop, matched
    * 'U' rows take the new values, unmatched rows pass through. At
    * production change-batch sizes (≪ snapshot) the join broadcasts;
    * AQE picks that up from runtime stats. (The union + latest-wins
    * row_number() form computes the same result but shuffles BOTH
    * inputs; the join form ships only the batch.)
    */
  def cdcApply(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
    cdcMerge(base, changeBatch(base))
  }

  def cdcMerge(base: DataFrame, changes: DataFrame): DataFrame =
    base.join(changes, Seq("o_orderkey"), "left_outer")
      .filter(col("op").isNull || col("op") =!= lit("D"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(when(col("op") === lit("U"), col("new_price"))
          .otherwise(col("o_totalprice")), 2).as("o_totalprice"),
        col("o_orderpriority"),
        date_format(col("o_orderdate"), Ts).as("o_orderdate"))

  /** Per-JVM scratch root for the compaction round trip, deleted on
    * exit (same hygiene as FormatQueries: concurrent drivers must not
    * overwrite each other's files mid-read).
    */
  private lazy val scratchRoot: java.io.File = {
    val root = java.nio.file.Files.createTempDirectory("graft_wh_").toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(root)
    }))
    root
  }
  private def scratch(tag: String): String =
    new java.io.File(scratchRoot, tag).getAbsolutePath

  /** Total bytes of data files under a table directory, via the Hadoop
    * FS API (on a cluster this is the manifest/listing a real compactor
    * reads; O(files) driver-side METADATA, never data).
    */
  def dataFileBytes(s: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
  }

  def dataFileCount(s: SparkSession, dir: String): Int = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.listStatus(path)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
  }

  /** Production-shape target (what a lake compacts toward); the fixture
    * tables land well under one file of this size, which is exactly the
    * point — 64 ingest fragments collapse to 1.
    */
  val CompactTargetBytes: Long = 128L * 1024 * 1024

  /** Bin-pack compaction: rewrite a fragmented table directory into
    * size-targeted files WITHOUT a shuffle — `coalesce` merges input
    * splits within tasks, so the rewrite is pure IO (read + re-encode),
    * no Exchange anywhere in the plan ([[WarehouseSpec]] asserts both
    * the plan shape and the file-count collapse). Returns the output
    * file count actually planned.
    */
  def compact(s: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = CompactTargetBytes): Int = {
    val nOut = math.max(1,
      math.ceil(dataFileBytes(s, inDir).toDouble / targetBytes).toInt)
    s.read.parquet(inDir).coalesce(nOut)
      .write.mode("overwrite").parquet(outDir)
    nOut
  }

  /** The maintenance pass every streaming/ingest lake runs: thousands
    * of per-micro-batch files per partition degrade scan planning (task
    * per tiny file, listing dominates) until a compactor bin-packs them.
    * The gate query fragments events into 64 small files (simulating 64
    * ingest batches), compacts by [[compact]], and aggregates the
    * read-back — the DuckDB oracle computes the identical aggregate
    * from the original parquet, so the whole fragment → compact → read
    * cycle is proven value-invisible.
    */
  def compactEvents(s: SparkSession, dir: String): DataFrame = {
    val fragDir = scratch("frag_events")
    Tables.events(s, dir).repartition(64)
      .write.mode("overwrite").parquet(fragDir)
    val compactDir = scratch("compact_events")
    compact(s, fragDir, compactDir)
    s.read.parquet(compactDir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("sum_value"),
        sum(col("user_id")).as("sum_user"),
        date_format(max(col("ts")), Ts).as("max_ts"))
  }

  /** Three-day versioned changelog with FULL ROW IMAGES (the shape a
    * Debezium/binlog feed with `after` images, or a lakehouse commit
    * log, actually carries): version 0 inserts the snapshot, version 1
    * replays the [[changeBatch]] day (price bump on keys ≡ 0..2 mod 10,
    * delete keys ≡ 3), version 2 a second day that updates keys ≡ 0..1
    * to +150, RESURRECTS the deleted keys ≡ 3 at their original image,
    * and deletes keys ≡ 4. Derived from key residues so the DuckDB
    * oracle replays it exactly — in production this is the commit log
    * itself.
    */
  private[graft] def versionedLog(o: DataFrame): DataFrame = {
    val k = col("o_orderkey") % 10
    def img(ver: Int, op: Column, price: Column) =
      Seq(col("o_orderkey"), lit(ver).as("version"), op.as("op"),
        col("o_orderstatus"), price.as("o_totalprice"),
        col("o_orderpriority"), col("o_orderdate"))
    val v0 = o.select(img(0, lit("I"), col("o_totalprice")): _*)
    val v1 = o.filter(k <= lit(3))
      .select(img(1, when(k === lit(3), lit("D")).otherwise(lit("U")),
        col("o_totalprice") + lit(100.0)): _*)
    val v2 = o.filter(k <= lit(1) || k === lit(3) || k === lit(4))
      .select(img(2,
        when(k === lit(4), lit("D")).when(k === lit(3), lit("I"))
          .otherwise(lit("U")),
        when(k === lit(3), col("o_totalprice"))
          .otherwise(col("o_totalprice") + lit(150.0))): _*)
    v0.unionByName(v1).unionByName(v2)
  }

  /** Time travel: reconstruct the table AS OF changelog version
    * `asof`. With full-image ops this is latest-op-wins — ONE
    * combinable `max(struct(version, ...))` aggregation keyed by the
    * primary key (versions are distinct per key, so the struct
    * comparison never reads past the version field), then drop keys
    * whose latest visible op is a delete. One Exchange on the key, no
    * window sort, no join — the partial aggregate collapses each key's
    * ops map-side, so the shuffle carries at most one row per (key,
    * mapper). The gate reads as-of version 2, which exercises every
    * path at once: double-update (keys ≡ 0..1), update-only history
    * (≡ 2), delete-then-resurrect (≡ 3), late delete (≡ 4), untouched
    * (≡ 5..9).
    */
  def snapshotAsOf(log: DataFrame, asof: Int): DataFrame =
    log.filter(col("version") <= lit(asof))
      .groupBy("o_orderkey")
      .agg(max(struct(col("version"), col("op"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"), col("o_orderdate")))
        .as("last"))
      .filter(col("last.op") =!= lit("D"))
      .select(col("o_orderkey"),
        col("last.o_orderstatus").as("o_orderstatus"),
        round(col("last.o_totalprice"), 2).as("o_totalprice"),
        col("last.o_orderpriority").as("o_orderpriority"),
        date_format(col("last.o_orderdate"), Ts).as("o_orderdate"))

  def snapshotAsOfQuery(s: SparkSession, dir: String): DataFrame =
    snapshotAsOf(versionedLog(Tables.orders(s, dir)), asof = 2)

  /** Right-to-be-forgotten propagation (the GDPR/CCPA deletion pass every
    * user-data warehouse schedules): the request set is derived in-data —
    * users whose LATEST event is an 'error' (a stand-in for an explicit
    * deletion signal) — then every row of theirs is purged from the fact
    * stream, with a per-event-type audit of kept/purged rows and purged
    * users (the compliance report that proves the deletion ran).
    *
    * Scale shape: latest-per-user is ONE combinable max-of-struct
    * aggregation (no window, partial agg map-side); the request set is a
    * tiny fraction of users, so the purge join broadcasts under AQE and
    * the facts never reshuffle. At 100 TB this is a metadata-sized join
    * against a full scan — the minimum the semantics permit.
    */
  def forget(events: DataFrame): DataFrame = {
    val requests = events
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("last"))
      .filter(col("last.event_type") === lit("error"))
      .select(col("user_id"), lit(true).as("forgotten"))
    events.join(requests, Seq("user_id"), "left")
      .groupBy("event_type")
      .agg(
        count(when(col("forgotten").isNull, 1)).as("kept_events"),
        count(col("forgotten")).as("purged_events"),
        countDistinct(when(col("forgotten").isNotNull, col("user_id")))
          .as("purged_users"))
  }

  def forgetQuery(s: SparkSession, dir: String): DataFrame =
    forget(Tables.events(s, dir))

  /** Incremental view maintenance — the delta-apply path a materialized
    * aggregate takes when a change batch lands, instead of recomputing
    * from the fact table: the maintained view (orders per status:
    * count + total in EXACT cents) absorbs the standard derived change
    * batch (keys ≡ 0..2 mod 10 get +100.00, keys ≡ 3 mod 10 delete) as
    * a per-group delta — deletes subtract their before-image, updates
    * add their price delta — joined onto the old view at |groups| size.
    *
    * The ORACLE recomputes the view from the merged state from scratch;
    * hash-equality of the two IS the IVM correctness statement
    * (delta-apply ≡ recompute). Totals are integer cents so the
    * incremental sum is bit-equal to the recomputed sum — the float
    * version of this query is where addition order would leak.
    *
    * Scale shape: the maintenance pass scans ONLY the change batch and
    * the |groups|-row view — the fact table is not touched (here the
    * "stored" view is derived once, standing in for the materialized
    * table a warehouse reads from disk).
    */
  def ivmAgg(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val cents = round(col("o_totalprice") * 100).cast("long")
    val baseView = o.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n0"), sum(cents).as("c0"))
    val changes = o.filter(col("o_orderkey") % 10 <= 3)
      .select(col("o_orderstatus"),
        when(col("o_orderkey") % 10 === 3, lit("D")).otherwise(lit("U"))
          .as("op"),
        cents.as("old_c"))
    val delta = changes.groupBy("o_orderstatus").agg(
      (-sum(when(col("op") === "D", 1L).otherwise(0L))).as("dn"),
      sum(when(col("op") === "D", -col("old_c")).otherwise(lit(10000L)))
        .as("dc"))
    baseView.join(delta, Seq("o_orderstatus"), "left")
      .select(col("o_orderstatus"),
        (col("n0") + coalesce(col("dn"), lit(0L))).as("n_orders"),
        (col("c0") + coalesce(col("dc"), lit(0L))).as("total_cents"))
      // standard IVM group-deletion: a group whose rows are all deleted
      // leaves the view (the recompute oracle never sees it either)
      .filter(col("n_orders") > 0)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wh_ivm_agg" -> (ivmAgg _),
    "wh_scd2" -> (scd2OrderStatus _),
    "wh_cdc_apply" -> (cdcApply _),
    "wh_compact" -> (compactEvents _),
    "wh_snapshot_asof" -> (snapshotAsOfQuery _),
    "wh_forget" -> (forgetQuery _)
  )

  val oracles: Map[String, String] = Map(
    // full recompute from the merged state — equality with the engine's
    // delta-apply is the IVM correctness statement
    "wh_ivm_agg" ->
      """WITH ch AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 10 = 3 THEN 'D' ELSE 'U' END AS op
        |  FROM orders WHERE o_orderkey % 10 <= 3),
        |merged AS (
        |  SELECT b.o_orderstatus,
        |    CAST(round(b.o_totalprice * 100) AS BIGINT)
        |      + CASE WHEN ch.op = 'U' THEN 10000 ELSE 0 END AS c
        |  FROM orders b LEFT JOIN ch USING (o_orderkey)
        |  WHERE ch.op IS NULL OR ch.op <> 'D')
        |SELECT o_orderstatus, count(*) AS n_orders,
        |  sum(c)::BIGINT AS total_cents
        |FROM merged GROUP BY 1""".stripMargin,
    "wh_forget" ->
      """WITH ranked AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |forget AS (
        |  SELECT user_id FROM ranked WHERE rn = 1 AND event_type = 'error')
        |SELECT e.event_type,
        |  count(*) FILTER (WHERE f.user_id IS NULL) AS kept_events,
        |  count(*) FILTER (WHERE f.user_id IS NOT NULL) AS purged_events,
        |  count(DISTINCT CASE WHEN f.user_id IS NOT NULL
        |                      THEN e.user_id END) AS purged_users
        |FROM events e LEFT JOIN forget f ON e.user_id = f.user_id
        |GROUP BY e.event_type""".stripMargin,
    "wh_scd2" ->
      """WITH h AS (
        |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
        |    lag(o_orderstatus) OVER w AS prev_status
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_orderdate, o_orderkey)),
        |c AS (
        |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
        |  FROM h
        |  WHERE prev_status IS NULL OR prev_status <> o_orderstatus)
        |SELECT o_custkey,
        |  row_number() OVER w AS version,
        |  o_orderstatus AS status,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  coalesce(strftime(lead(o_orderdate) OVER w, '%Y-%m-%d %H:%M:%S'),
        |    '9999-12-31 00:00:00') AS valid_to
        |FROM c
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "wh_cdc_apply" ->
      """WITH ch AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 10 = 3 THEN 'D' ELSE 'U' END AS op,
        |    o_totalprice + 100.0 AS new_price
        |  FROM orders
        |  WHERE o_orderkey % 10 <= 3)
        |SELECT b.o_orderkey, b.o_orderstatus,
        |  round(CASE WHEN ch.op = 'U' THEN ch.new_price
        |             ELSE b.o_totalprice END, 2) AS o_totalprice,
        |  b.o_orderpriority,
        |  strftime(b.o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate
        |FROM orders b LEFT JOIN ch ON ch.o_orderkey = b.o_orderkey
        |WHERE ch.op IS NULL OR ch.op <> 'D'""".stripMargin,
    // compaction is correct iff invisible: the identical aggregate off
    // the ORIGINAL events parquet
    "wh_compact" ->
      """SELECT event_type, count(*) AS n,
        |  round(sum(value), 2) AS sum_value,
        |  sum(user_id)::BIGINT AS sum_user,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts
        |FROM events GROUP BY 1""".stripMargin,
    // the same three-version full-image changelog, folded by
    // latest-op-wins at version <= 2
    "wh_snapshot_asof" ->
      """WITH log AS (
        |  SELECT o_orderkey, 0 AS version, 'I' AS op, o_orderstatus,
        |    o_totalprice, o_orderpriority, o_orderdate
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 1,
        |    CASE WHEN o_orderkey % 10 = 3 THEN 'D' ELSE 'U' END,
        |    o_orderstatus, o_totalprice + 100.0, o_orderpriority,
        |    o_orderdate
        |  FROM orders WHERE o_orderkey % 10 <= 3
        |  UNION ALL
        |  SELECT o_orderkey, 2,
        |    CASE WHEN o_orderkey % 10 = 4 THEN 'D'
        |         WHEN o_orderkey % 10 = 3 THEN 'I' ELSE 'U' END,
        |    o_orderstatus,
        |    CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice
        |         ELSE o_totalprice + 150.0 END,
        |    o_orderpriority, o_orderdate
        |  FROM orders
        |  WHERE o_orderkey % 10 <= 1 OR o_orderkey % 10 IN (3, 4)),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |    ORDER BY version DESC) AS rn
        |  FROM log WHERE version <= 2)
        |SELECT o_orderkey, o_orderstatus,
        |  round(o_totalprice, 2) AS o_totalprice, o_orderpriority,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate
        |FROM r WHERE rn = 1 AND op <> 'D'""".stripMargin
  )
}
