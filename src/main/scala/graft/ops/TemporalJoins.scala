package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal join operators Spark lacks natively (SURVEY.md §2.5 "custom
  * operators" track): as-of join and bounded range join, both built as
  * single-shuffle plans.
  *
  *  - [[asofJoin]]: the union+ordered-window formulation — tag both
  *    inputs, union, one shuffle+sort on (key, ts), then
  *    `last(right_payload, ignoreNulls)` over an unbounded-preceding
  *    window carries the latest right row forward to every left row.
  *    Linear in input size, no range blow-up, and AQE-friendly; this is
  *    how production engines (Flink temporal join, kdb aj) scale as-of
  *    at billions of rows, versus the O(n·m) inequality-join a naive
  *    translation would run.
  *  - [[rangeJoinBucketed]]: bounded-interval join (right.ts in
  *    (left.ts, left.ts + W]) via time bucketing — each left row probes
  *    exactly two W-wide buckets, turning the inequality join into an
  *    equi-join on (key, bucket) + an exact residual filter. Candidate
  *    fan-out is bounded by bucket occupancy, not corpus size.
  */
object TemporalJoins {

  /** As-of join: for each left row, the single latest right row with the
    * same key and `right.ts <= left.ts` (inclusive; at equal ts the right
    * row wins by ordering side=0 < side=1). Left rows with no prior right
    * row keep nulls — ASOF LEFT JOIN semantics.
    *
    * @param left      probe side: (key, ts, leftPayload...)
    * @param right     build side: (key, ts, rightPayload...)
    * @param rightCols right payload columns carried to the output
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.filterNot(c => c == key || c == ts)
    val rPayload = struct(rightCols.map(col): _*)
    val l = left.select(
      Seq(col(key), col(ts), lit(1).as("__side"),
        lit(null).cast(right.select(rPayload).schema.head.dataType).as("__r")) ++
        leftCols.map(col): _*)
    val r = right.select(
      Seq(col(key), col(ts), lit(0).as("__side"), rPayload.as("__r")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // __r in the ordering breaks ties among right rows sharing (key, ts)
    // deterministically (max payload struct wins); left rows sort after
    // all same-ts right rows via __side regardless of their null __r
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    joined.select(
      Seq(col(key), col(ts)) ++ leftCols.map(col) ++
        rightCols.map(c => col("__asof").getField(c).as(c)): _*)
  }

  /** Bounded range join: aggregate right rows with the same key and
    * `right.ts` in `(left.ts, left.ts + windowMicros]` per left row.
    * Left rows explode into two adjacent W-buckets (floor(ts/W),
    * floor(ts/W)+1 — the only buckets a qualifying right row can occupy);
    * right rows keep their single bucket; the equi-join on (key, bucket)
    * plus the exact residual filter reproduces the inequality join with
    * one hash shuffle.
    */
  def rangeJoinBucketed(left: DataFrame, right: DataFrame, key: String,
      ts: String, windowMicros: Long, leftId: String,
      aggs: Seq[Column]): DataFrame = {
    val lus = unix_micros(col(ts))
    val l = left.select(col(key), col(leftId), lus.as("__lus"),
        explode(array(floor(lus / windowMicros),
          floor(lus / windowMicros) + 1)).as("__bucket"))
    val rus = unix_micros(col(ts))
    val r = right.select(col(key).as("__rkey"), rus.as("__rus"),
        floor(rus / windowMicros).as("__bucket"),
        struct(right.columns.map(col): _*).as("__row"))
    // left-outer keeps zero-match left rows; a right row's bucket matches
    // exactly one of the left row's two exploded buckets, so no dedup
    val inRange = col("__rus") > col("__lus") &&
      col("__rus") <= col("__lus") + windowMicros
    l.join(r, col(key) === col("__rkey") && l("__bucket") === r("__bucket"),
        "left_outer")
      .withColumn("__m", when(inRange, col("__row")))
      .groupBy(col(key), col(leftId))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Driver query: each click joined as-of to the user's latest prior
    * purchase (event_id/value/gap in whole seconds; nulls where the user
    * has not purchased yet).
    */
  def asofClickPurchase(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).cache()
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    asofJoin(clicks, purchases, "user_id", "ts",
        Seq("purchase_id", "purchase_value"))
      .select(col("event_id"), col("user_id"), col("ts"), col("purchase_id"),
        round(col("purchase_value"), 2).as("purchase_value"))
  }

  /** Driver query: activity burst after each signup — count and value sum
    * of the user's events within the next 10 minutes.
    */
  def rangeSignupActivity(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).cache()
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id"))
    rangeJoinBucketed(signups, ev, "user_id", "ts",
        windowMicros = 10L * 60 * 1000000, leftId = "event_id",
        aggs = Seq(
          count(col("__m")).as("n_events"),
          round(sum(col("__m").getField("value")), 2).as("sum_value")))
      .select(col("event_id"), col("user_id"), col("n_events"),
        col("sum_value"))
  }

  /** Same query through the custom sort-merge [[graft.plans.AsofJoin]]
    * physical operator (one merge pass per co-partition instead of
    * union+window) — registered separately so the correctness gate
    * hash-checks both formulations against the same DuckDB ASOF oracle.
    */
  def asofExecClickPurchase(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).cache()
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    graft.plans.AsofJoin(clicks, purchases, "user_id", "ts",
        Seq("purchase_id", "purchase_value"))
      .select(col("event_id"), col("user_id"), col("ts"), col("purchase_id"),
        round(col("purchase_value"), 2).as("purchase_value"))
  }

  /** NEAREST as-of join (pandas merge_asof direction='nearest' with a
    * tolerance): for each left row, the single right row with the same
    * key minimizing |Δts|, searched within ±tolerance; ties prefer the
    * BACKWARD match (the as-of convention), then the smaller right
    * payload. Candidates come from time bucketing like
    * [[rangeJoinBucketed]] — with bucket width = tolerance every
    * qualifying right row lives in one of the left row's THREE
    * consecutive buckets, so the inequality join is an equi-join on
    * (key, bucket) + an exact |Δ| filter + one per-left-row argmin
    * window. Fan-out bounded by bucket occupancy; one hash shuffle.
    */
  def asofNearest(left: DataFrame, right: DataFrame, key: String,
      ts: String, tolMicros: Long, leftId: String,
      rightCols: Seq[String]): DataFrame = {
    val lus = unix_micros(col(ts))
    val lb = floor(lus / tolMicros)
    val lex = left.select(col(key), col(leftId), lus.as("__lus"),
      explode(array(lb - 1, lb, lb + 1)).as("__bucket"))
    val rus = unix_micros(col(ts))
    val r = right.select(col(key).as("__rkey"), rus.as("__rus"),
      floor(rus / tolMicros).as("__bucket"),
      struct(rightCols.map(col): _*).as("__row"))
    // a qualifying right row's bucket is exactly one of the left row's
    // three exploded buckets — no duplicate candidates, no dedup
    val cand = lex.join(r,
        col(key) === col("__rkey") && lex("__bucket") === r("__bucket"))
      .filter(abs(col("__rus") - col("__lus")) <= tolMicros)
      .select(col(leftId).as("__lid"),
        abs(col("__rus") - col("__lus")).as("__ad"),
        when(col("__rus") > col("__lus"), 1).otherwise(0).as("__fwd"),
        (col("__lus") - col("__rus")).as("__gap"), col("__row"))
    val w = Window.partitionBy(col("__lid"))
      .orderBy(col("__ad"), col("__fwd"), col("__row"))
    val best = cand.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__lid"), col("__gap"), col("__row"))
    left.join(best, col(leftId) === col("__lid"), "left_outer")
      .select(
        left.columns.map(col) ++ Seq(col("__gap").as("gap_us")) ++
          rightCols.map(c => col("__row").getField(c).as(c)): _*)
  }

  val NearestTolMicros: Long = 3600L * 1000000L // ±1 hour

  /** Driver query: each click matched to the NEAREST purchase within
    * ±1 h (backward wins ties), with the signed gap in micros.
    */
  def asofNearestClickPurchase(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).cache()
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"),
        round(col("value"), 2).as("purchase_value"))
    asofNearest(clicks, purchases, "user_id", "ts", NearestTolMicros,
        "event_id", Seq("purchase_id", "purchase_value"))
      .select(col("event_id"), col("user_id"), col("ts"), col("gap_us"),
        col("purchase_id"), col("purchase_value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_click_purchase" -> (asofClickPurchase _),
    "asof_exec_click_purchase" -> (asofExecClickPurchase _),
    "asof_nearest" -> (asofNearestClickPurchase _),
    "range_signup_activity" -> (rangeSignupActivity _)
  )

  private val asofOracle =
    """WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
      |p AS (SELECT * FROM events WHERE event_type = 'purchase')
      |SELECT c.event_id, c.user_id, c.ts,
      |  p.event_id AS purchase_id, round(p.value, 2) AS purchase_value
      |FROM c ASOF LEFT JOIN p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin

  val oracles: Map[String, String] = Map(
    // candidates within ±1 h, per-click argmin on (|Δ|, fwd-flag,
    // payload) — backward wins ties, then smaller purchase_id
    "asof_nearest" ->
      """WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
        |p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |cand AS (
        |  SELECT c.event_id, p.event_id AS purchase_id,
        |    round(p.value, 2) AS purchase_value,
        |    abs(epoch_us(c.ts) - epoch_us(p.ts)) AS ad,
        |    (CASE WHEN p.ts > c.ts THEN 1 ELSE 0 END) AS fwd,
        |    (epoch_us(c.ts) - epoch_us(p.ts)) AS gap_us
        |  FROM c JOIN p ON p.user_id = c.user_id
        |    AND p.ts >= c.ts - INTERVAL 1 HOUR
        |    AND p.ts <= c.ts + INTERVAL 1 HOUR),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_id
        |    ORDER BY ad, fwd, purchase_id, purchase_value) AS rn
        |  FROM cand)
        |SELECT c.event_id, c.user_id, c.ts, b.gap_us,
        |  b.purchase_id, b.purchase_value
        |FROM c LEFT JOIN (SELECT * FROM rk WHERE rn = 1) b
        |  ON b.event_id = c.event_id""".stripMargin,
    "asof_exec_click_purchase" -> asofOracle,
    "asof_click_purchase" ->
      """WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
        |p AS (SELECT * FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.ts,
        |  p.event_id AS purchase_id, round(p.value, 2) AS purchase_value
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,
    "range_signup_activity" ->
      """WITH s AS (SELECT * FROM events WHERE event_type = 'signup')
        |SELECT s.event_id, s.user_id,
        |  count(e.event_id) AS n_events,
        |  round(sum(e.value), 2) AS sum_value
        |FROM s LEFT JOIN events e
        |  ON e.user_id = s.user_id
        |  AND e.ts > s.ts AND e.ts <= s.ts + INTERVAL 10 MINUTE
        |GROUP BY s.event_id, s.user_id""".stripMargin
  )
}
