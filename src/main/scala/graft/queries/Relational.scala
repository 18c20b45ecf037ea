package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational parity layer (SURVEY.md §2.4): the standard dataflow
  * categories — filter/project, joins (inner/outer/semi/anti/broadcast),
  * aggregation (partial+final, distinct, rollup, having), window, sort /
  * top-k, set ops, scalar functions, subqueries — expressed declaratively
  * on DataFrames so Catalyst plans them (pushdown, pruning, broadcast
  * selection, AQE all apply).
  *
  * In the reference these capabilities live inside user map/combine/reduce
  * UDFs (there is no relational algebra — the pipeline is fixed, reference
  * `src/panda/PandaMapReduceJob.cpp:885-955`); here each is a declarative
  * plan.
  *
  * Scale notes (100 TB): aggregations are partial+final (map-side
  * combine); dimension joins (nation/region/supplier/customer) are
  * explicitly `broadcast()`; fact-fact joins shuffle on the join key only;
  * top-k uses `limit` pushed into a TakeOrdered physical op (per-partition
  * heaps, no global sort); nothing collects unbounded data on the driver.
  * Money aggregates are rounded to 2 decimals so results are stable across
  * summation orders.
  */
object Relational {

  private def money(c: Column): Column = round(c, 2)

  /** TPC-H Q1-style pricing summary: 6 groups — the map-side combiner
    * collapses everything before the single shuffle (reference analog:
    * combiner stage, `src/PandaLib.cu:302-379`).
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        money(sum(col("l_quantity"))).as("sum_qty"),
        money(sum(col("l_extendedprice"))).as("sum_base_price"),
        money(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("sum_disc_price"),
        money(avg(col("l_quantity"))).as("avg_qty"),
        money(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Projection + filter: both reach the parquet scan (PushedFilters /
    * ReadSchema prove it in `.explain`). Dates surface as strings for
    * oracle stability.
    */
  def q2FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 280000.0)
      .select(
        col("o_orderkey"),
        money(col("o_totalprice")).as("total"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))

  /** Fact-fact-dim join + agg: lineitem ⋈ orders shuffles on the order
    * key; customer joins after aggregation would be better still, but the
    * segment is needed as a group key, so customer is joined pre-agg —
    * Catalyst broadcasts it under AQE at bench scale.
    */
  def q3SegmentRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        money(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue"),
        count(lit(1)).as("n_items"))

  /** Dim-chain broadcast join: supplier ⋈ nation ⋈ region — both dims are
    * tiny and explicitly broadcast: zero shuffles for the join itself.
    */
  def q4SupplierByRegion(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        money(sum(col("s_acctbal"))).as("sum_acctbal"))

  /** Left-semi join (EXISTS): customers holding at least one open order. */
  def q5SemiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(
        Tables.orders(s, dir).filter(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  /** Left-anti join (NOT EXISTS): customers with no pending orders. */
  def q6AntiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Left-outer join preserving customers with zero orders, counting only
    * matched rows (count over the join key, not *).
    */
  def q7OuterJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        money(coalesce(sum(col("o_totalprice")), lit(0.0))).as("total_spent"))

  /** Window function: top-3 orders per customer by price (row_number with
    * a unique tiebreak so the result is deterministic). Partition-local
    * sort after one hash shuffle on the partition key.
    */
  def q8WindowTopPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        money(col("o_totalprice")).as("total"), col("rn"))
  }

  /** Global top-k: orderBy + limit plans as TakeOrderedAndProject —
    * per-partition heaps of k, no total sort, no full shuffle.
    */
  def q9TopK(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
      .select(col("o_orderkey"), money(col("o_totalprice")).as("total"))

  /** Distinct (dedup on grouping cols — shuffle on the pair only). */
  def q10Distinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()

  /** Set ops: nations having customers vs nations having suppliers. */
  def q11SetOps(s: SparkSession, dir: String): DataFrame = {
    val custNations = Tables.customer(s, dir)
      .select(col("c_nationkey").as("nationkey")).distinct()
    val suppNations = Tables.supplier(s, dir)
      .select(col("s_nationkey").as("nationkey")).distinct()
    custNations.intersect(suppNations)
      .withColumn("relation", lit("both"))
      .unionAll(custNations.except(suppNations)
        .withColumn("relation", lit("customers_only")))
  }

  /** Rollup: subtotals + grand total; null grouping keys surface as
    * "(all)" for oracle stability.
    */
  def q12Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(money(sum(col("l_quantity"))).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("sum_qty"), col("n"))

  /** Scalar-function bouquet: date parts, string ops, conditional logic —
    * all codegen'd builtins (reference analog: the hand-written scalar
    * code inside map UDFs, e.g. `wc_main.cpp:49-50`).
    */
  def q13Scalars(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        upper(substring(col("o_orderpriority"), 1, 1)).as("prio_initial"),
        when(col("o_totalprice") > 200000.0, "high")
          .when(col("o_totalprice") > 100000.0, "mid")
          .otherwise("low").as("price_band"),
        length(col("o_orderstatus")).as("status_len"))
      .filter(col("o_orderkey") % 100 === 0)

  /** Aggregate + HAVING: years with enough high-value orders. */
  def q14Having(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_totalprice") > 150000.0)
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(count(lit(1)).as("n"), money(avg(col("o_totalprice"))).as("avg_price"))
      .filter(col("n") > 50)

  /** Scalar subquery: orders above the global average price. Planned as
    * an agg broadcast into the filter — one pass + one tiny exchange.
    */
  def q15AboveAverage(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val avgPrice = orders.agg(avg(col("o_totalprice")).as("ap"))
    orders.join(broadcast(avgPrice))
      .filter(col("o_totalprice") > col("ap") * 1.5)
      .select(col("o_orderkey"), money(col("o_totalprice")).as("total"))
  }

  /** Cube: all grouping-set combinations over two dimensions. */
  def q17Cube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), money(sum(col("o_totalprice"))).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("n"), col("total"))

  /** Exact discrete percentiles per group, rank-selected with pure
    * integer arithmetic (k = ceil(q*n) via (n*q+99)/100) so the result is
    * an actual data value — interpolated percentiles differ between
    * engines in the last ulp and flip rounding boundaries.
    */
  def q18Percentiles(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
    val wAll = Window.partitionBy(col("l_returnflag"))
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy(col("l_returnflag"))
      .agg(
        max(when(col("rn") === expr("(n * 50 + 99) div 100"), col("l_extendedprice"))).as("p50"),
        max(when(col("rn") === expr("(n * 95 + 99) div 100"), col("l_extendedprice"))).as("p95"),
        max(col("l_extendedprice")).as("mx"))
  }

  /** Gap-based session windows per user (`session_window`, 30-minute
    * inactivity gap) — sessions then rolled up per user. The same
    * operator drives streaming sessionization unchanged.
    */
  def q19Sessions(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"))

  /** Pivot (dynamic column spreading) — linestatus counts as columns. */
  def q20Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .withColumnRenamed("F", "n_f")
      .withColumnRenamed("O", "n_o")

  /** Semi-structured: parse the JSON props column, aggregate an extracted
    * field (the 100 TB shape: schema-on-read over string payloads, pushed
    * through codegen'd JSON paths, no UDFs).
    */
  def q21Json(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  /** Event-time bucketing over the events table: hourly counts per type
    * (the batch shape of the streaming windowed agg).
    */
  def q16EventsHourly(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), money(sum(col("value"))).as("sum_value"))

  /** Explicit GROUPING SETS (beyond rollup/cube): per (status, year),
    * per status, and grand total in one pass — Spark expands to a single
    * Expand + hash aggregate, one shuffle for all three groupings.
    */
  def q22GroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("order_year", year(col("o_orderdate")))
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("order_year")),
          Seq(col("o_orderstatus")), Seq()),
        col("o_orderstatus"), col("order_year"))
      .agg(count(lit(1)).as("n"), money(sum(col("o_totalprice"))).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("order_year"), lit(-1)).as("order_year"),
        col("n"), col("total"))

  /** Window-function bouquet in one pass: lag/lead, running frame sum,
    * ntile, percent_rank — all share one (user_id, ts) window, so Spark
    * plans a single sort+shuffle for the lot. Ordering key is unique per
    * partition (ts has no per-user dupes), making every function
    * deterministic.
    */
  def q23WindowSuite(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"), col("user_id"),
        money(lag(col("value"), 1).over(w)).as("prev_value"),
        money(lead(col("value"), 1).over(w)).as("next_value"),
        money(sum(col("value")).over(frame)).as("running_value"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"))
  }

  /** Correlated LATERAL subquery: per region, the top-2 nations by total
    * supplier balance — the "top-n related rows per driving row" shape.
    * Spark plans the correlated limit as a lateral join; at scale the
    * subquery aggregates shuffle once on nationkey, and the region table
    * is broadcast.
    */
  def q24Lateral(s: SparkSession, dir: String): DataFrame = {
    Tables.region(s, dir).createOrReplaceTempView("q24_region")
    Tables.nation(s, dir).createOrReplaceTempView("q24_nation")
    Tables.supplier(s, dir).createOrReplaceTempView("q24_supplier")
    s.sql(
      """SELECT r.r_name, l.n_name, l.bal
        |FROM q24_region r,
        |LATERAL (
        |  SELECT n_name, round(sum(s_acctbal), 2) AS bal
        |  FROM q24_nation n JOIN q24_supplier s
        |    ON s.s_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  GROUP BY n_name
        |  ORDER BY bal DESC, n_name
        |  LIMIT 2) l""".stripMargin)
  }

  /** Correlated scalar subquery per group: orders beating their own
    * customer's average by 2x. Spark decorrelates this into an aggregate
    * + join — asserting the oracle keeps the rewrite honest.
    */
  def q25Correlated(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("q25_orders")
    // compare ROUNDED values: the raw double avg differs between engines
    // in the last ulp (accumulation order), and an order sitting exactly
    // at the 2x boundary would flake the oracle hash
    s.sql(
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
        |FROM q25_orders o
        |WHERE round(o_totalprice, 2) > round(2 * (
        |  SELECT avg(i.o_totalprice) FROM q25_orders i
        |  WHERE i.o_custkey = o.o_custkey), 2)""".stripMargin)
  }

  /** Complex types: per-customer sorted array of distinct order years +
    * an exploded-back count — array build (collect_set), array transform
    * (sort), and element access in one oracle-checked pass. The array is
    * serialized to a comma-joined string in the FINAL projection only:
    * the gate's row canonicalization (pandas sort) cannot hash raw array
    * cells, and a deterministic string carries identical information.
    */
  def q26ArrayAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sort_array(collect_set(year(col("o_orderdate")))).as("years_arr"))
      .select(col("o_custkey"),
        array_join(col("years_arr").cast("array<string>"), ",").as("years"),
        size(col("years_arr")).as("n_years"),
        element_at(col("years_arr"), 1).as("first_year"))

  /** Temporal scalar bouquet: quarter/day extraction, date arithmetic,
    * day difference — the date dimensions an ETL layer derives at scan
    * time (all codegen'd builtins, no UDFs).
    */
  def q27Datetime(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderkey") % 97 === 0)
      .select(
        col("o_orderkey"),
        quarter(col("o_orderdate")).as("q"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_add(col("o_orderdate"), 30).as("due_date"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate"))
          .as("days_to_98"))

  /** The hot-key salted join surfaced as a gate query: lineitem joins
    * supplier through [[graft.ops.SkewJoin.saltedInnerJoin]], which
    * spreads each join key over 8 salt sub-partitions (build side
    * replicated 8x). Salting only routes rows — the join OUTPUT is
    * salt-invariant — so a plain SQL join oracles the whole mechanism;
    * this is the explicit-salt path for hot keys beyond what AQE's
    * skew-join splitting can fix (one key larger than one executor).
    */
  def q28SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_suppkey"), col("l_quantity"), col("l_extendedprice"))
    val sup = Tables.supplier(s, dir)
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    graft.ops.SkewJoin.saltedInnerJoin(li, sup, "l_suppkey", salts = 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
  }

  /** Ordered funnel (view → click → purchase) per user: each stage's
    * entry time is the first qualifying event strictly AFTER the previous
    * stage was entered — the product-analytics conversion query. Shape at
    * scale: one filtered partial-agg per stage plus equi-joins on
    * user_id; every aggregation is combinable (min), nothing is windowed
    * over the full event stream. The reference has no relational layer
    * (`src/panda/PandaMapReduceJob.cpp:885-955` is a fixed pipeline);
    * this is the declarative capability on top.
    */
  def q29Funnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    def stage(t: String) = e.filter(col("event_type") === t)
    val v = stage("view").groupBy(col("user_id"))
      .agg(min(col("ts")).as("t_view"))
    val c = stage("click").join(v, "user_id")
      .filter(col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = stage("purchase").join(c, "user_id")
      .filter(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    e.select(col("user_id")).distinct()
      .join(v, Seq("user_id"), "left_outer")
      .join(c.select(col("user_id"), col("t_click")), Seq("user_id"), "left_outer")
      .join(p.select(col("user_id"), col("t_purchase")), Seq("user_id"), "left_outer")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        (when(col("t_purchase").isNotNull, 3)
          .when(col("t_click").isNotNull, 2)
          .when(col("t_view").isNotNull, 1)
          .otherwise(0)).as("funnel_depth"))
  }

  /** Weekly cohort retention: users are cohorted by the ISO week of their
    * first event; each (cohort, week-offset) cell counts the distinct
    * users active that many weeks later. Two combinable aggregations
    * (min-ts cohorting, distinct active weeks) joined on user_id — the
    * cells themselves are tiny however large the event log is.
    */
  def q30Retention(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val cohort = e.groupBy(col("user_id"))
      .agg(to_date(date_trunc("week", min(col("ts")))).as("cohort_week"))
    val active = e
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("w"))
      .distinct()
    active.join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        expr("datediff(w, cohort_week) div 7").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_users"))
  }

  /** RANGE-frame window (value-based, not row-based): per customer, the
    * trailing-7-day order revenue — every order whose day falls in
    * [day-6, day] joins the frame, INCLUDING same-day ties, which makes
    * the result deterministic with no tiebreak column (a rows-frame
    * would be order-dependent on ties). One shuffle on the partition
    * key; the frame scan is partition-local and streaming (Spark keeps a
    * sliding aggregate, not O(frame) recompute per row).
    */
  def q31RangeWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-6, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), lit("1992-01-01").cast("date")).as("day"),
        col("o_totalprice"))
      .select(col("o_orderkey"), col("o_custkey"), col("day"),
        money(sum(col("o_totalprice")).over(w)).as("trailing_7d"),
        count(lit(1)).over(w).as("n_in_window"))
  }

  /** Recursive CTE (Spark 4's WITH RECURSIVE): bounded-depth explosion of
    * the implicit binary tree over part keys (node -> 2n, 2n+1 — a
    * deterministic DAG derived purely from the data, standing in for a
    * bill-of-materials walk). Depth-capped, so the iteration count is
    * bounded by construction; each recursion step is one equi-joinable
    * frontier expansion. DuckDB runs the identical statement.
    */
  def q32Recursive(s: SparkSession, dir: String): DataFrame = {
    Tables.part(s, dir).createOrReplaceTempView("q32_part")
    s.sql(
      """WITH RECURSIVE tree(root, node, depth) AS (
        |  SELECT p_partkey, p_partkey, 0 FROM q32_part WHERE p_partkey <= 10
        |  UNION ALL
        |  SELECT t.root, c.p_partkey, t.depth + 1
        |  FROM tree t JOIN q32_part c
        |    ON c.p_partkey IN (t.node * 2, t.node * 2 + 1)
        |  WHERE t.depth < 5)
        |SELECT t.root, count(*) AS n_nodes, max(t.depth) AS max_depth,
        |  round(sum(p.p_retailprice), 2) AS subtree_price
        |FROM tree t JOIN q32_part p ON p.p_partkey = t.node
        |GROUP BY t.root""".stripMargin)
  }

  /** Unpivot/melt (wide → long): the four lineitem measures become
    * (measure, value) rows — the inverse of q20's pivot, completing the
    * reshape pair. Spark plans unpivot as a single Expand (one pass, no
    * join of N selects); aggregation after is ordinary partial+final.
    */
  def q33Unpivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax")),
        "measure", "value")
      .groupBy(col("l_returnflag"), col("measure"))
      .agg(count(lit(1)).as("n"), money(sum(col("value"))).as("sum_value"))

  /** Full-outer join with unmatched rows on BOTH sides: high-balance
    * customers against big-ticket order aggregates — either side can
    * miss, and the coalesced keys/grand totals must survive the nulls.
    * Completes the join-flavor inventory (inner/semi/anti/left-outer/
    * full-outer/lateral/salted).
    */
  def q34FullOuter(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 9000.0)
      .select(col("c_custkey"), col("c_name"), money(col("c_acctbal")).as("bal"))
    val ord = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 350000.0)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_big_orders"),
        money(sum(col("o_totalprice"))).as("big_total"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"), col("bal"),
        coalesce(col("n_big_orders"), lit(0L)).as("n_big_orders"),
        coalesce(col("big_total"), lit(0.0)).as("big_total"))
  }

  /** Reduce-side join THROUGH THE REFERENCE'S MAPREDUCE CONTRACT: the
    * classic tagged-union join (the only join pattern the MapReduce
    * model offers — the reference has no join operator at all, §2.4) —
    * both tables map to (key, tagged record), one shuffle groups a key's
    * customer row with its order rows, and the reducer emits the joined
    * aggregate. Runs on [[graft.core.MapReduceJob]], the reference
    * contract facade (`include/PandaAPI.h:29-51`), so the gate proves
    * the MR layer can express relational work — while q7 shows the same
    * query as the declarative plan Catalyst optimizes, which is the
    * form to prefer.
    */
  def mrJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name")).as[(Long, String)]
      .rdd.map { case (k, name) => (k, Left(name): Either[String, Double]) }
    val ord = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_totalprice")).as[(Long, Double)]
      .rdd.map { case (k, price) => (k, Right(price): Either[String, Double]) }
    val joined = graft.core.MapReduceJob(cust.union(ord)) {
      kv => Iterator.single(kv)
    }.reduce[(Long, String, Long, Double)] { (k, vs) =>
      var name: String = null
      var n = 0L
      var sum = 0.0
      vs.foreach {
        case Left(nm) => name = nm
        case Right(p) => n += 1; sum += p
      }
      // customer-driven (left) semantics: orders without a customer drop
      if (name == null) Iterator.empty
      else Iterator.single((k, name, n, sum))
    }
    joined.toDF("custkey", "c_name", "n_orders", "total_spent")
      .withColumn("total_spent", money(col("total_spent")))
  }

  /** Hadoop-style SECONDARY SORT through the MR facade: key =
    * (custkey, day, orderkey), partition by custkey alone, total-order
    * the key, cut reducer runs with a grouping comparator on custkey —
    * each reducer call sees one customer's orders already date-ordered,
    * with no per-group sort buffer (the reference's sort-stage semantics,
    * `src/PandaSort.cu`, done the way Hadoop's grouping comparator
    * defines it). The declarative twin is a sorted collect_list; this
    * runs on `repartitionAndSortWithinPartitions` + run-cutting.
    */
  /** Distributed grep through the MR facade — THE canonical MapReduce
    * demo (Dean & Ghemawat §2.1 list it first): the map scans each
    * document once and emits (doc_id, match count, first offset) for
    * documents containing the literal pattern; non-matching docs emit
    * nothing, so the shuffle carries only hits. Non-overlapping match
    * semantics (advance by pattern length) to agree with regexp_count.
    */
  def mrGrep(s: SparkSession, dir: String,
      pattern: String = "spark"): DataFrame = {
    import s.implicits._
    val rows = Tables.documents(s, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)].rdd
    val out = graft.core.MapReduceJob(rows) { case (id, text) =>
      val first = text.indexOf(pattern)
      if (first < 0) Iterator.empty
      else {
        var n = 0L
        var j = first
        while (j >= 0) { n += 1; j = text.indexOf(pattern, j + pattern.length) }
        // 1-based CHARACTER position (code points, not UTF-16 units) so
        // the offset agrees with DuckDB's strpos on non-BMP text too
        Iterator.single((id, (n, text.codePointCount(0, first) + 1L)))
      }
    }.reduce[(Long, Long, Long)] { (k, vs) =>
      val v = vs.next(); Iterator.single((k, v._1, v._2))
    }
    out.toDF("doc_id", "n_matches", "first_pos")
  }

  def mrSecondarySort(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = Tables.orders(s, dir)
      .select(col("o_custkey"),
        datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
          .cast("long").as("day"),
        col("o_orderkey"))
      .as[(Long, Long, Long)].rdd
    val nParts = rows.sparkContext.defaultParallelism
    val byCust = new org.apache.spark.Partitioner {
      def numPartitions: Int = nParts
      def getPartition(key: Any): Int = {
        val k = key.asInstanceOf[(Long, Long, Long)]
        java.lang.Math.floorMod(k._1.hashCode, nParts)
      }
    }
    graft.core.MapReduceJob(rows) { case (c, d, o) =>
      Iterator.single(((c, d, o), o))
    }
      .withPartitioner(byCust)
      .withOrdering(Ordering[(Long, Long, Long)])
      .withGrouping((a, b) => a._1 == b._1)
      .reduce[(Long, String, Long)] { (k, vs) =>
        val ordered = vs.toSeq
        Iterator.single((k._1, ordered.take(3).mkString(","), ordered.size.toLong))
      }
      .toDF("custkey", "first3", "n_orders")
  }

  /** first/last/nth window values with EXPLICIT frames: per user's
    * purchase stream, the first, latest-so-far, and second event values
    * — last_value is only deterministic with a stated frame (the
    * default RANGE frame ends at the current row, a classic silent-bug
    * source this query pins on both engines).
    */
  def q35FirstLast(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        money(first(col("value")).over(w)).as("first_value"),
        money(last(col("value")).over(w)).as("running_last"),
        money(nth_value(col("value"), 2).over(w)).as("second_value"))
  }

  /** Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL): multiplicities
    * matter — a priority level appearing 3x among big orders and 2x
    * among urgent-flag orders intersects twice. Complements q11's
    * set-semantics pair; Spark plans both without materializing counts
    * driver-side.
    */
  def q36BagSetOps(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.orders(s, dir).filter(col("o_totalprice") > 250000.0)
      .select(col("o_custkey"))
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    big.intersectAll(urgent).withColumn("relation", lit("both_all"))
      .unionAll(big.exceptAll(urgent).withColumn("relation", lit("big_only_all")))
      .groupBy(col("o_custkey"), col("relation"))
      .agg(count(lit(1)).as("multiplicity"))
  }

  /** Equi-width histogram (width_bucket semantics): order totals into
    * ten 50k-wide buckets with an overflow cap — the OLAP profiling
    * primitive. Bucketing is floor arithmetic on identical doubles, so
    * bucket ids are exact cross-engine; one combinable aggregation.
    */
  def q37Histogram(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(least(floor(col("o_totalprice") / 50000.0), lit(9.0))
        .cast("int").as("bucket"), col("o_totalprice"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        money(sum(col("o_totalprice"))).as("sum_total"))

  /** Latest-record-per-key compaction (the CDC/upsert primitive: a
    * change log compacts to each key's newest row). row_number over
    * (key, recency desc) with a unique tiebreak, keep rank 1 — one
    * shuffle on the key, partition-local sort, and at scale the exact
    * shape a MERGE INTO target maintenance job runs.
    */
  def q38LatestPerKey(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("latest_order"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("latest_date"),
        money(col("o_totalprice")).as("latest_total"))
  }

  /** Gap-fill / last-observation-carried-forward (the telemetry
    * backfill primitive): every event carries the same user's most
    * recent purchase value at-or-before it, null until the first
    * purchase. `last(..., ignoreNulls)` over a running frame — one
    * shuffle on user + partition-local sort, no self-join; IGNORE NULLS
    * frame semantics pinned cross-engine.
    */
  def q39Locf(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        money(last(when(col("event_type") === "purchase", col("value")),
          ignoreNulls = true).over(w)).as("last_purchase"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_locf" -> q39Locf _,
    "q38_latest_per_key" -> q38LatestPerKey _,
    "q37_histogram" -> q37Histogram _,
    "q35_first_last" -> q35FirstLast _,
    "q36_bag_setops" -> q36BagSetOps _,
    "mr_grep" -> ((s: SparkSession, d: String) => mrGrep(s, d)),
    "mr_secondary_sort" -> mrSecondarySort _,
    "mr_join" -> mrJoin _,
    "q34_full_outer" -> q34FullOuter _,
    "q33_unpivot" -> q33Unpivot _,
    "q32_recursive" -> q32Recursive _,
    "q31_range_window" -> q31RangeWindow _,
    "q29_funnel" -> q29Funnel _,
    "q30_retention" -> q30Retention _,
    "q28_salted_join" -> q28SaltedJoin _,
    "q27_datetime" -> q27Datetime _,
    "q26_array_agg" -> q26ArrayAgg _,
    "q25_correlated" -> q25Correlated _,
    "q24_lateral" -> q24Lateral _,
    "q23_window_suite" -> q23WindowSuite _,
    "q22_grouping_sets" -> q22GroupingSets _,
    "q1_pricing_summary" -> q1PricingSummary _,
    "q2_filter_project" -> q2FilterProject _,
    "q3_segment_revenue" -> q3SegmentRevenue _,
    "q4_supplier_by_region" -> q4SupplierByRegion _,
    "q5_semi_join" -> q5SemiJoin _,
    "q6_anti_join" -> q6AntiJoin _,
    "q7_outer_join" -> q7OuterJoin _,
    "q8_window_top_per_customer" -> q8WindowTopPerCustomer _,
    "q9_topk" -> q9TopK _,
    "q10_distinct" -> q10Distinct _,
    "q11_setops" -> q11SetOps _,
    "q12_rollup" -> q12Rollup _,
    "q13_scalars" -> q13Scalars _,
    "q14_having" -> q14Having _,
    "q15_above_average" -> q15AboveAverage _,
    "q16_events_hourly" -> q16EventsHourly _,
    "q17_cube" -> q17Cube _,
    "q18_percentiles" -> q18Percentiles _,
    "q19_sessions" -> q19Sessions _,
    "q20_pivot" -> q20Pivot _,
    "q21_json" -> q21Json _
  )

  val oracles: Map[String, String] = Map(
    "q39_locf" ->
      """SELECT event_id, user_id, event_type,
        |  round(last_value(CASE WHEN event_type = 'purchase' THEN value END
        |      IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS last_purchase
        |FROM events""".stripMargin,
    "q38_latest_per_key" ->
      """SELECT o_custkey, o_orderkey AS latest_order,
        |  strftime(o_orderdate, '%Y-%m-%d') AS latest_date,
        |  round(o_totalprice, 2) AS latest_total
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |WHERE rn = 1""".stripMargin,
    "q37_histogram" ->
      """SELECT least(floor(o_totalprice / 50000.0), 9.0)::INT AS bucket,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_total
        |FROM orders GROUP BY 1""".stripMargin,
    "q35_first_last" ->
      """SELECT event_id, user_id,
        |  round(first_value(value) OVER w, 2) AS first_value,
        |  round(last_value(value) OVER w, 2) AS running_last,
        |  round(nth_value(value, 2) OVER w, 2) AS second_value
        |FROM events WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "q36_bag_setops" ->
      """WITH big AS (
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 250000.0),
        |urgent AS (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        |tagged AS (
        |  SELECT o_custkey, 'both_all' AS relation
        |  FROM (SELECT * FROM big INTERSECT ALL SELECT * FROM urgent)
        |  UNION ALL
        |  SELECT o_custkey, 'big_only_all'
        |  FROM (SELECT * FROM big EXCEPT ALL SELECT * FROM urgent))
        |SELECT o_custkey, relation, count(*) AS multiplicity
        |FROM tagged GROUP BY 1, 2""".stripMargin,
    "mr_grep" ->
      """SELECT doc_id,
        |  ((length(text) - length(replace(text, 'spark', '')))
        |    // length('spark'))::BIGINT AS n_matches,
        |  strpos(text, 'spark')::BIGINT AS first_pos
        |FROM documents WHERE text LIKE '%spark%'""".stripMargin,
    "mr_secondary_sort" ->
      """SELECT o_custkey AS custkey,
        |  array_to_string((list(o_orderkey
        |    ORDER BY (o_orderdate::DATE - DATE '1992-01-01'), o_orderkey))[1:3],
        |    ',') AS first3,
        |  count(*) AS n_orders
        |FROM orders GROUP BY 1""".stripMargin,
    "mr_join" ->
      """SELECT c_custkey AS custkey, c_name,
        |  count(o_orderkey) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY 1, 2""".stripMargin,
    "q34_full_outer" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_name, round(c_acctbal, 2) AS bal
        |  FROM customer WHERE c_acctbal > 9000.0),
        |ord AS (
        |  SELECT o_custkey, count(*) AS n_big_orders,
        |    round(sum(o_totalprice), 2) AS big_total
        |  FROM orders WHERE o_totalprice > 350000.0
        |  GROUP BY o_custkey)
        |SELECT coalesce(c_custkey, o_custkey) AS custkey, c_name, bal,
        |  coalesce(n_big_orders, 0) AS n_big_orders,
        |  coalesce(big_total, 0.0) AS big_total
        |FROM cust FULL OUTER JOIN ord ON c_custkey = o_custkey""".stripMargin,
    "q33_unpivot" ->
      """WITH m AS (
        |  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS value
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
        |SELECT l_returnflag, measure, count(*) AS n,
        |  round(sum(value), 2) AS sum_value
        |FROM m GROUP BY 1, 2""".stripMargin,
    "q32_recursive" ->
      """WITH RECURSIVE tree(root, node, depth) AS (
        |  SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey <= 10
        |  UNION ALL
        |  SELECT t.root, c.p_partkey, t.depth + 1
        |  FROM tree t JOIN part c
        |    ON c.p_partkey IN (t.node * 2, t.node * 2 + 1)
        |  WHERE t.depth < 5)
        |SELECT t.root, count(*) AS n_nodes, max(t.depth) AS max_depth,
        |  round(sum(p.p_retailprice), 2) AS subtree_price
        |FROM tree t JOIN part p ON p.p_partkey = t.node
        |GROUP BY t.root""".stripMargin,
    "q31_range_window" ->
      """SELECT o_orderkey, o_custkey,
        |  (o_orderdate::DATE - DATE '1992-01-01') AS day,
        |  round(sum(o_totalprice) OVER w, 2) AS trailing_7d,
        |  count(*) OVER w AS n_in_window
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY (o_orderdate::DATE - DATE '1992-01-01')
        |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q29_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t_click
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t_view
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t_purchase
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |  GROUP BY e.user_id)
        |SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
        |  CASE WHEN p.t_purchase IS NOT NULL THEN 3
        |       WHEN c.t_click IS NOT NULL THEN 2
        |       WHEN v.t_view IS NOT NULL THEN 1 ELSE 0 END AS funnel_depth
        |FROM (SELECT DISTINCT user_id FROM events) u
        |LEFT JOIN v ON u.user_id = v.user_id
        |LEFT JOIN c ON u.user_id = c.user_id
        |LEFT JOIN p ON u.user_id = p.user_id""".stripMargin,
    "q30_retention" ->
      """WITH cohort AS (
        |  SELECT user_id, date_trunc('week', min(ts))::DATE AS cohort_week
        |  FROM events GROUP BY user_id),
        |active AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS w
        |  FROM events)
        |SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
        |  (a.w - c.cohort_week) // 7 AS week_offset,
        |  count(*) AS n_users
        |FROM active a JOIN cohort c ON a.user_id = c.user_id
        |GROUP BY 1, 2""".stripMargin,
    "q28_salted_join" ->
      """SELECT s_nationkey, count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey""".stripMargin,
    "q27_datetime" ->
      """SELECT o_orderkey,
        |  quarter(o_orderdate)::INT AS q,
        |  day(o_orderdate)::INT AS dom,
        |  (o_orderdate + INTERVAL 30 DAY)::DATE AS due_date,
        |  date_diff('day', o_orderdate, TIMESTAMP '1998-01-01')::INT
        |    AS days_to_98
        |FROM orders WHERE o_orderkey % 97 = 0""".stripMargin,
    "q26_array_agg" ->
      """SELECT o_custkey,
        |  array_to_string(list_sort(list(DISTINCT year(o_orderdate))), ',')
        |    AS years,
        |  len(list(DISTINCT year(o_orderdate)))::INT AS n_years,
        |  min(year(o_orderdate)) AS first_year
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "q25_correlated" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
        |FROM orders o
        |WHERE round(o_totalprice, 2) > round(2 * (
        |  SELECT avg(i.o_totalprice) FROM orders i
        |  WHERE i.o_custkey = o.o_custkey), 2)""".stripMargin,
    "q24_lateral" ->
      """SELECT r.r_name, l.n_name, l.bal
        |FROM region r,
        |LATERAL (
        |  SELECT n_name, round(sum(s_acctbal), 2) AS bal
        |  FROM nation n JOIN supplier s ON s.s_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  GROUP BY n_name
        |  ORDER BY bal DESC, n_name
        |  LIMIT 2) l""".stripMargin,
    "q23_window_suite" ->
      """SELECT event_id, user_id,
        |  round(lag(value, 1) OVER w, 2) AS prev_value,
        |  round(lead(value, 1) OVER w, 2) AS next_value,
        |  round(sum(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW), 2) AS running_value,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank
        |FROM events WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts)""".stripMargin,
    "q22_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |  coalesce(year(o_orderdate), -1) AS order_year,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, year(o_orderdate)),
        |  (o_orderstatus), ())""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_discount), 2) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS total,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders
        |WHERE o_orderstatus = 'F' AND o_totalprice > 280000.0""".stripMargin,
    "q3_segment_revenue" ->
      """SELECT c_mktsegment,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q4_supplier_by_region" ->
      """SELECT r_name, count(*) AS n_suppliers,
        |  round(sum(s_acctbal), 2) AS sum_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q5_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin,
    "q6_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""".stripMargin,
    "q7_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin,
    "q8_window_top_per_customer" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin,
    "q9_topk" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS total
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q10_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q11_setops" ->
      """SELECT nationkey, 'both' AS relation FROM
        |  (SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |   INTERSECT
        |   SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
        |UNION ALL
        |SELECT nationkey, 'customers_only' AS relation FROM
        |  (SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |   EXCEPT
        |   SELECT DISTINCT s_nationkey AS nationkey FROM supplier)""".stripMargin,
    "q12_rollup" ->
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
        |  coalesce(l_linestatus, '(all)') AS linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q13_scalars" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS order_year,
        |  month(o_orderdate) AS order_month,
        |  upper(substring(o_orderpriority, 1, 1)) AS prio_initial,
        |  CASE WHEN o_totalprice > 200000.0 THEN 'high'
        |       WHEN o_totalprice > 100000.0 THEN 'mid'
        |       ELSE 'low' END AS price_band,
        |  length(o_orderstatus) AS status_len
        |FROM orders WHERE o_orderkey % 100 = 0""".stripMargin,
    "q14_having" ->
      """SELECT year(o_orderdate) AS order_year, count(*) AS n,
        |  round(avg(o_totalprice), 2) AS avg_price
        |FROM orders WHERE o_totalprice > 150000.0
        |GROUP BY year(o_orderdate) HAVING count(*) > 50""".stripMargin,
    "q15_above_average" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS total
        |FROM orders
        |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)""".stripMargin,
    "q16_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin,
    "q17_cube" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |  coalesce(o_orderpriority, '(all)') AS priority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q18_percentiles" ->
      """WITH ranked AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  max(CASE WHEN rn = (n * 50 + 99) // 100 THEN l_extendedprice END) AS p50,
        |  max(CASE WHEN rn = (n * 95 + 99) // 100 THEN l_extendedprice END) AS p95,
        |  max(l_extendedprice) AS mx
        |FROM ranked GROUP BY l_returnflag""".stripMargin,
    "q19_sessions" ->
      """WITH marked AS (
        |  SELECT user_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts))
        |SELECT user_id, sum(new_s)::BIGINT AS n_sessions,
        |  count(*) AS n_events
        |FROM marked GROUP BY user_id""".stripMargin,
    "q20_pivot" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (l_linestatus = 'F') AS n_f,
        |  count(*) FILTER (l_linestatus = 'O') AS n_o
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q21_json" ->
      """SELECT event_type,
        |  count(json_extract_string(props, '$.k')) AS n,
        |  sum((json_extract_string(props, '$.k'))::BIGINT)::BIGINT AS sum_k,
        |  min((json_extract_string(props, '$.k'))::BIGINT) AS min_k,
        |  max((json_extract_string(props, '$.k'))::BIGINT) AS max_k
        |FROM events GROUP BY event_type""".stripMargin
  )
}
