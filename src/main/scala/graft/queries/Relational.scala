package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational parity layer (SURVEY.md §2.4): the standard dataflow
  * categories — filter/project, joins, aggregation, window, sort/limit,
  * set ops — expressed declaratively on DataFrames so Catalyst plans them
  * (pushdown, pruning, broadcast selection, AQE all apply).
  *
  * In the reference these capabilities live inside user map/combine/reduce
  * UDFs (there is no relational algebra — see
  * reference src/panda/PandaMapReduceJob.cpp:885-955 for the fixed
  * pipeline); here each is a declarative plan.
  *
  * Scale notes (100 TB): every query below is shuffle-minimal —
  * aggregations are partial+final (map-side combine), dimension joins are
  * broadcast, fact-fact joins shuffle on the join key only, and no query
  * collects unbounded data to the driver.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: partial agg on 6 groups — the
    * map-side combiner collapses 100 TB of lineitem to a handful of rows
    * before the single shuffle (reference analog: combiner stage,
    * src/PandaLib.cu:302-379).
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_discount")), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1PricingSummary _
  )

  val oracles: Map[String, String] = Map(
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
        |GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
