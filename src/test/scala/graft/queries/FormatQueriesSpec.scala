package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The oracle-checked format round trips (FormatQueries): each must be
  * INVISIBLE to its aggregate — the read-back result equals the same
  * aggregate computed directly from parquet — and the partitioned
  * variant must actually prune at the directory level.
  */
class FormatQueriesSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case d: java.math.BigDecimal => d.toString
      case x => x
    }.toIndexedSeq).toIndexedSeq.sortBy(_.mkString("|"))

  test("csv round trip is invisible to the q1-style aggregate") {
    val direct = graft.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        sum(col("l_orderkey")).as("sum_okey"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd HH:mm:ss")
          .as("max_ship"))
    assert(rows(FormatQueries.csvRoundTrip(spark, sfDir)) == rows(direct))
  }

  test("json round trip preserves the embedded JSON props string") {
    val direct = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("sum_value"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("max_ts"))
    assert(rows(FormatQueries.jsonRoundTrip(spark, sfDir)) == rows(direct))
  }

  test("orc round trip is bit-invisible to the rollup") {
    val direct = graft.Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"),
        sum(col("o_orderkey")).as("sum_okey"))
    assert(rows(FormatQueries.orcRoundTrip(spark, sfDir)) == rows(direct))
  }

  test("fixed-record DSv2 round trip is invisible to the aggregate") {
    val direct = graft.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_orderkey")).as("sum_okey"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
    assert(rows(FormatQueries.fixedRoundTrip(spark, sfDir)) == rows(direct))
  }

  test("partitioned read-back prunes to the filtered status directory") {
    val q = FormatQueries.partitionedPrune(spark, sfDir)
    val direct = graft.Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === lit("F"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss")
          .as("max_date"))
    assert(rows(q) == rows(direct))
    // plan shape: the status filter must be a PartitionFilter (directory
    // pruning), not a post-scan data filter on a read-back column
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"partition filter missing:\n$plan")
    assert(!plan.contains("PushedFilters: [IsNotNull(o_orderstatus)"),
      "status filter degraded to a data-file filter")
  }

  test("schemaEvolution: mergeSchema read reconciles pre-evolution files to NULL priority") {
    val out = FormatQueries.schemaEvolution(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val o = graft.Tables.orders(spark, sfDir)
    val nEven = o.filter(org.apache.spark.sql.functions
      .col("o_orderkey") % 2 === 0).count()
    assert(out("<pre-evolution>") == nEven)
    assert(out.values.sum == o.count())
    // every non-sentinel group is a real priority value from gen-2 rows
    assert(out.keys.filter(_ != "<pre-evolution>").forall(_.nonEmpty))
  }

  test("malformedCsv quarantines exactly the injected rows, losing none") {
    val out = FormatQueries.malformedCsv(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val o = graft.Tables.orders(spark, sfDir)
    val all = o.count()
    val bad = o.filter(org.apache.spark.sql.functions
      .col("o_orderkey") % 10 === 0).count()
    val q = out.find(_._1 == "<quarantined>").get
    assert(q._2 == bad)
    assert(out.map(_._2).sum == all)
    // the corrupt rows' keys were recovered from the quarantined text
    val badKeySum = o.filter(org.apache.spark.sql.functions
        .col("o_orderkey") % 10 === 0)
      .agg(org.apache.spark.sql.functions.sum("o_orderkey"))
      .head().getLong(0)
    assert(q._3 == badKeySum)
  }
}
