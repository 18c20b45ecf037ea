package graft.queries

import graft.SparkSpec

/** Round 9: the two scan-layout scale features — bucketed co-located
  * joins (no Exchange under the join) and dynamic partition pruning
  * (the fact scan's partition filter arrives from the dim at runtime).
  */
class BucketDppSpec extends SparkSpec {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed join subtree is exchange-free: bucket i joins bucket i " +
    "with no shuffle on either side") {
    // disable broadcast so the join is SMJ (the cluster-scale shape —
    // at 100 TB neither fact fits a broadcast); AQE off so the initial
    // physical plan is the asserted one
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val df = FormatQueries.bucketedJoin(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // the ONLY exchange in the whole query is the final aggregation's;
      // the join reads both bucketed tables shuffle-free
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 1,
        s"expected 1 shuffle (final agg only), got $exchanges:\n$plan")
      // and it sits ABOVE the join: no exchange between scans and SMJ
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(!plan.substring(joinIdx).contains("Exchange"),
        s"shuffle below the join:\n$plan")
      // value sanity at smoke scale
      assert(df.collect().map(_.getLong(1)).sum > 0)
    }
  }

  test("dpp join plants a dynamicpruning partition filter on the fact scan") {
    val df = FormatQueries.dppPrune(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$plan")
    // the dim filter keeps the 5 ASIA nations of 25 — the result can
    // never cover all nation partitions
    val kept = df.collect()
    assert(kept.nonEmpty && kept.length <= 5,
      s"expected at most the 5 ASIA nations, got ${kept.length}")
  }

  test("bucketed join and dpp join values match the direct plans") {
    import org.apache.spark.sql.functions._
    val direct = graft.Tables.orders(spark, sfDir)
      .join(graft.Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("rev"),
        sum(col("l_orderkey")).as("sum_okey"))
    val bucketed = FormatQueries.bucketedJoin(spark, sfDir)
    assert(bucketed.exceptAll(direct).isEmpty && direct.exceptAll(bucketed).isEmpty,
      "bucketed layout changed join values")
  }
}
