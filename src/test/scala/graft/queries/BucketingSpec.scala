package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bucketing = the 100 TB answer to repeated fact-fact joins: both sides
  * pre-partitioned and sorted on the join key at write time, so the join
  * plans with NO Exchange on either side (shuffle paid once at layout
  * time, not per query).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join plans without any shuffle") {
    val n = 8
    Tables.orders(spark, sfDir).write
      .bucketBy(n, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_bucketed")
    Tables.customer(spark, sfDir).write
      .bucketBy(n, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_bucketed")

    val joined = spark.sql(
      """SELECT /*+ MERGE(o) */ c_custkey, count(o_orderkey) AS n
        |FROM customer_bucketed c JOIN orders_bucketed o
        |  ON c.c_custkey = o.o_custkey
        |GROUP BY c_custkey""".stripMargin)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), "bucketed join must not shuffle:\n" + plan)
    // result parity with the plain join
    val expect = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey"))
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
  }
}
