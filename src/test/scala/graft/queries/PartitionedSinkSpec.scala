package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partitioned parquet sink + partition-pruned scan — the 100 TB layout
  * contract: data lands hive-partitioned on a low-cardinality key, and a
  * query filtering on that key must show the filter in PartitionFilters
  * (directory-level pruning), not as a post-scan row filter.
  */
class PartitionedSinkSpec extends SparkSpec {

  test("hive-partitioned write prunes partitions at read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    try {
      graft.Tables.lineitem(spark, sfDir)
        .withColumn("rf", col("l_returnflag"))
        .write.partitionBy("rf").mode("overwrite").parquet(dir)

      val all = spark.read.parquet(dir)
      val pruned = all.filter(col("rf") === "R")
      pruned.collect()
      val scan = pruned.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters: [isnotnull(rf"),
        s"partition filter missing:\n$scan")
      // the pruning filter must not degrade to a data filter
      assert(!scan.contains("PushedFilters: [IsNotNull(rf)"))

      val expected = graft.Tables.lineitem(spark, sfDir)
        .filter(col("l_returnflag") === "R").count()
      assert(pruned.count() == expected)

      // dynamic overwrite of ONE partition leaves the others intact
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        graft.Tables.lineitem(spark, sfDir).limit(10)
          .withColumn("rf", lit("R"))
          .write.partitionBy("rf").mode("overwrite").parquet(dir)
      } finally {
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      val after = spark.read.parquet(dir)
      assert(after.filter(col("rf") === "R").count() == 10)
      assert(after.filter(col("rf") =!= "R").count() ==
        graft.Tables.lineitem(spark, sfDir)
          .filter(col("l_returnflag") =!= "R").count())
    } finally {
      graft.tera.TeraIO.delete(spark, dir)
    }
  }
}
