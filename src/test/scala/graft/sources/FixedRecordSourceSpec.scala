package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tera.{TeraGen, TeraIO}

class FixedRecordSourceSpec extends SparkSpec {
  import spark.implicits._

  private def withDir(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dsv2").toString
    try f(dir) finally TeraIO.delete(spark, dir)
  }

  test("DSv2 source reads back TeraOutputFormat records exactly") {
    withDir { dir =>
      val out = s"$dir/records"
      val n = 5000
      TeraIO.write(TeraGen.records(spark, n, numPartitions = 4).rdd, out)

      val df = spark.read.format("graft-fixed").load(out)
      assert(df.count() == n)
      // bit-exact vs the Hadoop input format path
      val viaHadoop = TeraIO.read(spark, out)
        .map { case (k, v) => (k.toSeq, v.toSeq) }.collect().toSet
      val viaDsv2 = df.as[(Array[Byte], Array[Byte])]
        .collect().map { case (k, v) => (k.toSeq, v.toSeq) }.toSet
      assert(viaDsv2 == viaHadoop)
    }
  }

  test("column pruning reaches the DSv2 reader") {
    withDir { dir =>
      val out = s"$dir/records"
      TeraIO.write(TeraGen.records(spark, 1000, numPartitions = 2).rdd, out)
      val keysOnly = spark.read.format("graft-fixed").load(out).select("key")
      keysOnly.collect()
      val scanDesc = keysOnly.queryExecution.executedPlan.toString
      assert(scanDesc.contains("cols=key"), s"pruning missing in:\n$scanDesc")
      assert(!scanDesc.contains("cols=key,value"))
      assert(keysOnly.distinct().count() == 1000)
    }
  }

  test("DSv2 write + read round-trips without the Hadoop path") {
    withDir { dir =>
      val out = s"$dir/dsv2w"
      val recs = TeraGen.records(spark, 3000, numPartitions = 3)
        .toDF("key", "value")
      recs.write.format("graft-fixed").mode("append").save(out)
      val back = spark.read.format("graft-fixed").load(out)
      assert(back.count() == 3000)
      val a = recs.as[(Array[Byte], Array[Byte])]
        .collect().map { case (k, v) => (k.toSeq, v.toSeq) }.toSet
      val b = back.as[(Array[Byte], Array[Byte])]
        .collect().map { case (k, v) => (k.toSeq, v.toSeq) }.toSet
      assert(a == b)
      // and the Hadoop-format reader agrees on the bytes
      val viaHadoop = TeraIO.read(spark, out)
        .map { case (k, v) => (k.toSeq, v.toSeq) }.collect().toSet
      assert(viaHadoop == a)
    }
  }

  test("failed DSv2 write publishes nothing (job-level commit)") {
    withDir { dir =>
      val out = s"$dir/atomic"
      // partition 0 succeeds, partition 2 throws mid-write — without
      // job-level staging the committed task's part file would be
      // visible despite the job failing
      val boom = udf { (k: Array[Byte], pid: Int) =>
        if (pid == 2) throw new RuntimeException("synthetic task failure")
        k
      }
      val recs = TeraGen.records(spark, 3000, numPartitions = 3)
        .toDF("key", "value")
        .withColumn("key", boom(col("key"), spark_partition_id()))
      intercept[Exception] {
        recs.write.format("graft-fixed").mode("append").save(out)
      }
      val visible = new java.io.File(out).listFiles()
      assert(visible == null || visible.forall(f =>
          f.getName.startsWith(".") || f.getName.startsWith("_")),
        s"partial output visible: ${Option(visible).toSeq.flatten.mkString(",")}")

      // a retried write then produces exactly one clean copy
      TeraGen.records(spark, 3000, numPartitions = 3).toDF("key", "value")
        .write.format("graft-fixed").mode("append").save(out)
      val back = spark.read.format("graft-fixed").load(out)
      assert(back.count() == 3000)
      // and the successful job removed its staging directory
      assert(!new java.io.File(out).listFiles()
        .exists(_.getName.startsWith(".staging-")))
    }
  }

  test("global COUNT(*) pushes down to the metadata-only scan; filters block it") {
    withDir { dir =>
      val out = s"$dir/records"
      TeraIO.write(TeraGen.records(spark, 3000, numPartitions = 3).rdd, out)
      val df = spark.read.format("graft-fixed").load(out)

      val pushed = df.agg(count(lit(1)).as("n"))
      assert(pushed.as[Long].head() == 3000L)
      val plan = pushed.queryExecution.executedPlan.toString
      assert(plan.contains("metadata-only pushdown"), s"no pushdown in:\n$plan")
      assert(!plan.toLowerCase.contains("hashaggregate"),
        s"complete pushdown must not re-aggregate:\n$plan")

      // a filter means rows must actually be read — the pushdown must
      // NOT fire and the answer must still be exact
      val filtered = df.filter(length(col("key")) === 10).agg(count(lit(1)).as("n"))
      assert(filtered.as[Long].head() == 3000L)
      val fplan = filtered.queryExecution.executedPlan.toString
      assert(!fplan.contains("metadata-only pushdown"), s"unexpected pushdown:\n$fplan")

      // count of a COLUMN (null-sensitive) is not the CountStar shape
      val colCount = df.agg(count(col("key")).as("n"))
      assert(colCount.as[Long].head() == 3000L)
    }
  }

  test("reported statistics make a small fixed table auto-broadcast") {
    withDir { dir =>
      val out = s"$dir/records"
      TeraIO.write(TeraGen.records(spark, 1000, numPartitions = 1).rdd, out)
      val fixed = spark.read.format("graft-fixed").load(out) // 100 KB
      // exact stats surface to the optimizer
      val stats = fixed.queryExecution.optimizedPlan.stats
      assert(stats.sizeInBytes == BigInt(100000), stats.toString)
      assert(stats.rowCount.contains(BigInt(1000)), stats.toString)
      // and drive join planning: the probe side is RDD-backed (unknown,
      // assumed-huge stats); no hint, yet the fixed side broadcasts
      val keyRdd = TeraIO.read(spark, out).map(_._1)
      val other = spark.createDataset(keyRdd)(
          org.apache.spark.sql.Encoders.BINARY)
        .toDF("key").crossJoin(spark.range(0, 50))
      val joined = other.join(fixed, "key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
        s"expected auto-broadcast of the 100 KB side:\n$plan")
      assert(joined.count() == 50000)
    }
  }

  test("splitSize fans a single file out to multiple partitions") {
    withDir { dir =>
      val out = s"$dir/records"
      TeraIO.write(TeraGen.records(spark, 2000, numPartitions = 1).rdd, out)
      val df = spark.read.format("graft-fixed")
        .option("splitSize", 10000) // 100 records per split
        .load(out)
      assert(df.rdd.getNumPartitions == 20)
      assert(df.count() == 2000)
      // record-misaligned splitSize still yields whole records
      val odd = spark.read.format("graft-fixed")
        .option("splitSize", 9999)
        .load(out)
      assert(odd.count() == 2000)
      assert(odd.select(length(col("key"))).distinct().as[Int].collect().toSeq == Seq(10))
    }
  }
}
