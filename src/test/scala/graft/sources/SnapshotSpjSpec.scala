package graft.sources

import org.apache.spark.sql.functions._

import graft.{PlanAudit, SparkSpec}

/** Storage-partitioned joins over partitioned snapshot tables: the
  * DSv2 scan reports `KeyGroupedPartitioning` from the manifest's
  * exact-value stats, so a join of two co-partitioned tables plans
  * with ZERO shuffle exchanges under
  * `spark.sql.sources.v2.bucketing.enabled` — and degrades to the
  * ordinary shuffled plan (correct either way) when the report is
  * ineligible.
  */
class SnapshotSpjSpec extends SparkSpec {

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_spj_$tag").toString + "/t"

  private def withSpjConfs[T](body: => T): T = {
    val saved = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.requireAllClusterKeysForCoPartition",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      // join keys may be a SUPERSET of the partition keys (join on
      // (bucket, k) over bucket-partitioned tables): same-bucket rows
      // are co-located, so the finer clustering is still satisfied
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("a join of two co-partitioned snapshot tables plans with ZERO " +
      "shuffle exchanges and matches the plain-join truth") {
    import spark.implicits._
    val rootA = tmpRoot("a")
    val rootB = tmpRoot("b")
    val a = (1L to 2000L).map(k => (k, k % 8, s"a$k")).toDF("k", "bucket", "va")
    val b = (1L to 2000L).filter(_ % 3 != 0).map(k => (k, k % 8, k * 2.0))
      .toDF("k", "bucket", "vb")
    SnapshotTable.commit(a, rootA, partitionBy = Seq("bucket"))
    SnapshotTable.commit(b, rootB, partitionBy = Seq("bucket"))
    withSpjConfs {
      val fa = spark.read.format("graft-snap").load(rootA)
      val fb = spark.read.format("graft-snap").load(rootB)
      val j = fa.join(fb, Seq("bucket", "k"))
      val shape = PlanAudit.executedShape(j)
      assert(shape.shuffle == 0,
        s"expected a storage-partitioned join, got $shape")
      assert(j.count() == (1L to 2000L).count(_ % 3 != 0))
      val row = j.filter(col("k") === 10L).head
      assert(row.getAs[String]("va") == "a10")
      assert(row.getAs[Double]("vb") == 20.0)
    }
    // contrast: same join without the bucketing flag shuffles both
    // sides — the report is advisory, never a correctness dependency
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j0 = spark.read.format("graft-snap").load(rootA)
        .join(spark.read.format("graft-snap").load(rootB), Seq("bucket", "k"))
      assert(PlanAudit.executedShape(j0).shuffle > 0)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("the report withdraws when purity is broken or the table is " +
      "unpartitioned — the join still answers, shuffled") {
    import spark.implicits._
    val rootC = tmpRoot("c")
    val rootD = tmpRoot("d")
    val c = (1L to 500L).map(k => (k, k % 4, k * 1.0)).toDF("k", "bucket", "v")
    SnapshotTable.commit(c, rootC) // unpartitioned
    SnapshotTable.commit(c, rootD, partitionBy = Seq("bucket"))
    withSpjConfs {
      val j = spark.read.format("graft-snap").load(rootC)
        .join(spark.read.format("graft-snap").load(rootD), Seq("bucket", "k"))
      assert(PlanAudit.executedShape(j).shuffle > 0)
      assert(j.count() == 500L)
    }
  }

  test("SPJ composes with manifest file skipping: a partition filter " +
      "prunes files AND the surviving join stays exchange-free") {
    import spark.implicits._
    val rootA = tmpRoot("fa")
    val rootB = tmpRoot("fb")
    val a = (1L to 2000L).map(k => (k, k % 8, s"a$k")).toDF("k", "bucket", "va")
    SnapshotTable.commit(a, rootA, partitionBy = Seq("bucket"))
    SnapshotTable.commit(a.withColumnRenamed("va", "vb"), rootB,
      partitionBy = Seq("bucket"))
    withSpjConfs {
      val fa = spark.read.format("graft-snap").load(rootA)
        .filter(col("bucket") < 3)
      val fb = spark.read.format("graft-snap").load(rootB)
        .filter(col("bucket") < 3)
      val j = fa.join(fb, Seq("bucket", "k"))
      val shape = PlanAudit.executedShape(j)
      assert(shape.shuffle == 0, s"got $shape")
      assert(j.count() == (1L to 2000L).count(_ % 8 < 3))
      val (kept, total) = SnapshotSource.lastPrune(rootB).get
      assert(kept < total, s"no file pruning: $kept/$total")
    }
  }
}
