package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The DSv2 reader surface (`format("graft-snap")`): row-identical to
  * the library path at every version, pinned at load time, stock
  * parquet pushdown underneath, loud failure on expired ids.
  */
class SnapshotSourceSpec extends SparkSpec {

  private def freshTable(): String = {
    import spark.implicits._
    val root =
      java.nio.file.Files.createTempDirectory("graft-snapsrc").toString + "/t"
    SnapshotTable.commit(
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v"), root)
    SnapshotTable.commit(
      (101 to 130).map(i => (i.toLong, s"v$i")).toDF("k", "v"), root)
    root
  }

  test("DSv2 path equals the library path at every version") {
    val root = freshTable()
    (1L to 2L).foreach { id =>
      val lib = SnapshotTable.readAt(spark, root, id)
        .collect().map(_.toSeq).sortBy(_.toString)
      val dsv2 = spark.read.format("graft-snap")
        .option("snapshot", id.toString).load(root)
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(dsv2.sameElements(lib), s"v$id diverged")
    }
    // no snapshot option = current
    assert(spark.read.format("graft-snap").load(root).count() == 130)
  }

  test("a graft-snap frame is pinned at load time") {
    import spark.implicits._
    val root = freshTable()
    val pinned = spark.read.format("graft-snap").load(root) // at v2
    SnapshotTable.commit(Seq((999L, "z")).toDF("k", "v"), root) // v3
    assert(pinned.count() == 130)
    assert(spark.read.format("graft-snap").load(root).count() == 131)
  }

  test("the scan underneath is the stock parquet scan with pushdown") {
    val root = freshTable()
    val df = spark.read.format("graft-snap").load(root).filter(col("k") <= 10)
    assert(df.count() == 10)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(k), LessThanOrEqual(k,10)]"),
      scan)
  }

  test("expired or unknown ids fail at load, not with an empty scan") {
    val root = freshTable()
    SnapshotTable.expireSnapshots(spark, root, keepLast = 1)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-snap").option("snapshot", "1").load(root)
    }
    assert(e.getMessage.contains("expired"))
    // the catalog listing agrees: only v2 is live
    assert(SnapshotSource.snapshots(spark, root)
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }
}
