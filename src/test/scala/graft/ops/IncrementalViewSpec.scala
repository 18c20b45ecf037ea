package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, LessThanOrEqual}

import graft.SparkSpec
import graft.sources.SnapshotTable

/** [[IncrementalView]]: a maintained grouped COUNT/SUM view equals a
  * from-scratch rebuild after every commit kind the change feed
  * records — and groups whose rows all disappear leave the view.
  */
class IncrementalViewSpec extends SparkSpec {

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_imv_$tag").toString + "/t"

  private def collectView(v: DataFrame): Set[(String, Long, Long)] = {
    import v.sparkSession.implicits._
    v.select("g", "n_rows", "sum_x").as[(String, Long, Long)]
      .collect().toSet
  }

  test("maintain == build after append, merge (via UB pre-images), " +
      "COW delete, and MOR delete — checked at every step") {
    import spark.implicits._
    val root = tmpRoot("steps")
    val df = (1L to 20L)
      .map(k => (k, if (k % 2 == 0) "even" else "odd", k * 10L))
      .toDF("k", "g", "x")
    SnapshotTable.commit(df.repartitionByRange(4, col("k")), root,
      statsCol = Some("k")) // v1
    var view = IncrementalView.build(
      SnapshotTable.readAt(spark, root, 1L), Seq("g"), Seq("x"))
    var from = 1L
    def step(commit: => Long): Unit = {
      val to = commit
      val feed = SnapshotTable.changeFeed(spark, root, from, to)
      view = IncrementalView.maintain(view, feed, Seq("g"), Seq("x"))
      val rebuilt = IncrementalView.build(
        SnapshotTable.read(spark, root), Seq("g"), Seq("x"))
      assert(collectView(view) == collectView(rebuilt),
        s"maintained view diverged from rebuild at snapshot $to")
      from = to
    }
    step(SnapshotTable.commit( // append
      Seq((30L, "even", 7L), (31L, "odd", 8L)).toDF("k", "g", "x"), root))
    step(SnapshotTable.merge( // replace k=4 (moves x 40 → 1), insert 50
      Seq((4L, "even", 1L), (50L, "odd", 2L)).toDF("k", "g", "x"),
      root, "k")._1)
    step(SnapshotTable.deleteWhere(spark, root,
      Seq(LessThanOrEqual("k", 6L)))._1)
    step(SnapshotTable.deleteWhereMor(spark, root,
      Seq(EqualTo("g", "odd")))._1)
  }

  test("maintain folds a SQL row-level rewrite's XB/XA file-diff step " +
      "— carried-unchanged rows cancel, changed rows move the sums") {
    import spark.implicits._
    val wh = java.nio.file.Files
      .createTempDirectory("graft_imv_sqlwh").toString
    spark.conf.set("spark.sql.catalog.imvsql",
      classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.imvsql.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS imvsql.db")
    spark.sql("CREATE TABLE imvsql.db.t (k BIGINT, g STRING, x BIGINT)")
    val root = s"$wh/db/t"
    val df = (1L to 20L)
      .map(k => (k, if (k % 2 == 0) "even" else "odd", k * 10L))
      .toDF("k", "g", "x")
    val v2 = SnapshotTable.commit(df.repartitionByRange(4, col("k")),
      root, statsCol = Some("k"))
    val view = IncrementalView.build(
      SnapshotTable.readAt(spark, root, v2), Seq("g"), Seq("x"))
    spark.sql("UPDATE imvsql.db.t SET x = x + 100 WHERE k > 5 AND k <= 10")
    val v3 = SnapshotTable.currentSnapshot(spark, root)
    val feed = SnapshotTable.changeFeed(spark, root, v2, v3)
    val after = IncrementalView.maintain(view, feed, Seq("g"), Seq("x"))
    val rebuilt = IncrementalView.build(
      SnapshotTable.read(spark, root), Seq("g"), Seq("x"))
    assert(collectView(after) == collectView(rebuilt))
  }

  test("a group whose last row is deleted leaves the view entirely") {
    import spark.implicits._
    val root = tmpRoot("gone")
    val df = Seq((1L, "keep", 5L), (2L, "keep", 6L), (3L, "gone", 7L))
      .toDF("k", "g", "x")
    SnapshotTable.commit(df, root)
    val view = IncrementalView.build(
      SnapshotTable.readAt(spark, root, 1L), Seq("g"), Seq("x"))
    val (v2, _, _, _) = SnapshotTable.deleteWhereMor(spark, root,
      Seq(EqualTo("g", "gone")))
    val feed = SnapshotTable.changeFeed(spark, root, 1L, v2)
    val after = IncrementalView.maintain(view, feed, Seq("g"), Seq("x"))
    assert(collectView(after) == Set(("keep", 2L, 11L)))
  }

  test("maintain is delta-priced in plan terms: the feed of one append " +
      "over a many-file table reads only the appended files") {
    import spark.implicits._
    val root = tmpRoot("delta")
    val df = (1L to 1000L).map(k => (k, s"g${k % 5}", k)).toDF("k", "g", "x")
    SnapshotTable.commit(df.repartitionByRange(8, col("k")), root,
      statsCol = Some("k"))
    val v2 = SnapshotTable.commit(
      Seq((2000L, "g0", 1L)).toDF("k", "g", "x"), root)
    val feed = SnapshotTable.changeFeed(spark, root, 1L, v2)
    // the planned scan covers exactly the files v2 added, not the table
    val scanned = feed.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.inputFiles.length
    }.sum
    val added = SnapshotTable.fileList(spark, root, v2).size -
      SnapshotTable.fileList(spark, root, 1L).size
    assert(scanned == added,
      s"feed scanned $scanned files, expected the $added appended")
  }
}
