package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multi-table atomic publish ([[CommitGroup]]): all-or-nothing
  * visibility across N snapshot tables under crash recovery.
  */
class CommitGroupSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_grp").toString

  private def seed(root: String, n: Long): Unit = {
    SnapshotTable.commit(
      spark.range(0, n).select(col("id").as("k")), root)
    ()
  }

  test("happy path: stage N members, publish once — every head " +
      "advances, markers clear, stages consumed") {
    val b = tmp()
    val roots = Seq(s"$b/t1", s"$b/t2", s"$b/t3")
    roots.foreach(seed(_, 10))
    roots.zipWithIndex.foreach { case (r, i) =>
      CommitGroup.stage(
        spark.range(100, 110 + i).select(col("id").as("k")), r, "g1")
    }
    // staged = invisible everywhere
    roots.foreach(r =>
      assert(SnapshotTable.read(spark, r).count() == 10L))
    val out = CommitGroup.publish(spark, "g1", roots)
    assert(out.values.toSet == Set(2L))
    roots.zipWithIndex.foreach { case (r, i) =>
      assert(SnapshotTable.read(spark, r).count() == 20L + i)
    }
    val fs = new Path(b).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    roots.foreach { r =>
      val leftovers = fs.listStatus(new Path(r, "_manifests"))
        .map(_.getPath.getName)
        .filter(n => n.contains("grp-") || n.startsWith("wap-"))
      assert(leftovers.isEmpty, leftovers.mkString(","))
    }
  }

  test("crash between member publishes: recover() rolls the group " +
      "FORWARD to all-visible from any member's marker") {
    val b = tmp()
    val roots = Seq(s"$b/a", s"$b/c", s"$b/e")
    roots.foreach(seed(_, 5))
    roots.foreach(r => CommitGroup.stage(
      spark.range(50, 60).select(col("id").as("k")), r, "g2"))
    intercept[IllegalStateException](
      CommitGroup.publishCrashable(spark, "g2", roots, crashAfter = 1))
    // torn state: first (sorted) member visible, the rest staged
    assert(SnapshotTable.read(spark, s"$b/a").count() == 15L)
    assert(SnapshotTable.read(spark, s"$b/c").count() == 5L)
    assert(SnapshotTable.read(spark, s"$b/e").count() == 5L)
    // recovery from a NOT-YET-PUBLISHED member's marker
    val recovered = CommitGroup.recover(spark, s"$b/c", "g2")
    assert(recovered.keySet == roots.toSet)
    roots.foreach(r =>
      assert(SnapshotTable.read(spark, r).count() == 15L, r))
    // idempotent: a second recover finds no marker
    assert(CommitGroup.recover(spark, s"$b/c", "g2").isEmpty)
  }

  test("dropGroup discards every stage — no table ever saw the group") {
    val b = tmp()
    val roots = Seq(s"$b/x", s"$b/y")
    roots.foreach(seed(_, 5))
    roots.foreach(r => CommitGroup.stage(
      spark.range(0, 100).select(col("id").as("k")), r, "g3"))
    assert(CommitGroup.dropGroup(spark, "g3", roots) > 0)
    roots.foreach { r =>
      assert(SnapshotTable.read(spark, r).count() == 5L)
      assert(SnapshotTable.currentSnapshot(spark, r) == 1L)
    }
  }

  test("pure-SQL surface: stage members via graft.wap.id INSERTs, " +
      "publish atomically via CALL publish_group") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.grpcat",
      classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.grpcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grpcat.db")
    Seq("p1", "p2").foreach { t =>
      spark.sql(s"CREATE TABLE grpcat.db.$t (k BIGINT)")
      spark.sql(s"INSERT INTO grpcat.db.$t VALUES (1), (2)")
    }
    spark.conf.set("graft.wap.id", "grp-gq")
    try {
      spark.sql("INSERT INTO grpcat.db.p1 VALUES (10), (11)")
      spark.sql("INSERT INTO grpcat.db.p2 VALUES (20)")
    } finally spark.conf.unset("graft.wap.id")
    // staged: both still read their pre-group state
    Seq("p1", "p2").foreach(t => assert(
      spark.sql(s"SELECT count(*) FROM grpcat.db.$t").head.getLong(0) == 2L))
    val n = spark.sql(
      "CALL grpcat.system.publish_group('db.p1,db.p2', 'gq')")
      .head.getInt(0)
    assert(n == 2)
    assert(spark.sql("SELECT count(*) FROM grpcat.db.p1")
      .head.getLong(0) == 4L)
    assert(spark.sql("SELECT count(*) FROM grpcat.db.p2")
      .head.getLong(0) == 3L)
  }

  test("an interleaved commit on any member refuses the WHOLE publish " +
      "before any member becomes visible") {
    val b = tmp()
    val roots = Seq(s"$b/m", s"$b/n")
    roots.foreach(seed(_, 5))
    roots.foreach(r => CommitGroup.stage(
      spark.range(0, 3).select(col("id").as("k")), r, "g4"))
    // someone commits to the SECOND member while the group is staged
    SnapshotTable.commit(
      spark.range(900, 905).select(col("id").as("k")), s"$b/n")
    val e = intercept[IllegalArgumentException](
      CommitGroup.publish(spark, "g4", roots))
    assert(e.getMessage.contains("advanced"), e.getMessage)
    // nothing published — the first member's head did not move either
    assert(SnapshotTable.currentSnapshot(spark, s"$b/m") == 1L)
  }
}
