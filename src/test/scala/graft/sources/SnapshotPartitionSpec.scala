package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partitioned snapshot tables: value-pure files, exact-value stats as
  * the partition index, shape inheritance and refusals, dynamic
  * partition overwrite ([[SnapshotTable.commitReplace]]), and the
  * catalog's PARTITIONED BY surface.
  */
class SnapshotPartitionSpec extends SparkSpec {

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_part_$tag").toString + "/t"

  private def fixture = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0),
      (4L, "b", 40.0), (5L, "c", 50.0)).toDF("k", "p", "v")
  }

  test("a partitioned commit writes value-pure files with exact " +
      "(min == max, zero-null) partition stats; data keeps the column") {
    val root = tmpRoot("pure")
    SnapshotTable.commit(fixture, root, partitionBy = Seq("p"))
    val es = SnapshotTable.entries(spark, root, 1L)
    assert(es.nonEmpty)
    es.foreach { e =>
      val st = e.statsFor("p").getOrElse(
        fail(s"no partition stats on ${e.path}"))
      assert(st.mn == st.mx, s"${e.path} mixes partition values")
      assert(st.nulls.contains(0L))
    }
    assert(es.flatMap(_.statsFor("p")).map(_.mn).toSet == Set("a", "b", "c"))
    // the real column survives in the data (only the staging duplicate
    // was consumed by the directory layout)
    val back = SnapshotTable.read(spark, root)
    assert(back.columns.toSeq == Seq("k", "p", "v"))
    assert(back.count() == 5)
    assert(!back.columns.exists(_.startsWith("__gp_")))
  }

  test("appends inherit the table's partitioning; restating it is " +
      "fine, changing it refuses") {
    import spark.implicits._
    val root = tmpRoot("inherit")
    SnapshotTable.commit(fixture, root, partitionBy = Seq("p"))
    // bare append: inherits, new file is still value-pure
    SnapshotTable.commit(Seq((6L, "d", 60.0)).toDF("k", "p", "v"), root)
    val es = SnapshotTable.entries(spark, root, 2L)
    assert(es.flatMap(_.statsFor("p")).forall(st => st.mn == st.mx))
    assert(SnapshotTable.partitionColsOf(spark, root, 2L) == Seq("p"))
    // restate: accepted
    SnapshotTable.commit(Seq((7L, "d", 70.0)).toDF("k", "p", "v"), root,
      partitionBy = Seq("p"))
    // change: refused
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.commit(Seq((8L, "d", 80.0)).toDF("k", "p", "v"), root,
        partitionBy = Seq("k"))
    }
    assert(e.getMessage.contains("partitioning"))
    // overwrite without partitionBy un-partitions (restated empty)
    SnapshotTable.commit(fixture, root, overwrite = true)
    assert(SnapshotTable.partitionColsOf(spark, root,
      SnapshotTable.currentSnapshot(spark, root)).isEmpty)
  }

  test("partition pruning runs on the existing stats machinery: a " +
      "partition-value band opens only that partition's files") {
    val root = tmpRoot("prune")
    SnapshotTable.commit(fixture, root, partitionBy = Seq("p"))
    val (kept, nKept, nTotal) =
      SnapshotTable.pruneFiles(spark, root, 1L, "p", "b", "b")
    assert(nKept < nTotal, s"no pruning: $nKept of $nTotal")
    val got = SnapshotTable.readWhere(spark, root, 1L, "p", "b", "b")
    assert(got.agg(sum("v")).head.getDouble(0) == 70.0)
    assert(kept.nonEmpty)
  }

  test("commitReplace on a value-pure table is metadata-only: matched " +
      "partitions drop, others carry VERBATIM, zero rewrites") {
    import spark.implicits._
    val root = tmpRoot("replace")
    SnapshotTable.commit(fixture, root, partitionBy = Seq("p"))
    val before = SnapshotTable.entries(spark, root, 1L)
    val repl = Seq((30L, "b", 300.0), (31L, "b", 310.0)).toDF("k", "p", "v")
    val (v2, dropped, rewritten, carriedN) =
      SnapshotTable.commitReplace(repl, root)
    assert(v2 == 2L)
    assert(rewritten == 0, "pure table must never rewrite on replace")
    assert(dropped >= 1)
    assert(dropped + carriedN == before.size)
    // carried entries are byte-identical manifest lines
    val after = SnapshotTable.entries(spark, root, 2L)
    val carriedPaths = before.filterNot(e =>
      e.statsFor("p").exists(_.mn == "b")).map(_.render).toSet
    assert(carriedPaths.subsetOf(after.map(_.render).toSet))
    val got = SnapshotTable.read(spark, root)
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "a", 10.0), (2L, "a", 20.0), (5L, "c", 50.0),
      (30L, "b", 300.0), (31L, "b", 310.0)))
    // the new files are value-pure too (replace commits partitioned)
    assert(after.diff(before).flatMap(_.statsFor("p"))
      .forall(st => st.mn == st.mx))
    // time travel: v1 still shows the replaced partition's old rows
    assert(SnapshotTable.readAt(spark, root, 1L).count() == 5)
  }

  test("commitReplace refusals: unpartitioned table, empty frame, " +
      "null partition values, missing partition column") {
    import spark.implicits._
    val flat = tmpRoot("flatr")
    SnapshotTable.commit(fixture, flat) // unpartitioned
    intercept[IllegalArgumentException] {
      SnapshotTable.commitReplace(fixture, flat)
    }
    val root = tmpRoot("refuse")
    SnapshotTable.commit(fixture, root, partitionBy = Seq("p"))
    intercept[IllegalArgumentException] {
      SnapshotTable.commitReplace(fixture.limit(0), root)
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.commitReplace(
        Seq((9L, null.asInstanceOf[String], 9.0)).toDF("k", "p", "v"), root)
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.commitReplace(
        Seq((9L, 9.0)).toDF("k", "v"), root)
    }
  }

  test("COW merge on a partitioned table records partition stats on " +
      "rewritten files (the stats index never silently degrades)") {
    import spark.implicits._
    val root = tmpRoot("merge")
    SnapshotTable.commit(fixture, root, partitionBy = Seq("p"))
    val (v2, _, _) = SnapshotTable.merge(
      Seq((3L, "b", 333.0)).toDF("k", "p", "v"), root, "k")
    val es = SnapshotTable.entries(spark, root, v2)
    assert(es.forall(_.statsFor("p").isDefined))
    assert(SnapshotTable.partitionColsOf(spark, root, v2) == Seq("p"))
    assert(SnapshotTable.read(spark, root)
      .filter(col("k") === 3L).head.getDouble(2) == 333.0)
  }

  test("rollback restores the TARGET's partition shape, not the head's") {
    val root = tmpRoot("rbshape")
    SnapshotTable.commit(fixture, root) // v1: unpartitioned
    SnapshotTable.commit(fixture, root, overwrite = true,
      partitionBy = Seq("p")) // v2: partitioned
    val v3 = SnapshotTable.rollback(spark, root, 1L)
    assert(SnapshotTable.partitionColsOf(spark, root, v3).isEmpty)
  }

  test("catalog: CREATE TABLE PARTITIONED BY declares the shape, " +
      "INSERT INTO inherits it, INSERT OVERWRITE keeps it, and a " +
      "partition filter prunes files") {
    val wh = java.nio.file.Files.createTempDirectory("graft_part_cat")
      .toString
    val cat = s"snappart${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, p STRING, v DOUBLE) " +
      s"PARTITIONED BY (p)")
    val root = s"$wh/db/t"
    assert(SnapshotTable.partitionColsOf(spark, root, 1L) == Seq("p"))
    fixture.createOrReplaceTempView("part_fixture")
    spark.sql(s"INSERT INTO $cat.db.t SELECT k, p, v FROM part_fixture")
    val es = SnapshotTable.entries(spark, root, 2L)
    assert(es.nonEmpty && es.flatMap(_.statsFor("p"))
      .forall(st => st.mn == st.mx))
    // SELECT with a partition predicate prunes through the DSv2 scan
    val got = spark.sql(
      s"SELECT sum(v) AS s FROM $cat.db.t WHERE p = 'b'").head.getDouble(0)
    assert(got == 70.0)
    val (nKept, nTotal) = SnapshotSource.lastPrune(root).getOrElse(
      fail("no prune decision recorded"))
    assert(nKept < nTotal, s"partition filter did not prune: $nKept/$nTotal")
    // INSERT OVERWRITE keeps the declared shape
    spark.sql(s"INSERT OVERWRITE $cat.db.t SELECT k, p, v FROM part_fixture")
    val cur = SnapshotTable.currentSnapshot(spark, root)
    assert(SnapshotTable.partitionColsOf(spark, root, cur) == Seq("p"))
    // non-identity transform refuses
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.db.t2 (k BIGINT, ts TIMESTAMP) " +
        s"PARTITIONED BY (days(ts))")
    }
    assert(e.getMessage.contains("identity"))
  }
}
