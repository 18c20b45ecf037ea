package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Named refs: tags (immutable pins) and branches (fast-forward
  * pointers) as `_refs/` files holding snapshot ids — addressable from
  * `option("ref", name)` reads and `VERSION AS OF '<name>'`, protected
  * from both retention forms until dropped.
  */
class SnapshotRefsSpec extends SparkSpec {

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_refs_$tag").toString + "/t"

  private def commitN(root: String, n: Int): Unit = {
    import spark.implicits._
    (1 to n).foreach(i =>
      SnapshotTable.commit(
        Seq((i.toLong, s"r$i")).toDF("k", "v"), root))
  }

  test("tags are immutable pins, branches fast-forward monotonically, " +
      "and both resolve by name") {
    val root = tmpRoot("basic")
    commitN(root, 3)
    assert(SnapshotTable.createTag(spark, root, "rel1", 1L) == 1L)
    assert(SnapshotTable.createBranch(spark, root, "audit", 2L) == 2L)
    assert(SnapshotTable.resolveRef(spark, root, "rel1").contains(1L))
    assert(SnapshotTable.resolveRef(spark, root, "audit").contains(2L))
    assert(SnapshotTable.listRefs(spark, root) ==
      Seq(("audit", "branch", 2L), ("rel1", "tag", 1L)))
    // default target = current head
    assert(SnapshotTable.createTag(spark, root, "head") == 3L)
    // read by name
    assert(SnapshotTable.readRef(spark, root, "rel1").count() == 1L)
    // tag create on a taken name refuses; advancing a tag refuses;
    // moving a branch backward refuses; a missing target refuses
    intercept[IllegalArgumentException](
      SnapshotTable.createTag(spark, root, "rel1", 2L))
    intercept[IllegalArgumentException](
      SnapshotTable.advanceBranch(spark, root, "rel1", 3L))
    assert(SnapshotTable.advanceBranch(spark, root, "audit", 3L) == 3L)
    intercept[IllegalArgumentException](
      SnapshotTable.advanceBranch(spark, root, "audit", 2L))
    intercept[IllegalArgumentException](
      SnapshotTable.createTag(spark, root, "ghost", 99L))
    // drop frees the name
    assert(SnapshotTable.dropRef(spark, root, "rel1"))
    assert(!SnapshotTable.dropRef(spark, root, "rel1"))
    assert(SnapshotTable.createTag(spark, root, "rel1", 2L) == 2L)
  }

  test("expire keeps ref'd snapshots alive — manifest, files, and " +
      "readRef — under BOTH retention forms; drop_ref releases them") {
    import spark.implicits._
    val root = tmpRoot("expire")
    commitN(root, 4)
    SnapshotTable.createTag(spark, root, "pin", 1L)
    val (m1, d1) = SnapshotTable.expireSnapshots(spark, root, keepLast = 1)
    assert(m1 == 2, s"$m1") // v2/v3 expire; tagged v1 survives
    assert(d1 == 0) // append chain: every file still referenced by v4
    assert(SnapshotTable.readRef(spark, root, "pin")
      .select("k").as[Long].collect().toSeq == Seq(1L))
    intercept[IllegalArgumentException](
      SnapshotTable.readAt(spark, root, 2L))
    // time-based form honors the same protection
    val f = new java.io.File(s"$root/_manifests/v1.manifest")
    assert(f.setLastModified(System.currentTimeMillis() - 60000L))
    val (m2, _) = SnapshotTable.expireSnapshotsOlderThan(
      spark, root, olderThanMs = 30000L)
    assert(m2 == 0, s"$m2")
    assert(SnapshotTable.readRef(spark, root, "pin").count() == 1L)
    // dropping the ref rejoins the retention window
    SnapshotTable.dropRef(spark, root, "pin")
    val (m3, _) = SnapshotTable.expireSnapshots(spark, root, keepLast = 1)
    assert(m3 == 1, s"$m3")
    intercept[IllegalArgumentException](
      SnapshotTable.readAt(spark, root, 1L))
  }

  test("DSv2 option(\"ref\") pins the read; combining pins refuses") {
    import spark.implicits._
    val root = tmpRoot("dsv2")
    commitN(root, 3)
    SnapshotTable.createTag(spark, root, "t2", 2L)
    val viaRef = spark.read.format("graft-snap").option("ref", "t2")
      .load(root)
    assert(viaRef.select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
    val e = intercept[Exception] {
      spark.read.format("graft-snap").option("ref", "t2")
        .option("snapshot", "1").load(root).collect()
    }
    assert(e.getMessage.contains("mutually exclusive"))
    intercept[Exception] {
      spark.read.format("graft-snap").option("ref", "nope")
        .load(root).collect()
    }
  }

  test("SQL surface: CALL create_tag/create_branch/fast_forward/" +
      "drop_ref, VERSION AS OF '<name>', and the .refs metadata table") {
    import spark.implicits._
    val wh = java.nio.file.Files
      .createTempDirectory("graft_refs_sqlwh").toString
    spark.conf.set("spark.sql.catalog.refsql",
      classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.refsql.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS refsql.db")
    spark.sql("CREATE TABLE refsql.db.t (k BIGINT)")
    spark.sql("INSERT INTO refsql.db.t SELECT id FROM range(0, 10)")
    spark.sql("INSERT INTO refsql.db.t SELECT id FROM range(10, 20)")
    // CREATE TABLE is v1, the two INSERTs are v2/v3 — head is 3
    assert(spark.sql(
      "CALL refsql.system.create_tag('db.t', 'v2pin')").head.getLong(0) == 3L)
    assert(spark.sql("CALL refsql.system.create_branch(" +
      "table => 'db.t', name => 'main2', version => 2)").head.getLong(0) == 2L)
    spark.sql("INSERT INTO refsql.db.t SELECT id FROM range(20, 30)")
    // VERSION AS OF a ref NAME
    assert(spark.sql("SELECT count(*) FROM refsql.db.t VERSION AS OF 'v2pin'")
      .as[Long].head() == 20L)
    assert(spark.sql("CALL refsql.system.fast_forward('db.t', 'main2')")
      .head.getLong(0) == 4L)
    assert(spark.sql("SELECT count(*) FROM refsql.db.t VERSION AS OF 'main2'")
      .as[Long].head() == 30L)
    assert(spark.sql("SELECT * FROM refsql.db.t.refs")
      .as[(String, String, Long)].collect().toSet ==
      Set(("v2pin", "tag", 3L), ("main2", "branch", 4L)))
    assert(spark.sql("CALL refsql.system.drop_ref('db.t', 'v2pin')")
      .head.getInt(0) == 1)
    intercept[Exception](spark.sql(
      "SELECT count(*) FROM refsql.db.t VERSION AS OF 'v2pin'").collect())
  }
}
