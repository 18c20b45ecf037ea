package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[SnapshotTable.rollback]] contracts: head restore as a NEW
  * snapshot, history retention, stream-floor monotonicity, vacuum
  * interaction, and the non-append refusal of incremental reads that
  * cross a rollback.
  */
class SnapshotRollbackSpec extends SparkSpec {

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_rb_$tag").toString + "/t"

  test("rollback restores the target's file list as a new head; " +
      "history stays time-travelable") {
    import spark.implicits._
    val root = tmpRoot("basic")
    SnapshotTable.commit(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root) // v1
    SnapshotTable.commit(Seq((3L, "BAD")).toDF("k", "v"), root) // v2
    val v3 = SnapshotTable.rollback(spark, root, 1L)
    assert(v3 == 3L)
    assert(SnapshotTable.currentSnapshot(spark, root) == 3L)
    val head = SnapshotTable.read(spark, root)
      .as[(Long, String)].collect().toSet
    assert(head == Set((1L, "a"), (2L, "b")))
    // the bad version is still addressable: rollback moves the head,
    // it never erases versions
    val v2 = SnapshotTable.readAt(spark, root, 2L)
      .as[(Long, String)].collect().toSet
    assert(v2 == Set((1L, "a"), (2L, "b"), (3L, "BAD")))
    // manifest-only: the restored head's row count is still exact
    assert(SnapshotTable.rowCount(spark, root, 3L).contains(2L))
  }

  test("rollback refuses the current head and unknown targets") {
    import spark.implicits._
    val root = tmpRoot("refuse")
    SnapshotTable.commit(Seq(1L).toDF("v"), root) // v1
    intercept[IllegalArgumentException] {
      SnapshotTable.rollback(spark, root, 1L) // == current
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.rollback(spark, root, 7L) // beyond current
    }
    SnapshotTable.commit(Seq(2L).toDF("v"), root) // v2
    SnapshotTable.expireSnapshots(spark, root, keepLast = 1)
    intercept[IllegalArgumentException] {
      SnapshotTable.rollback(spark, root, 1L) // expired: manifest gone
    }
  }

  test("stream floors never regress across a rollback: the CURRENT " +
      "snapshot's stream.* props carry, not the restore target's") {
    import spark.implicits._
    val root = tmpRoot("floor")
    SnapshotTable.commit(Seq(1L).toDF("v"), root,
      props = Map("stream.t.batch" -> "3")) // v1: floor 3
    SnapshotTable.commit(Seq(2L).toDF("v"), root,
      props = Map("stream.t.batch" -> "9")) // v2: floor 9
    val v3 = SnapshotTable.rollback(spark, root, 1L)
    // v1's floor was 3; a regressed floor would re-admit batches 4..9
    assert(SnapshotTable.snapshotProps(spark, root, v3)
      .get("stream.t.batch").contains("9"))
  }

  test("vacuum after rollback keeps the restored files (they are " +
      "referenced by the new head) and reclaims the bad batch's") {
    import spark.implicits._
    val root = tmpRoot("vac")
    SnapshotTable.commit(Seq((1L, "a")).toDF("k", "v"), root) // v1
    SnapshotTable.commit(Seq((2L, "BAD")).toDF("k", "v"), root) // v2
    SnapshotTable.rollback(spark, root, 1L) // v3 == v1's files
    val (nMan, nData) = SnapshotTable.expireSnapshots(spark, root, 1)
    assert(nMan == 2) // v1, v2 manifests expired
    assert(nData == 1) // only v2's appended file was unreferenced
    assert(SnapshotTable.read(spark, root)
      .as[(Long, String)].collect().toSet == Set((1L, "a")))
  }

  test("changesBetween refuses a range that crosses a rollback " +
      "(the file set shrank: not an append)") {
    import spark.implicits._
    val root = tmpRoot("chg")
    SnapshotTable.commit(Seq(1L).toDF("v"), root) // v1
    SnapshotTable.commit(Seq(2L).toDF("v"), root) // v2
    SnapshotTable.rollback(spark, root, 1L) // v3
    val e = intercept[IllegalStateException] {
      SnapshotTable.changesBetween(spark, root, 1L, 3L).collect()
    }
    assert(e.getMessage.contains("non-append"))
  }
}
