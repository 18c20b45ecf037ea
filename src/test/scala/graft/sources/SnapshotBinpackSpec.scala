package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo

import graft.SparkSpec

/** Bin-pack compaction ([[SnapshotTable.compactSmallFiles]]) and the
  * manifest-exact row-count statistic the DSv2 scan reports.
  */
class SnapshotBinpackSpec extends SparkSpec {

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_bp_$tag").toString + "/t"

  test("compactSmallFiles rewrites only the sub-threshold files, " +
      "carries large ones verbatim, preserves content, and is a no-op " +
      "below two small files") {
    import spark.implicits._
    val root = tmpRoot("pack")
    SnapshotTable.commit( // one large file: 100 rows
      (1L to 100L).map(k => (k, k % 7)).toDF("k", "m").coalesce(1),
      root, statsCol = Some("k"))
    (0 until 5).foreach { i => // five 4-row files
      SnapshotTable.commit(
        (101L + i * 4 to 104L + i * 4).map(k => (k, k % 7))
          .toDF("k", "m").coalesce(1), root)
    }
    val before = SnapshotTable.currentSnapshot(spark, root)
    val filesBefore = SnapshotTable.fileList(spark, root, before)
    val (after, packed, written) = SnapshotTable.compactSmallFiles(
      spark, root, minRows = 50L, targetRows = 1000L)
    assert(packed == 5 && written == 1)
    val filesAfter = SnapshotTable.fileList(spark, root, after)
    // the large file's manifest line survived verbatim
    assert(filesBefore.toSet.intersect(filesAfter.toSet).size == 1)
    assert(filesAfter.size == 2)
    assert(SnapshotTable.read(spark, root).select("k")
      .as[Long].collect().sorted.toSeq == (1L to 120L))
    // the feed crosses the compaction empty
    assert(SnapshotTable.changeFeed(spark, root, before, after)
      .count() == 0L)
    // idempotent: everything is now at size — no-op, same snapshot
    val (again, p2, _) = SnapshotTable.compactSmallFiles(
      spark, root, 50L, 1000L)
    assert(again == after && p2 == 0)
  }

  test("a partitioned table bin-packs per partition value, keeping " +
      "the value-purity invariant; a vectored table refuses") {
    import spark.implicits._
    val root = tmpRoot("part")
    val df = (1L to 60L).map(k => (k, if (k % 2 == 0) "e" else "o"))
      .toDF("k", "p")
    SnapshotTable.commit(df, root, statsCol = Some("k"),
      partitionBy = Seq("p"))
    (0 until 4).foreach { i =>
      SnapshotTable.commit(
        Seq((100L + i, if (i % 2 == 0) "e" else "o")).toDF("k", "p"), root)
    }
    val (v, packed, _) = SnapshotTable.compactSmallFiles(
      spark, root, minRows = 10L, targetRows = 1000L)
    assert(packed == 4)
    assert(SnapshotTable.partitionPure(spark, root, v),
      "bin-pack must preserve partition value purity")
    assert(SnapshotTable.read(spark, root).count() == 64L)

    val root2 = tmpRoot("dv")
    SnapshotTable.commit(
      (1L to 20L).map(k => (k, k % 3)).toDF("k", "m")
        .repartitionByRange(4, col("k")), root2, statsCol = Some("k"))
    SnapshotTable.deleteWhereMor(spark, root2, Seq(EqualTo("m", 1L)))
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.compactSmallFiles(spark, root2, 10L, 100L)
    }
    assert(e.getMessage.contains("rewriteDeletes"))
  }

  test("the DSv2 scan reports the manifest's EXACT row count to the " +
      "planner when no row filter was pushed") {
    import spark.implicits._
    val root = tmpRoot("stats")
    SnapshotTable.commit(
      (1L to 500L).map(k => (k, s"v$k")).toDF("k", "v")
        .repartitionByRange(4, col("k")), root, statsCol = Some("k"))
    SnapshotTable.commit(
      (501L to 700L).map(k => (k, s"v$k")).toDF("k", "v"), root)
    val t = spark.read.format("graft-snap").load(root)
    val rc = t.queryExecution.optimizedPlan.stats.rowCount
    assert(rc.contains(BigInt(700)),
      s"expected exact manifest rowCount 700, got $rc")
  }
}
