package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Concurrent-append optimistic REBASE ([[SnapshotTable.publishStaged]]
  * + [[SnapshotTable.rebaseGuard]]): a plain append that loses the
  * commit race re-derives its manifest against the new head instead of
  * failing — its staged data files are immutable, so only metadata
  * retries. Non-additive interleavings (overwrite, merge, compaction)
  * and shape changes refuse loudly, exactly like before.
  */
class SnapshotRebaseSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_rebase").toString

  test("deterministic stale-base append REBASES onto the interleaved " +
      "head: both deltas land, stats and row counts exact") {
    val root = s"${tmp()}/t"
    SnapshotTable.commit(
      spark.range(0, 100).select(col("id").as("k")), root,
      statsCol = Some("k")) // v1
    val v1Carried = SnapshotTable.headEntryLines(spark, root, 1L)
    val v1Schema = SnapshotTable.storedSchema(spark, root, 1L)
    // an interleaved append wins the race for v2
    SnapshotTable.commit(
      spark.range(100, 150).select(col("id").as("k")), root,
      statsCol = Some("k"))
    // the stale writer prepared against v1 and publishes late: the old
    // contract threw the conflict at the caller; now it rebases
    val id = SnapshotTable.commitWithCarried(
      spark.range(200, 230).select(col("id").as("k")), root,
      v1Carried, 1L, Some("k"), Map.empty, v1Schema,
      rebaseable = true)
    assert(id == 3L, s"rebased append must land as v3, got v$id")
    assert(SnapshotTable.rowCount(spark, root, 3L).contains(180L))
    assert(SnapshotTable.read(spark, root).count() == 180L)
    // both deltas visible; the interleaved commit's rows intact
    assert(SnapshotTable.read(spark, root)
      .filter(col("k") >= 100 && col("k") < 150).count() == 50L)
    assert(SnapshotTable.read(spark, root)
      .filter(col("k") >= 200).count() == 30L)
    // the rebased entries carry the REBASED data sequence (eq-delete
    // scoping must see them as v3 files, not v2)
    assert(SnapshotTable.entries(spark, root, 3L)
      .filter(_.seq == 3L).nonEmpty)
  }

  test("rebase REFUSES a non-additive interleaving (overwrite) and a " +
      "shape change (partitioning), loudly") {
    val root = s"${tmp()}/t"
    SnapshotTable.commit(
      spark.range(0, 100).select(col("id").as("k")), root) // v1
    val v1Carried = SnapshotTable.headEntryLines(spark, root, 1L)
    val v1Schema = SnapshotTable.storedSchema(spark, root, 1L)
    // interleaved OVERWRITE drops v1's entries
    SnapshotTable.commit(
      spark.range(500, 600).select(col("id").as("k")), root,
      overwrite = true)
    val e = intercept[IllegalStateException](
      SnapshotTable.commitWithCarried(
        spark.range(200, 210).select(col("id").as("k")), root,
        v1Carried, 1L, None, Map.empty, v1Schema, rebaseable = true))
    assert(e.getMessage.contains("auto-rebase refused"), e.getMessage)
    // the refused commit left no trace: head unmoved, rows exact
    assert(SnapshotTable.currentSnapshot(spark, root) == 2L)
    assert(SnapshotTable.read(spark, root).count() == 100L)
    // shape change: re-partitioning between prepare and publish
    val root2 = s"${tmp()}/t2"
    SnapshotTable.commit(
      spark.range(0, 10).select(col("id").as("k"), lit("x").as("p")),
      root2)
    val c2 = SnapshotTable.headEntryLines(spark, root2, 1L)
    val s2 = SnapshotTable.storedSchema(spark, root2, 1L)
    SnapshotTable.commit(
      spark.range(10, 20).select(col("id").as("k"), lit("y").as("p")),
      root2, overwrite = true, partitionBy = Seq("p"))
    val e2 = intercept[IllegalStateException](
      SnapshotTable.commitWithCarried(
        spark.range(30, 40).select(col("id").as("k"), lit("z").as("p")),
        root2, c2, 1L, None, Map.empty, s2, rebaseable = true))
    assert(e2.getMessage.contains("auto-rebase refused"), e2.getMessage)
  }

  test("an expectedBase pin keeps the strict fail-fast contract (no " +
      "silent rebase)") {
    val root = s"${tmp()}/t"
    SnapshotTable.commit(
      spark.range(0, 10).select(col("id").as("k")), root) // v1
    SnapshotTable.commit(
      spark.range(10, 20).select(col("id").as("k")), root) // v2
    intercept[IllegalStateException](
      SnapshotTable.commit(
        spark.range(20, 30).select(col("id").as("k")), root,
        expectedBase = Some(1L)))
    assert(SnapshotTable.currentSnapshot(spark, root) == 2L)
  }

  test("REAL racing appends: N threads commit from the same base, all " +
      "succeed, the table holds every delta exactly once") {
    val root = s"${tmp()}/t"
    SnapshotTable.commit(
      spark.range(0, 100).select(col("id").as("k")), root,
      statsCol = Some("k")) // v1
    val n = 4
    val barrier = new java.util.concurrent.CyclicBarrier(n)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      import scala.jdk.CollectionConverters._
      val tasks = (0 until n).map { i =>
        new java.util.concurrent.Callable[Long] {
          override def call(): Long = {
            val df = spark.range(1000L * (i + 1), 1000L * (i + 1) + 10)
              .select(col("id").as("k"))
            barrier.await()
            SnapshotTable.commit(df, root, statsCol = Some("k"))
          }
        }
      }
      val ids = pool.invokeAll(tasks.asJava).asScala.map(_.get()).toSeq
      assert(ids.toSet.size == n, s"every append must land its own id, " +
        s"got $ids")
      assert(SnapshotTable.currentSnapshot(spark, root) == 1L + n)
    } finally pool.shutdown()
    assert(SnapshotTable.read(spark, root).count() == 100L + n * 10L)
    (1 to n).foreach { i =>
      assert(SnapshotTable.read(spark, root)
        .filter(col("k") >= 1000L * i && col("k") < 1000L * i + 10)
        .count() == 10L, s"thread $i's delta must survive the race")
    }
    assert(SnapshotTable.rowCount(spark, root,
      SnapshotTable.currentSnapshot(spark, root)).contains(100L + n * 10L))
  }
}
