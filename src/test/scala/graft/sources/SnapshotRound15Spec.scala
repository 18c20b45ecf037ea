package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-15 defect regressions: the recovery wedge when a published
  * member advances before recover() runs, and the auto-rebase CHECK
  * constraint bypass.
  */
class SnapshotRound15Spec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_r15").toString

  private def seed(root: String, n: Long): Unit = {
    SnapshotTable.commit(
      spark.range(0, n).select(col("id").as("k")), root)
    ()
  }

  test("recover() converges — not wedges — when an already-published " +
      "member took a later unrelated commit before recovery ran") {
    val b = tmp()
    val roots = Seq(s"$b/a", s"$b/c", s"$b/e")
    roots.foreach(seed(_, 5))
    roots.foreach(r => CommitGroup.stage(
      spark.range(50, 60).select(col("id").as("k")), r, "gw"))
    intercept[IllegalStateException](
      CommitGroup.publishCrashable(spark, "gw", roots, crashAfter = 1))
    // the published member (sorted-first) takes an unrelated commit:
    // its stage is consumed AND its head no longer carries the group's
    // wap id — the state that used to wedge the group forever
    SnapshotTable.commit(
      spark.range(900, 920).select(col("id").as("k")), s"$b/a")
    assert(SnapshotTable.read(spark, s"$b/a").count() == 35L)
    val recovered = CommitGroup.recover(spark, s"$b/c", "gw")
    assert(recovered.keySet == roots.toSet)
    // the pin recorded for the advanced member is the GROUP's snapshot
    // (v2, the one whose provenance carries the wap id) — not the
    // later unrelated head
    assert(recovered(s"$b/a") == 2L,
      s"expected the wap-provenance snapshot v2, got v${recovered(s"$b/a")}")
    // the still-staged members published; markers cleared (a second
    // recover finds nothing); group reads serve all-new at the pins
    assert(SnapshotTable.read(spark, s"$b/c").count() == 15L)
    assert(SnapshotTable.read(spark, s"$b/e").count() == 15L)
    assert(CommitGroup.recover(spark, s"$b/c", "gw").isEmpty)
    val all = CommitGroup.readAll(spark, "gw", roots)
    assert(all(s"$b/a").count() == 15L) // pinned BEFORE the unrelated commit
    assert(all(s"$b/c").count() == 15L)
    // and dropGroup no longer refuses (no markers survive)
    assert(CommitGroup.dropGroup(spark, "gw", roots) == 0)
  }

  test("auto-rebase REFUSES when a concurrent commit added a CHECK " +
      "constraint — staged rows were validated against the old set") {
    val root = s"${tmp()}/t"
    SnapshotTable.commit(
      spark.range(0, 100).select(col("id").as("k")), root) // v1
    val v1Carried = SnapshotTable.headEntryLines(spark, root, 1L)
    val v1Schema = SnapshotTable.storedSchema(spark, root, 1L)
    // interleaved metadata-only commit: ADD CONSTRAINT k < 150 (holds
    // on the standing table, entry-set-preserving — the old guard
    // waved this through)
    SnapshotTable.setTableProps(spark, root,
      Map("constraint.k_small" -> "k < 150")) // v2
    val e = intercept[IllegalStateException](
      SnapshotTable.commitWithCarried(
        spark.range(200, 230).select(col("id").as("k")), root,
        v1Carried, 1L, None, Map.empty, v1Schema, rebaseable = true))
    assert(e.getMessage.contains("CHECK"), e.getMessage)
    // nothing landed: head unmoved, rows exact, constraint intact
    assert(SnapshotTable.currentSnapshot(spark, root) == 2L)
    assert(SnapshotTable.read(spark, root).count() == 100L)
    // re-preparing against the NEW head re-validates and refuses the
    // violating rows the ordinary way
    intercept[IllegalArgumentException](
      SnapshotTable.commit(
        spark.range(200, 230).select(col("id").as("k")), root))
    // while conforming rows rebase fine across the constraint commit
    // when staged against the post-constraint head
    SnapshotTable.commit(
      spark.range(100, 120).select(col("id").as("k")), root)
    assert(SnapshotTable.read(spark, root).count() == 120L)
  }

  test("streaming sink compaction cadence: 60 micro-batches saw-tooth " +
      "the file count under the debt bound; exactly-once floor, rows, " +
      "and the change feed are undisturbed") {
    val root = s"${tmp()}/t"
    // keep the spec fast: fire after 8 small files instead of 24
    spark.conf.set("graft.index.compact.max.small", "8")
    try {
      val w = SnapshotStreamSink.writer(root, "cad", statsCol = Some("k"))
      var maxFiles = 0
      (0 until 60).foreach { b =>
        w(spark.range(b * 10L, b * 10L + 10L)
          .select(col("id").as("k")).repartition(2), b.toLong)
        maxFiles = math.max(maxFiles,
          SnapshotTable.fileList(spark, root,
            SnapshotTable.currentSnapshot(spark, root)).size)
      }
      // without the cadence 60 batches x 2 partitions = 120 files;
      // with it the count saw-tooths under threshold + batch size
      assert(maxFiles <= 12,
        s"file count not bounded by the cadence: max=$maxFiles")
      assert(SnapshotTable.read(spark, root).count() == 600L)
      // floor survived the interleaved compaction commits: redelivery
      // of the last batch id is still a no-op for a FRESH writer (the
      // recovery scan reads the carried stream.* props)
      val head = SnapshotTable.currentSnapshot(spark, root)
      assert(SnapshotStreamSink.lastCommittedBatch(spark, root, "cad") == 59L)
      val w2 = SnapshotStreamSink.writer(root, "cad")
      w2(spark.range(0, 5).select(col("id").as("k")), 59L)
      assert(SnapshotTable.currentSnapshot(spark, root) == head)
      // the row-level change feed crosses the compactions as empty
      // steps: summed A rows equal exactly what the stream appended
      val ops = SnapshotTable.changeFeed(spark, root, 0L, head)
        .groupBy("_op").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(ops == Map("A" -> 600L), s"unexpected feed ops: $ops")
    } finally spark.conf.unset("graft.index.compact.max.small")
  }

  test("upsert sink gets the same cadence: merge-heavy batches do not " +
      "accrete fragments past the bound") {
    val root = s"${tmp()}/t"
    spark.conf.set("graft.index.compact.max.small", "8")
    try {
      val w = SnapshotStreamSink.upsertWriter(root, "up", "k")
      var maxFiles = 0
      (0 until 40).foreach { b =>
        // rolling window: half fresh keys, half rewrites of earlier ones
        w(spark.range(b * 5L, b * 5L + 10L)
          .select(col("id").as("k"), lit(b).as("v")).repartition(2),
          b.toLong)
        maxFiles = math.max(maxFiles,
          SnapshotTable.fileList(spark, root,
            SnapshotTable.currentSnapshot(spark, root)).size)
      }
      assert(maxFiles <= 12,
        s"upsert sink file count not bounded: max=$maxFiles")
      // last-wins semantics intact across compactions
      val out = SnapshotTable.read(spark, root)
      assert(out.count() == 205L) // keys 0..204
      // k=100 is written by batch 19 (95..104) then batch 20 (100..109)
      assert(out.filter(col("k") === 100L).select("v").head().getInt(0) == 20)
    } finally spark.conf.unset("graft.index.compact.max.small")
  }
}
