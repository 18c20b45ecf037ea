package graft.sources

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The manifest layer's contracts: atomic snapshot visibility under a
  * concurrent writer, O(1) time travel, overwrite semantics that keep
  * pinned readers alive, and loud conflict detection.
  */
class SnapshotTableSpec extends SparkSpec {

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-snap").toString + "/t"

  test("reader sees only complete snapshots while a writer commits") {
    import spark.implicits._
    val root = tmpRoot()
    val batchRows = 500
    val nCommits = 5
    val failure = new AtomicReference[String](null)
    @volatile var writerDone = false
    val seen = scala.collection.mutable.Set.empty[Long]

    val reader = new Thread(() => {
      try {
        while (!writerDone && failure.get == null) {
          val id = SnapshotTable.currentSnapshot(spark, root)
          if (id > 0) {
            // a torn commit would surface as a count that is not an
            // exact multiple of the batch — or a missing-file crash
            val n = SnapshotTable.readAt(spark, root, id).count()
            if (n != id * batchRows)
              failure.set(s"snapshot v$id read ${n} rows, " +
                s"expected ${id * batchRows}")
            seen.synchronized { seen += id }
          }
        }
      } catch {
        case e: Throwable => failure.set(s"reader crashed: ${e.getMessage}")
      }
    })
    reader.start()
    (1 to nCommits).foreach { i =>
      val df = (1 to batchRows).map(r => (i.toLong, r.toLong))
        .toDF("commit_id", "row_id")
      SnapshotTable.commit(df, root)
    }
    writerDone = true
    reader.join(30000)
    assert(failure.get == null, s"${failure.get}")
    assert(seen.synchronized(seen.nonEmpty),
      "reader never observed a snapshot — not a concurrency test")
    // final state: every snapshot is an exact prefix of the commits
    (1 to nCommits).foreach { i =>
      val snap = SnapshotTable.readAt(spark, root, i.toLong)
      assert(snap.count() == i * batchRows)
      assert(snap.agg(max(col("commit_id"))).head().getLong(0) == i.toLong)
    }
  }

  test("time travel is one manifest read; overwrite keeps old snapshots alive") {
    import spark.implicits._
    val root = tmpRoot()
    SnapshotTable.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    SnapshotTable.commit(Seq((3L, "c")).toDF("k", "v"), root)
    assert(SnapshotTable.currentSnapshot(spark, root) == 2L)
    assert(SnapshotTable.readAt(spark, root, 1L).count() == 2)
    assert(SnapshotTable.readAt(spark, root, 2L).count() == 3)
    // compaction-style overwrite: v3 replaces the file list...
    SnapshotTable.commit(Seq((9L, "z")).toDF("k", "v"), root, overwrite = true)
    assert(SnapshotTable.read(spark, root).collect().map(_.getLong(0)).toSeq
      == Seq(9L))
    // ...but earlier snapshots (and any reader pinned on them) still read
    assert(SnapshotTable.readAt(spark, root, 2L)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    // the overwrite manifest lists ONLY its own files (strictly fewer
    // than the appended v2 list) — time travel cost is manifest-sized
    assert(SnapshotTable.fileList(spark, root, 3L).size
      < SnapshotTable.fileList(spark, root, 2L).size)
  }

  test("a pinned reader is immune to commits that happen before evaluation") {
    import spark.implicits._
    val root = tmpRoot()
    SnapshotTable.commit((1 to 10).map(i => (i.toLong, "x")).toDF("k", "v"), root)
    val pinned = SnapshotTable.read(spark, root) // captured at v1
    SnapshotTable.commit((11 to 30).map(i => (i.toLong, "y")).toDF("k", "v"), root)
    // evaluated AFTER v2: still exactly v1's rows
    assert(pinned.count() == 10)
    assert(SnapshotTable.read(spark, root).count() == 30)
  }

  test("conflicting commit fails loudly instead of dropping the winner") {
    import spark.implicits._
    val root = tmpRoot()
    SnapshotTable.commit(Seq((1L, "a")).toDF("k", "v"), root)
    // simulate a racing writer that already renamed v2 into place
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val winner = new org.apache.hadoop.fs.Path(root, "_manifests/v2.manifest")
    val out = fs.create(winner, false)
    out.write("data/winner.parquet".getBytes("UTF-8")); out.close()
    // this writer prepared its commit against base v1 — exactly the
    // state a real race produces (both writers read current=1)
    val e = intercept[IllegalStateException] {
      SnapshotTable.commit(Seq((2L, "b")).toDF("k", "v"), root,
        expectedBase = Some(1L))
    }
    assert(e.getMessage.contains("conflict"))
    // the winner's manifest survives untouched
    assert(SnapshotTable.fileList(spark, root, 2L)
      == Seq("data/winner.parquet"))
  }

  test("a racing writer inside the claim window fails loudly too") {
    import spark.implicits._
    val root = tmpRoot()
    SnapshotTable.commit(Seq((1L, "a")).toDF("k", "v"), root)
    // simulate a racer that CLAIMED v2 but has not renamed its manifest
    // yet — the exists-check alone cannot see it; the exclusive-create
    // claim must
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val claim = new org.apache.hadoop.fs.Path(root, "_manifests/.claim-v2")
    assert(new java.io.File(claim.toUri.getPath).createNewFile())
    val e = intercept[IllegalStateException] {
      SnapshotTable.commit(Seq((2L, "b")).toDF("k", "v"), root,
        expectedBase = Some(1L))
    }
    assert(e.getMessage.contains("conflict"))
    assert(SnapshotTable.currentSnapshot(spark, root) == 1L)
    // claim files never surface as snapshots
    assert(fs.exists(claim))
  }

  test("expire keeps pinned readers in the window, fails expired readAt " +
      "loudly, and deletes only unreferenced data files") {
    import spark.implicits._
    val root = tmpRoot()
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(): Set[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(root, "data"))
        .map(_.getPath.getName).toSet
    SnapshotTable.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root) // v1
    SnapshotTable.commit(Seq((3L, "c")).toDF("k", "v"), root) // v2 = append
    SnapshotTable.commit(Seq((9L, "z")).toDF("k", "v"), root,
      overwrite = true) // v3 = compaction
    val allFiles = dataFiles()
    val v3Files = SnapshotTable.fileList(spark, root, 3L)
      .map(_.stripPrefix("data/")).toSet
    val pinnedV2 = SnapshotTable.readAt(spark, root, 2L) // inside kept window

    // keepLast = 2 keeps v2+v3: v1's manifest goes, but its files are
    // referenced by the surviving v2 manifest → zero data deletions
    val (m1, d1) = SnapshotTable.expireSnapshots(spark, root, keepLast = 2)
    assert(m1 == 1 && d1 == 0, s"($m1, $d1)")
    assert(pinnedV2.collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L))
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.readAt(spark, root, 1L)
    }
    assert(e.getMessage.contains("expired"))

    // keepLast = 1 keeps only the compacted v3: the v1/v2 files are now
    // unreferenced and exactly they are deleted
    val (m2, d2) = SnapshotTable.expireSnapshots(spark, root, keepLast = 1)
    assert(m2 == 1, s"$m2")
    assert(d2 == (allFiles -- v3Files).size, s"$d2")
    assert(dataFiles() == v3Files)
    assert(SnapshotTable.read(spark, root).collect().map(_.getLong(0)).toSeq
      == Seq(9L))
    // a fresh commit after vacuum continues the id sequence
    SnapshotTable.commit(Seq((10L, "w")).toDF("k", "v"), root)
    assert(SnapshotTable.currentSnapshot(spark, root) == 4L)
    assert(SnapshotTable.read(spark, root).count() == 2)
  }

  test("time-based expire: snapshots older than T go, keep_at_least " +
      "survives whatever the age, and the floor/pinned contracts match " +
      "the count form") {
    import spark.implicits._
    val root = tmpRoot()
    (1 to 4).foreach(i =>
      SnapshotTable.commit(Seq((i.toLong, s"r$i")).toDF("k", "v"), root))
    def ageManifest(id: Long, ms: Long): Unit = {
      val f = new java.io.File(s"$root/_manifests/v$id.manifest")
      assert(f.exists && f.setLastModified(System.currentTimeMillis() - ms))
    }
    ageManifest(1L, 60000L)
    ageManifest(2L, 60000L)
    // v1/v2 are older than 30s, v3/v4 young → exactly v1/v2 expire
    val (m1, _) = SnapshotTable.expireSnapshotsOlderThan(
      spark, root, olderThanMs = 30000L, keepAtLeast = 1)
    assert(m1 == 2, s"$m1")
    assert(SnapshotTable.readAt(spark, root, 3L).count() == 3L)
    assert(intercept[IllegalArgumentException](
      SnapshotTable.readAt(spark, root, 2L)).getMessage.contains("expired"))
    // keep_at_least dominates age: ALL remaining manifests are old,
    // but the most recent two survive
    ageManifest(3L, 60000L)
    ageManifest(4L, 60000L)
    val (m2, _) = SnapshotTable.expireSnapshotsOlderThan(
      spark, root, olderThanMs = 30000L, keepAtLeast = 2)
    assert(m2 == 0, s"$m2")
    assert(SnapshotTable.readAt(spark, root, 3L).count() == 3L)
    // nothing older than a huge horizon: no-op even with keepAtLeast=1
    val (m3, _) = SnapshotTable.expireSnapshotsOlderThan(
      spark, root, olderThanMs = 3600000L)
    assert(m3 == 0)
    assert(SnapshotTable.read(spark, root).count() == 4L)
  }

  test("changesBetween reads exactly the appended rows and refuses " +
    "non-append ranges") {
    import spark.implicits._
    val root = tmpRoot()
    SnapshotTable.commit(Seq(1L, 2L).toDF("k"), root) // v1
    SnapshotTable.commit(Seq(3L).toDF("k"), root) // v2
    SnapshotTable.commit(Seq(4L, 5L).toDF("k"), root) // v3
    def ks(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet
    assert(ks(SnapshotTable.changesBetween(spark, root, 1L, 3L))
      == Set(3L, 4L, 5L))
    assert(ks(SnapshotTable.changesBetween(spark, root, 2L, 3L))
      == Set(4L, 5L))
    // fromId = 0 is "everything up to toId"
    assert(ks(SnapshotTable.changesBetween(spark, root, 0L, 1L))
      == Set(1L, 2L))
    // an overwrite (compaction) inside the range rewrites the file set:
    // the incremental read must refuse, not serve rewritten rows as new
    SnapshotTable.commit(
      SnapshotTable.read(spark, root).coalesce(1), root, overwrite = true)
    val e = intercept[IllegalStateException] {
      SnapshotTable.changesBetween(spark, root, 1L, 4L)
    }
    assert(e.getMessage.contains("non-append snapshot v4"))
    // but a range entirely after the compaction is fine again
    SnapshotTable.commit(Seq(6L).toDF("k"), root) // v5
    assert(ks(SnapshotTable.changesBetween(spark, root, 4L, 5L)) == Set(6L))
  }

  test("stats-bearing commits prune files exactly; readWhere stays exact " +
    "with and without stats") {
    import spark.implicits._
    val root = tmpRoot()
    val df = spark.range(0L, 1000L).select(col("id").as("k"),
      (col("id") % 7).as("v"))
    SnapshotTable.commit(df.repartitionByRange(10, col("k")), root,
      statsCol = Some("k"))
    val (keptFiles, kept, total) =
      SnapshotTable.pruneFiles(spark, root, 1L, "k", 100L, 199L)
    assert(total == 10, s"expected 10 range files, got $total")
    // a 100-wide range over 10 ~100-wide partitions touches at most 2
    assert(kept <= 2 && kept >= 1, s"kept $kept of $total")
    assert(keptFiles.size == kept)
    val pruned = SnapshotTable.readWhere(spark, root, 1L, "k", 100L, 199L)
    assert(pruned.count() == 100L)
    assert(pruned.agg(sum(col("k"))).head().getLong(0)
      == (100L to 199L).sum)
    // stats survive appends verbatim: the old files keep pruning
    SnapshotTable.commit(
      spark.range(2000L, 2100L).select(col("id").as("k"),
        lit(0L).as("v")).coalesce(1),
      root, statsCol = Some("k"))
    val (_, kept2, total2) =
      SnapshotTable.pruneFiles(spark, root, 2L, "k", 2000L, 2050L)
    assert(total2 == 11 && kept2 == 1, s"($kept2, $total2)")
    // a stat-less commit is never pruned, and readWhere stays exact
    val root2 = tmpRoot()
    SnapshotTable.commit(df.repartition(4), root2)
    val (_, kept3, total3) =
      SnapshotTable.pruneFiles(spark, root2, 1L, "k", 100L, 199L)
    assert(kept3 == total3, "stat-less files must never be pruned")
    assert(SnapshotTable.readWhere(spark, root2, 1L, "k", 100L, 199L)
      .count() == 100L)
  }

  test("string stats prune lexically; snapshot props round-trip " +
    "URL-encoding") {
    import spark.implicits._
    val root = tmpRoot()
    val df = Seq("apple", "banana", "cherry", "melon", "peach", "plum")
      .toDF("w")
    SnapshotTable.commit(df.repartitionByRange(3, col("w")), root,
      statsCol = Some("w"),
      props = Map("writer" -> "spec run=1 k=v", "note" -> "a=b&c"))
    val (_, kept, total) =
      SnapshotTable.pruneFiles(spark, root, 1L, "w", "a", "b")
    assert(total == 3 && kept < total, s"($kept, $total)")
    val got = SnapshotTable.readWhere(spark, root, 1L, "w", "a", "bz")
      .collect().map(_.getString(0)).toSet
    assert(got == Set("apple", "banana"))
    // the `schema` prop is commit-maintained metadata, not a user prop
    val props = SnapshotTable.snapshotProps(spark, root, 1L) - "schema"
    assert(props == Map("writer" -> "spec run=1 k=v", "note" -> "a=b&c"))
    // user props are per-snapshot, not inherited by later commits
    // (only the schema and stream.* floors carry forward)
    SnapshotTable.commit(Seq("quince").toDF("w"), root)
    assert((SnapshotTable.snapshotProps(spark, root, 2L) - "schema").isEmpty)
  }
}
