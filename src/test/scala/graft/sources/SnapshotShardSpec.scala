package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The manifest-SHARD layer ([[SnapshotTable]] `#shard` refs — the
  * manifest-list shape that makes commit text O(delta)):
  *
  *  - appends roll their new entries into at most one new shard and
  *    carry the previous head's refs VERBATIM, so the head stays
  *    O(shards + threshold) lines however many files the table lists;
  *  - reads expand refs in place — entries/fileList/rowCount/time
  *    travel see exactly the same entry set as the flat format;
  *  - rewrite shapes (merge, COW delete) carry untouched shards as
  *    refs and inline only touched shards' survivors;
  *  - expire deletes shards referenced only by expired heads and
  *    keeps shards any kept head references;
  *  - removeOrphans sweeps never-referenced (crashed-commit) shards
  *    under the same age gate as data files.
  */
class SnapshotShardSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_shard").toString

  private def headOf(root: String, id: Long): Seq[String] = {
    val p = new Path(s"$root/_manifests/v$id.manifest")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toSeq
    finally in.close()
  }

  private def refsOf(lines: Seq[String]): Seq[String] =
    lines.filter(_.startsWith("#shard "))
  private def inlineEntriesOf(lines: Seq[String]): Seq[String] =
    lines.filterNot(_.startsWith("#"))

  test("appends shard once past the threshold and then carry refs: " +
      "head entry text stays O(delta), reads see every entry") {
    import spark.implicits._
    val root = s"${tmp()}/t"
    // 40 files in one commit: > the 32-line threshold → one shard
    SnapshotTable.commit(
      spark.range(0, 400).select(col("id").as("k")).repartition(40),
      root, statsCol = Some("k"))
    val h1 = headOf(root, 1)
    assert(refsOf(h1).size == 1 && inlineEntriesOf(h1).isEmpty,
      s"expected one shard ref, got head:\n${h1.mkString("\n")}")
    // 30 one-file appends: inline lines accumulate under the
    // threshold, then consolidate — the head NEVER re-renders the
    // first commit's 40 entries
    (1 to 30).foreach { i =>
      SnapshotTable.commit(
        Seq(1000L + i).toDF("k").coalesce(1), root, statsCol = Some("k"))
    }
    val h31 = headOf(root, 31)
    assert(inlineEntriesOf(h31).size <= 33,
      s"head inline section grew past the threshold: " +
        s"${inlineEntriesOf(h31).size}")
    // every entry visible; counts exact from the manifest alone
    val cur = SnapshotTable.currentSnapshot(spark, root)
    assert(SnapshotTable.fileList(spark, root, cur).size == 70)
    assert(SnapshotTable.rowCount(spark, root, cur).contains(430L))
    assert(SnapshotTable.read(spark, root).count() == 430L)
    // time travel expands each snapshot's own refs
    assert(SnapshotTable.readAt(spark, root, 1).count() == 400L)
    assert(SnapshotTable.fileList(spark, root, 15).size == 54)
  }

  test("a keyed merge carries untouched shards as REFS and inlines " +
      "only the touched shard's survivors") {
    import spark.implicits._
    val root = s"${tmp()}/t"
    // 3 range-clustered shards of 40 files each (keys 0..1199)
    (0 until 3).foreach { i =>
      SnapshotTable.commit(
        spark.range(i * 400L, (i + 1) * 400L).select(col("id").as("k"),
            (col("id") * 2).as("v"))
          .repartitionByRange(40, col("k")).sortWithinPartitions("k"),
        root, statsCol = Some("k"))
    }
    val v3Refs = refsOf(headOf(root, 3))
    assert(v3Refs.size == 3)
    // merge one key in the MIDDLE shard: the other two shards carry
    // as their original refs VERBATIM; the touched shard's survivors
    // (+ the merge's own files) consolidate into one new shard
    val (v4, rewritten, carried) = SnapshotTable.merge(
      Seq((500L, 9999L)).toDF("k", "v"), root, "k")
    assert(rewritten == 1 && carried == 119)
    val h4 = headOf(root, 4)
    assert(v3Refs.count(refsOf(h4).contains) == 2,
      s"untouched shards must carry as their original refs:\n" +
        s"v3: ${v3Refs.mkString("|")}\nv4: ${refsOf(h4).mkString("|")}")
    assert(refsOf(h4).size + inlineEntriesOf(h4).size <= 36,
      "merge head text must track the touched set, not the table")
    // survivors of the touched shard (39 files) + the merge's own new
    // files stay inline (under threshold) or consolidated — either
    // way the table reads exactly
    assert(SnapshotTable.readAt(spark, root, v4)
      .filter(col("k") === 500L).head.getLong(1) == 9999L)
    assert(SnapshotTable.read(spark, root).count() == 1200L)
  }

  test("expire deletes shards referenced only by expired heads and " +
      "keeps every shard a kept head references; removeOrphans sweeps " +
      "never-referenced shards under the age gate") {
    import spark.implicits._
    val root = s"${tmp()}/t"
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def shardFiles(): Set[String] =
      fs.listStatus(new Path(s"$root/_manifests")).iterator
        .map(_.getPath.getName)
        .filter(n => n.startsWith("s-") && n.endsWith(".shard")).toSet
    // v1: 40 files (shard A); v2: full overwrite, 40 files (shard B) —
    // range-partitioned over enough rows that every partition writes
    SnapshotTable.commit(
      spark.range(0, 400).select(col("id").as("k"))
        .repartitionByRange(40, col("k")), root)
    SnapshotTable.commit(
      spark.range(0, 800).select(col("id").as("k"))
        .repartitionByRange(40, col("k")),
      root, overwrite = true)
    val afterTwo = shardFiles()
    assert(afterTwo.size == 2, s"got $afterTwo")
    // expire v1: shard A is referenced only by it → deleted; shard B
    // survives and the table still reads
    val (nSnaps, _) = SnapshotTable.expireSnapshots(spark, root, 1)
    assert(nSnaps == 1)
    assert(shardFiles().size == 1)
    assert(SnapshotTable.read(spark, root).count() == 800L)
    // a crashed commit's never-referenced shard: age-gated sweep
    val orphan = new Path(s"$root/_manifests/s-deadbeef.shard")
    val out = fs.create(orphan, false)
    try out.write("data/ghost.parquet\trc=1".getBytes("UTF-8"))
    finally out.close()
    assert(SnapshotTable.removeOrphans(spark, root, Long.MaxValue) == 0)
    assert(fs.exists(orphan), "young orphan shard must survive the gate")
    assert(SnapshotTable.removeOrphans(spark, root, -1L) >= 1)
    assert(!fs.exists(orphan))
    assert(shardFiles().size == 1, "referenced shards never sweep")
    assert(SnapshotTable.read(spark, root).count() == 800L)
  }

  test("rewrite_manifests consolidates small shards into target-sized " +
      "ones: metadata-only, reads identical, stats and history intact, " +
      "idempotent no-op when already folded") {
    import spark.implicits._
    val root = s"${tmp()}/t"
    // 5 commits x 33 files: five small shards + whatever inline tail
    (0 until 5).foreach { i =>
      SnapshotTable.commit(
        spark.range(i * 330L, (i + 1) * 330L).select(col("id").as("k"),
          (col("id") % 7).as("v")).repartitionByRange(33, col("k")),
        root, statsCol = Some("k"))
    }
    val v5 = SnapshotTable.currentSnapshot(spark, root)
    val before = headOf(root, v5)
    assert(refsOf(before).size == 5)
    val dataFilesBefore = SnapshotTable.fileList(spark, root, v5)
    val (v6, nBefore, nAfter) =
      SnapshotTable.rewriteManifests(spark, root)
    assert(v6 == v5 + 1 && nAfter < nBefore)
    val after = headOf(root, v6)
    assert(refsOf(after).size == 1 && inlineEntriesOf(after).isEmpty,
      s"expected one consolidated shard, got:\n${after.mkString("\n")}")
    // METADATA-ONLY: the data file set is IDENTICAL (same names), row
    // counts and reads exact, stats-based pruning still live
    assert(SnapshotTable.fileList(spark, root, v6).sorted ==
      dataFilesBefore.sorted)
    assert(SnapshotTable.rowCount(spark, root, v6).contains(1650L))
    assert(SnapshotTable.read(spark, root).count() == 1650L)
    assert(SnapshotTable.read(spark, root)
      .filter(col("k") === 777L).count() == 1L)
    // history intact: pre-fold snapshots expand their own (old) shards
    assert(SnapshotTable.readAt(spark, root, 2).count() == 660L)
    // a rewrite shape AFTER the fold still works (folded shards carry
    // rc/sq/stats verbatim — the merge rewrites only the touched one)
    val (v7, rewritten, _) = SnapshotTable.merge(
      Seq((777L, 99L)).toDF("k", "v"), root, "k")
    assert(rewritten == 1)
    assert(SnapshotTable.readAt(spark, root, v7)
      .filter(col("k") === 777L).head.getLong(1) == 99L)
    assert(SnapshotTable.read(spark, root).count() == 1650L)
    // idempotent: nothing left to fold -> no commit
    val h7 = headOf(root, v7)
    val smallTail = refsOf(h7).size + inlineEntriesOf(h7).size
    val (v8, b8, a8) = SnapshotTable.rewriteManifests(spark, root)
    if (smallTail <= 2) // one big shard + merge remainder may still fold
      assert(v8 == v7 && b8 == a8, "fold with nothing to merge must no-op")
    else assert(v8 == v7 + 1)
    val (v9, b9, a9) = SnapshotTable.rewriteManifests(spark, root)
    assert(v9 == math.max(v7, v8) && b9 == a9,
      "a second immediate rewrite must always no-op")
  }

  test("auto-fold at commit: once refs cross fold.max.refs the commit " +
      "consolidates small shards — head refs stay bounded across an " +
      "open-ended append stream") {
    import spark.implicits._
    val root = s"${tmp()}/t"
    spark.conf.set("graft.snapshot.manifest.fold.max.refs", "4")
    try {
      (0 until 10).foreach { i =>
        SnapshotTable.commit(
          spark.range(i * 330L, (i + 1) * 330L).select(col("id").as("k"))
            .repartitionByRange(33, col("k")),
          root, statsCol = Some("k"))
        val h = headOf(root, SnapshotTable.currentSnapshot(spark, root))
        assert(refsOf(h).size <= 5,
          s"refs must stay bounded by the fold threshold, got " +
            s"${refsOf(h).size} at commit ${i + 1}")
      }
      val cur = SnapshotTable.currentSnapshot(spark, root)
      assert(SnapshotTable.rowCount(spark, root, cur).contains(3300L))
      assert(SnapshotTable.read(spark, root).count() == 3300L)
      assert(SnapshotTable.fileList(spark, root, cur).size == 330)
      // pre-fold history still reads (superseded shards stay on disk
      // until expire)
      assert(SnapshotTable.readAt(spark, root, 3).count() == 990L)
      // and expire reclaims the superseded shards with the old heads
      val (nSnaps, _) = SnapshotTable.expireSnapshots(spark, root, 1)
      assert(nSnaps == cur - 1)
      assert(SnapshotTable.read(spark, root).count() == 3300L)
    } finally spark.conf.unset("graft.snapshot.manifest.fold.max.refs")
  }

  test("WAP stages shard too: stage, audit, publish — O(metadata) " +
      "fast-forward with refs intact") {
    import spark.implicits._
    val root = s"${tmp()}/t"
    SnapshotTable.commit(
      spark.range(0, 200).select(col("id").as("k")).repartition(40), root)
    SnapshotTable.commitWap(
      spark.range(200, 600).select(col("id").as("k")).repartition(40),
      root, "batch1")
    assert(SnapshotTable.read(spark, root).count() == 200L) // invisible
    assert(SnapshotTable.readWap(spark, root, "batch1").count() == 600L)
    val v2 = SnapshotTable.publishWap(spark, root, "batch1")
    assert(SnapshotTable.readAt(spark, root, v2).count() == 600L)
    val h2 = headOf(root, v2)
    assert(refsOf(h2).nonEmpty, "published wap head must carry refs")
  }
}
