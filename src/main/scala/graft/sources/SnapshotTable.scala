package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal file-level snapshot/manifest table — the metadata half of the
  * warehouse story (`wh_snapshot_asof` reconstructs AS-OF from a row
  * changelog; this layer gives the same capability over FILE SETS, the
  * Iceberg/Delta capability class, with the smallest protocol that is
  * still correct):
  *
  *   <root>/data/<commit-uuid>-<i>.parquet   immutable data files
  *   <root>/_manifests/v<N>.manifest         snapshot N's file list
  *
  * COMMIT protocol — the reference's job-atomic staging+rename sink
  * (reference `apps/terasort/TeraOutputFormat.scala:36-116`, already
  * generalized by the engine's DSv2 [[FixedRecordSource]] writer)
  * extended from "a job's files appear atomically" to "a TABLE VERSION
  * appears atomically":
  *
  *   1. write the batch to `_staging/<uuid>` (Spark job, its own
  *      task-level atomicity);
  *   2. move the part files into `data/` under commit-unique names —
  *      unreferenced files are invisible, so a crash mid-move leaks
  *      garbage but never corrupts a reader;
  *   3. write `v<N+1>.manifest` (previous list ± this commit's files) to
  *      a temp name and RENAME it into place — the one atomic step.
  *      Rename-to-fresh-name is atomic on POSIX and HDFS; an object
  *      store without atomic rename needs a pointer service instead,
  *      which is exactly the part Iceberg's catalog abstracts.
  *
  * READERS never look at the data directory: current = max manifest id
  * from one listing of `_manifests/` (a snapshot is visible iff its
  * manifest rename completed), and the scan reads EXACTLY the listed
  * files. A reader that captured snapshot N is therefore immune to any
  * number of later commits (data files are immutable and never deleted
  * by commits), and `readAt(N)` is O(1)-metadata time travel: one
  * manifest read, no changelog replay, no directory diffing.
  *
  * Concurrency: single writer by design (the common table contract);
  * two racing commits are detected, not merged — the loser's manifest
  * rename fails because the name is taken, and it throws rather than
  * silently dropping the winner's files.
  */
object SnapshotTable {

  private def fsOf(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) = new Path(root, "_manifests")

  private def manifestPath(root: String, id: Long) =
    new Path(manifestDir(root), s"v$id.manifest")

  /** Highest committed snapshot id (0 = empty table, no commits yet). */
  def currentSnapshot(s: SparkSession, root: String): Long = {
    val fs = fsOf(s, new Path(root))
    val dir = manifestDir(root)
    if (!fs.exists(dir)) 0L
    else fs.listStatus(dir).iterator.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toLong }
      .foldLeft(0L)(math.max)
  }

  /** Snapshot N's file list (root-relative), one manifest read. Fails
    * loudly (not with a bare FileNotFound) when the id was expired by
    * [[expireSnapshots]] or never committed.
    */
  def fileList(s: SparkSession, root: String, id: Long): Seq[String] = {
    val fs = fsOf(s, new Path(root))
    if (!fs.exists(manifestPath(root, id)))
      throw new IllegalArgumentException(
        s"snapshot v$id of $root does not exist: it was expired by " +
          s"expireSnapshots or was never committed " +
          s"(current = ${currentSnapshot(s, root)})")
    val in = fs.open(manifestPath(root, id))
    try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      StandardCharsets.UTF_8).split("\n").iterator
      .map(_.trim).filter(_.nonEmpty).toSeq
    finally in.close()
  }

  /** Commit `df` as the next snapshot; returns the new snapshot id.
    * `overwrite = false` appends to the previous file list (the new
    * snapshot sees old + new files); `overwrite = true` replaces it
    * (compaction / full rewrite — old files stay on disk for pinned
    * readers and time travel). `expectedBase` is the optimistic-
    * concurrency pin: a writer that prepared its commit against
    * snapshot N passes Some(N) and FAILS (rather than silently merging
    * or clobbering) if another writer advanced the table meanwhile —
    * the retry-from-new-base loop is the caller's.
    */
  def commit(df: DataFrame, root: String, overwrite: Boolean = false,
      expectedBase: Option[Long] = None): Long = {
    val s = df.sparkSession
    val rootP = new Path(root)
    val fs = fsOf(s, rootP)
    val commitId = java.util.UUID.randomUUID().toString.replace("-", "")
    val staging = new Path(rootP, s"_staging/$commitId")
    df.write.mode("overwrite").parquet(staging.toString)
    val dataDir = new Path(rootP, "data")
    fs.mkdirs(dataDir)
    val moved = fs.listStatus(staging).iterator
      .filter(_.getPath.getName.startsWith("part-"))
      .zipWithIndex.map { case (st, i) =>
        val name = s"$commitId-$i.parquet"
        require(fs.rename(st.getPath, new Path(dataDir, name)),
          s"snapshot commit: failed to move ${st.getPath} into data/")
        s"data/$name"
      }.toSeq
    fs.delete(staging, true)
    val prev = expectedBase.getOrElse(currentSnapshot(s, root))
    val files =
      (if (overwrite || prev == 0L) Seq.empty else fileList(s, root, prev)) ++
        moved
    val id = prev + 1
    // manifest content first to a temp name, then the atomic rename that
    // IS the commit; a taken name means a concurrent writer won the race
    fs.mkdirs(manifestDir(root))
    val tmp = new Path(manifestDir(root), s".tmp-$commitId")
    val out = fs.create(tmp, false)
    try out.write(files.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // claim the id ATOMICALLY before the rename: HDFS rename refuses an
    // existing destination, but the local FS clobbers it, so exists+
    // rename alone leaves a check-to-rename window where two same-base
    // writers both succeed and one manifest is silently overwritten. On
    // the local FS, File.createNewFile is O_CREAT|O_EXCL — exactly one
    // claimer wins; on other filesystems FileSystem.createNewFile plus
    // the no-clobber rename below serve the same role. Claim files are
    // dot-prefixed so snapshot listings never see them; expireSnapshots
    // sweeps completed ones.
    val target = manifestPath(root, id)
    val claim = new Path(manifestDir(root), s".claim-v$id")
    val claimed =
      if (fs.getScheme == "file")
        new java.io.File(claim.toUri.getPath).createNewFile()
      else
        try fs.createNewFile(claim) catch { case _: java.io.IOException => false }
    if (!claimed || fs.exists(target) || !fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"snapshot commit conflict: v$id already committed by a concurrent " +
          s"writer (root=$root); retry from the new current snapshot")
    }
    id
  }

  /** Expire everything older than the last `keepLast` snapshots: delete
    * their manifests, then every data file no SURVIVING manifest
    * references (plus the completed commit-claim markers). This is the
    * vacuum half of the capability class — without it a table that
    * compacts (overwrite commits) grows without bound because commits
    * never delete, by design, for the benefit of pinned readers.
    *
    * Contract: a reader pinned at any KEPT snapshot is untouched (its
    * files all appear in a surviving manifest); a `readAt` of an expired
    * id fails loudly (the manifest is gone, see [[fileList]]). The
    * caller picks `keepLast` as its pinned-reader horizon — the same
    * contract as Iceberg's expire_snapshots. Cost: O(kept manifests)
    * reads + one data-directory listing; no data file is ever read.
    *
    * Returns (expired manifest count, deleted data file count).
    */
  def expireSnapshots(s: SparkSession, root: String,
      keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val fs = fsOf(s, new Path(root))
    val cur = currentSnapshot(s, root)
    val cutoff = cur - keepLast // expire ids <= cutoff
    if (cutoff < 1L) return (0, 0)
    val live: Set[String] =
      ((cutoff + 1) to cur).flatMap(id => fileList(s, root, id)).toSet
    val mdir = manifestDir(root)
    var nManifests = 0
    fs.listStatus(mdir).foreach { st =>
      val n = st.getPath.getName
      val expiredManifest = n.startsWith("v") && n.endsWith(".manifest") &&
        n.stripPrefix("v").stripSuffix(".manifest").toLong <= cutoff
      // completed claims (id <= current) are inert — the manifest's own
      // existence blocks re-commit of the id; in-flight claims (> cur)
      // stay
      val doneClaim = n.startsWith(".claim-v") &&
        n.stripPrefix(".claim-v").toLong <= cur
      if (expiredManifest) { fs.delete(st.getPath, false); nManifests += 1 }
      else if (doneClaim) fs.delete(st.getPath, false)
    }
    val dataDir = new Path(root, "data")
    var nData = 0
    if (fs.exists(dataDir)) fs.listStatus(dataDir).foreach { st =>
      if (!live.contains(s"data/${st.getPath.getName}")) {
        fs.delete(st.getPath, false); nData += 1
      }
    }
    (nManifests, nData)
  }

  /** Read snapshot `id` — O(1) metadata: one manifest, exactly its files. */
  def readAt(s: SparkSession, root: String, id: Long): DataFrame = {
    val files = fileList(s, root, id)
    require(files.nonEmpty, s"snapshot v$id of $root lists no files")
    s.read.parquet(files.map(f => s"$root/$f"): _*)
  }

  /** Read the current snapshot, PINNED at call time: later commits do
    * not change what this frame sees, even if it is evaluated after
    * them — the isolation property the manifest layer exists for.
    */
  def read(s: SparkSession, root: String): DataFrame =
    readAt(s, root, currentSnapshot(s, root))
}
