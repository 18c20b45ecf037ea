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

  /** Snapshot N's file list (root-relative), one manifest read. */
  def fileList(s: SparkSession, root: String, id: Long): Seq[String] = {
    val fs = fsOf(s, new Path(root))
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
    // explicit existence check first: HDFS rename refuses an existing
    // destination, but the local FS clobbers it — the check makes the
    // conflict deterministic on both (the residual check-to-rename window
    // is closed by HDFS semantics; a local-FS deployment is single-node
    // single-writer by construction)
    val target = manifestPath(root, id)
    if (fs.exists(target) || !fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"snapshot commit conflict: v$id already committed by a concurrent " +
          s"writer (root=$root); retry from the new current snapshot")
    }
    id
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
