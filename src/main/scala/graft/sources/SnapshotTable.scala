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
  *
  * MANIFEST FORMAT (line-oriented, append-compatible with the v1 format
  * of pure path lines):
  *
  *   `#prop <key>=<value>`                        snapshot properties
  *       (URL-encoded; carried by streaming commits for exactly-once
  *       bookkeeping, see [[SnapshotStreamSink]])
  *   `data/<file>`                                a data file, no stats
  *   `data/<file>\t<col>\t<tag>\t<min>\t<max>`    a data file with the
  *       commit-time parquet-footer min/max of `<col>` (tag i=integer,
  *       d=double, s=string; values URL-encoded) — the file-skipping
  *       index [[readWhere]] prunes on
  *
  * Readers that only need paths ([[fileList]]) see both formats
  * identically; appends carry the previous snapshot's entry lines
  * VERBATIM, so stats survive any number of later commits without
  * being recomputed.
  */
object SnapshotTable {

  private def enc(v: String): String =
    java.net.URLEncoder.encode(v, "UTF-8")
  private def dec(v: String): String =
    java.net.URLDecoder.decode(v, "UTF-8")

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

  /** All manifest lines of snapshot N, one read. Fails loudly (not with
    * a bare FileNotFound) when the id was expired by [[expireSnapshots]]
    * or never committed.
    */
  private def rawLines(s: SparkSession, root: String, id: Long): Seq[String] = {
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

  /** Snapshot N's data-file entry lines (path + optional stats fields),
    * excluding property headers.
    */
  private def entryLines(s: SparkSession, root: String, id: Long): Seq[String] =
    rawLines(s, root, id).filterNot(_.startsWith("#"))

  /** Snapshot N's file list (root-relative), one manifest read. */
  def fileList(s: SparkSession, root: String, id: Long): Seq[String] =
    entryLines(s, root, id).map(_.split("\t", -1)(0))

  /** Snapshot N's properties (`#prop` header lines), one manifest read. */
  def snapshotProps(s: SparkSession, root: String, id: Long): Map[String, String] =
    rawLines(s, root, id).iterator
      .filter(_.startsWith("#prop "))
      .map(_.stripPrefix("#prop ").split("=", 2))
      .collect { case Array(k, v) => dec(k) -> dec(v) }
      .toMap

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
      expectedBase: Option[Long] = None, statsCol: Option[String] = None,
      props: Map[String, String] = Map.empty): Long = {
    val s = df.sparkSession
    val prev = expectedBase.getOrElse(currentSnapshot(s, root))
    // appends carry the previous snapshot's entry lines VERBATIM so
    // earlier commits' stats survive without recomputation
    val carried =
      if (overwrite || prev == 0L) Seq.empty[String]
      else entryLines(s, root, prev)
    commitWithCarried(df, root, carried, prev, statsCol, props)
  }

  /** The commit core: write `df`'s files, then publish a manifest of
    * `carried` entry lines (kept VERBATIM — paths and stats untouched)
    * plus the new files' entries, as snapshot `prev + 1`. [[commit]]
    * carries all-or-none of the previous snapshot; [[merge]] carries
    * exactly the untouched files.
    */
  private def commitWithCarried(df: DataFrame, root: String,
      carried: Seq[String], prev: Long, statsCol: Option[String],
      props: Map[String, String]): Long = {
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
    // the file-skipping index: this commit's files get the parquet
    // footer's min/max of statsCol as manifest fields — O(new files)
    // FOOTER reads (metadata only, never data pages), once, at commit;
    // every later reader prunes from the manifest alone
    val movedEntries = statsCol match {
      case None => moved
      case Some(c) => moved.map { rel =>
        footerStats(s, new Path(rootP, rel), c) match {
          case Some((tag, mn, mx)) =>
            s"$rel\t${enc(c)}\t$tag\t${enc(mn)}\t${enc(mx)}"
          case None => rel // no stats in footer → never pruned
        }
      }
    }
    val files = carried ++ movedEntries
    val id = prev + 1
    // manifest content first to a temp name, then the atomic rename that
    // IS the commit; a taken name means a concurrent writer won the race
    fs.mkdirs(manifestDir(root))
    val tmp = new Path(manifestDir(root), s".tmp-$commitId")
    val lines =
      props.toSeq.sortBy(_._1)
        .map { case (k, v) => s"#prop ${enc(k)}=${enc(v)}" } ++ files
    val out = fs.create(tmp, false)
    try out.write(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
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

  /** Merged min/max of `colName` across a parquet file's row groups,
    * from the FOOTER only (no data pages). Tagged by compare domain:
    * i = integer (INT32/INT64), d = double (FLOAT/DOUBLE), s = UTF-8
    * string (BINARY). None when the footer carries no usable stats —
    * the file is then simply never pruned.
    */
  private def footerStats(s: SparkSession, p: Path,
      colName: String): Option[(String, String, String)] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.column.statistics._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(p, s.sparkContext.hadoopConfiguration)
    val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val sts = (for {
        b <- rdr.getFooter.getBlocks.asScala.toSeq
        c <- b.getColumns.asScala if c.getPath.toDotString == colName
      } yield c.getStatistics).filter(st =>
        st != null && !st.isEmpty && st.hasNonNullValue)
      if (sts.isEmpty) None
      else sts.head match {
        case _: LongStatistics => Some(("i",
          sts.map(_.asInstanceOf[LongStatistics].getMin).min.toString,
          sts.map(_.asInstanceOf[LongStatistics].getMax).max.toString))
        case _: IntStatistics => Some(("i",
          sts.map(_.asInstanceOf[IntStatistics].getMin.toLong).min.toString,
          sts.map(_.asInstanceOf[IntStatistics].getMax.toLong).max.toString))
        case _: DoubleStatistics => Some(("d",
          sts.map(_.asInstanceOf[DoubleStatistics].getMin).min.toString,
          sts.map(_.asInstanceOf[DoubleStatistics].getMax).max.toString))
        case _: FloatStatistics => Some(("d",
          sts.map(_.asInstanceOf[FloatStatistics].getMin.toDouble).min.toString,
          sts.map(_.asInstanceOf[FloatStatistics].getMax.toDouble).max.toString))
        case _: BinaryStatistics => Some(("s",
          sts.map(_.asInstanceOf[BinaryStatistics]
            .genericGetMin.toStringUsingUTF8).min,
          sts.map(_.asInstanceOf[BinaryStatistics]
            .genericGetMax.toStringUsingUTF8).max))
        case _ => None
      }
    } finally rdr.close()
  }

  private def rangesOverlap(tag: String, mn: String, mx: String,
      lo: String, hi: String): Boolean = tag match {
    case "i" => !(mx.toLong < lo.toLong || mn.toLong > hi.toLong)
    case "d" => !(mx.toDouble < lo.toDouble || mn.toDouble > hi.toDouble)
    case _   => !(mx < lo || mn > hi)
  }

  /** Snapshot N's files partitioned by the skipping index: (kept paths,
    * kept count, total count). A file is DROPPED only when it carries
    * `colName` stats proving no row can satisfy `colName ∈ [lo, hi]` —
    * sound (never drops a matching row), not complete (stat-less files
    * and overlapping ranges are kept), exactly the partition-pruning
    * contract. `lo`/`hi` must live in the stats column's domain
    * (integer / double / string per the commit-time tag).
    */
  def pruneFiles(s: SparkSession, root: String, id: Long, colName: String,
      lo: Any, hi: Any): (Seq[String], Int, Int) = {
    val entries = entryLines(s, root, id)
    val kept = entries.filter { line =>
      line.split("\t", -1) match {
        case Array(_, c, tag, mn, mx) if dec(c) == colName =>
          rangesOverlap(tag, dec(mn), dec(mx), lo.toString, hi.toString)
        case _ => true
      }
    }.map(_.split("\t", -1)(0))
    (kept, kept.size, entries.size)
  }

  /** `readAt(id).where(colName between lo and hi)` with MANIFEST-LEVEL
    * file skipping first: only files whose commit-time footer stats
    * overlap [lo, hi] are opened — at 100 TB a selective range over a
    * clustered commit key turns a full-table scan into a few files,
    * before Spark's own row-group pruning even starts. The residual
    * filter keeps the result exact whatever the index missed.
    */
  def readWhere(s: SparkSession, root: String, id: Long, colName: String,
      lo: Any, hi: Any): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val (kept, _, _) = pruneFiles(s, root, id, colName, lo, hi)
    val base =
      if (kept.isEmpty) readAt(s, root, id).limit(0)
      else s.read.parquet(kept.map(f => s"$root/$f"): _*)
    base.where(col(colName).between(lit(lo), lit(hi)))
  }

  /** Rows ADDED between snapshots `fromId` (exclusive) and `toId`
    * (inclusive) — the incremental-consumption read: a downstream job
    * that processed up to snapshot N catches up by reading
    * `changesBetween(N, current)` instead of re-scanning the table.
    * File-level and O(metadata): added files = toId's list minus
    * fromId's, valid only across APPEND commits — an overwrite
    * (compaction / rewrite) in the range rewrites history, so the scan
    * REFUSES it loudly (per-step superset check) rather than returning
    * rewritten rows as if they were new. `fromId = 0` reads everything
    * up to `toId`.
    */
  def changesBetween(s: SparkSession, root: String, fromId: Long,
      toId: Long): DataFrame = {
    require(0 <= fromId && fromId < toId,
      s"changesBetween needs 0 <= fromId < toId, got ($fromId, $toId]")
    val base: Set[String] =
      if (fromId == 0L) Set.empty else fileList(s, root, fromId).toSet
    var prev = base
    ((fromId + 1) to toId).foreach { id =>
      val cur = fileList(s, root, id).toSet
      if (!prev.subsetOf(cur))
        throw new IllegalStateException(
          s"changesBetween($fromId, $toId) crosses non-append snapshot " +
            s"v$id of $root: an overwrite/compaction rewrote the file set, " +
            "so file-level incremental reads are invalid across it; " +
            "re-baseline the consumer from a full snapshot read instead")
      prev = cur
    }
    val added = fileList(s, root, toId).filterNot(base)
    if (added.isEmpty) readAt(s, root, toId).limit(0)
    else s.read.parquet(added.map(f => s"$root/$f"): _*)
  }

  /** Copy-on-write MERGE (upsert) by `keyCol`: rows of `updates` whose
    * key exists in the table REPLACE the stored row; new keys are
    * inserted. Only files that can contain an updated key are
    * rewritten — decided from the MANIFEST's stats fields alone (a file
    * is touched iff some update key falls in its [min, max]; stat-less
    * files are conservatively rewritten) — every other file is carried
    * into the new manifest VERBATIM, stats included. The rewrite is
    * `touched-files anti-join update-keys` plus the updates themselves;
    * old snapshots still see the pre-merge files (time travel is
    * unaffected; vacuum reclaims them later), and the commit pins
    * `expectedBase` so a racing writer fails loudly.
    *
    * Returns (new snapshot id, files rewritten, files carried).
    *
    * Contract: `updates`' DISTINCT keys are collected to the driver to
    * drive the per-file pruning — the updates batch is the SMALL side
    * of a merge (the delta), which is what makes copy-on-write merge
    * cheap at 100 TB: IO = touched files + delta, never the table. A
    * merge whose keys genuinely don't fit driver memory wants the
    * per-file range-join form of the same pruning (the stats fields
    * support it — nothing in the manifest format would change).
    * Because a merge rewrites history, [[changesBetween]] ranges that
    * cross it refuse, by design.
    */
  def merge(updates: DataFrame, root: String,
      keyCol: String): (Long, Int, Int) = {
    val s = updates.sparkSession
    val cur = currentSnapshot(s, root)
    require(cur > 0L, s"merge into empty table $root: commit first")
    val entries = entryLines(s, root, cur)
    val keys: Array[Any] = updates.select(keyCol).distinct()
      .collect().map(_.get(0))
    require(keys.nonEmpty, "merge with an empty updates batch")
    // typed sorted key array for the per-file containment probe
    def anyKeyIn(tag: String, mn: String, mx: String): Boolean = tag match {
      case "i" =>
        val sorted = keys.map(_.asInstanceOf[Number].longValue).sorted
        val lo = mn.toLong; val hi = mx.toLong
        val i = java.util.Arrays.binarySearch(sorted, lo)
        val at = if (i >= 0) i else -i - 1
        at < sorted.length && sorted(at) <= hi
      case "d" =>
        val sorted = keys.map(_.asInstanceOf[Number].doubleValue).sorted
        val lo = mn.toDouble; val hi = mx.toDouble
        val i = java.util.Arrays.binarySearch(sorted, lo)
        val at = if (i >= 0) i else -i - 1
        at < sorted.length && sorted(at) <= hi
      case _ =>
        val sorted = keys.map(_.toString).sorted
        val at = {
          val i = java.util.Arrays.binarySearch(
            sorted.asInstanceOf[Array[AnyRef]], mn)
          if (i >= 0) i else -i - 1
        }
        at < sorted.length && sorted(at) <= mx
    }
    val (touched, carried) = entries.partition { line =>
      line.split("\t", -1) match {
        case Array(_, c, tag, mn, mx) if dec(c) == keyCol =>
          anyKeyIn(tag, dec(mn), dec(mx))
        case _ => true // no usable stats → conservatively rewrite
      }
    }
    import org.apache.spark.sql.functions.col
    val survivors =
      if (touched.isEmpty) updates.limit(0)
      else s.read.parquet(
          touched.map(l => s"$root/${l.split("\t", -1)(0)}"): _*)
        .join(updates.select(col(keyCol)).distinct(), Seq(keyCol),
          "left_anti")
    val id = commitWithCarried(survivors.unionByName(updates), root,
      carried, cur, Some(keyCol), Map("merge.key" -> keyCol))
    (id, touched.size, carried.size)
  }
}
