package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** How EXCLUSIVE CREATE (atomic create-if-absent) is performed on one
  * filesystem scheme — the primitive every claim in the snapshot layer
  * reduces to: manifest version claims, commit-group markers, and any
  * future lock file. Two shapes:
  *
  *   - [[publishExclusive]]: land a fully-written small file at `dst`
  *     iff absent — a racer observes nothing or the complete file,
  *     and EXACTLY ONE publisher returns true;
  *   - [[claimEmpty]]: create an empty claim file iff absent — same
  *     winner guarantee, no body.
  *
  * Implementations must be atomic at the store, not check-then-act in
  * the client: an exists-probe followed by a clobbering rename lets
  * two racers both "win" (the second silently replaces the first and
  * both observe success) — the exact failure this SPI exists to make
  * impossible. A scheme with no registered backend REFUSES loudly
  * rather than degrading to best-effort.
  */
trait ClaimBackend {
  /** Publish the fully-written `tmp` at `dst` iff `dst` is absent.
    * True iff THIS call made `dst` exist; `tmp` is left for the caller
    * to clean either way.
    */
  def publishExclusive(fs: FileSystem, tmp: Path, dst: Path): Boolean

  /** Create an empty file at `dst` iff absent; true iff this call won. */
  def claimEmpty(fs: FileSystem, dst: Path): Boolean
}

/** The ONE copy of the small-file atomic-publish protocols the layer's
  * side files (group markers, `.published` records, view definitions,
  * manifest claims) share. Rename semantics are NOT portable enough to
  * lean on bare — Hadoop's raw local rename clobbers an existing
  * destination and returns true, the checksum wrapper sometimes fails
  * on the crc half, HDFS refuses, and object stores vary — so each
  * operation dispatches on the filesystem's scheme to a backend whose
  * atomicity the store actually provides:
  *
  *   - `file`: a POSIX hard link from the fully-written tmp (link
  *     creation is create-if-absent by contract), `O_CREAT|O_EXCL`
  *     for empty claims — exact;
  *   - HDFS-semantics schemes (`hdfs`, `viewfs`, `webhdfs`, `o3fs`,
  *     `ofs`): the namenode's no-clobber rename / atomic create —
  *     exact, the rename itself is the decider (no read-back
  *     verification, which on a clobbering store would pass BOTH
  *     racers of an identical body);
  *   - anything else (`s3a`, `gs`, …): REFUSED loudly unless the
  *     deployment [[AtomicFiles.register]]s a backend built on the
  *     store's conditional create (S3 `If-None-Match` PUT, GCS
  *     `ifGenerationMatch=0`) or an external lock service — the same
  *     boundary Iceberg draws with its catalog lock. Exclusivity on a
  *     silently-clobbering rename is NOT implementable client-side,
  *     and pretending otherwise turns a crash-safety protocol into a
  *     two-winner race.
  *
  * Clobbering REPLACEMENT ([[replaceWith]]) has no winner contract and
  * keeps the per-scheme rename dance directly.
  */
object AtomicFiles {

  /** Exact exclusive create via POSIX hard link / O_EXCL. */
  private object LocalLinkBackend extends ClaimBackend {
    def publishExclusive(fs: FileSystem, tmp: Path, dst: Path): Boolean =
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dst.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    def claimEmpty(fs: FileSystem, dst: Path): Boolean =
      new java.io.File(dst.toUri.getPath).createNewFile()
  }

  /** Exact exclusive create on stores whose rename/create REFUSE an
    * existing destination (the HDFS FileSystem contract): the rename
    * is the atomic decider; the exists-probe is only a cheap fast-fail.
    */
  private object NoClobberRenameBackend extends ClaimBackend {
    def publishExclusive(fs: FileSystem, tmp: Path, dst: Path): Boolean =
      !fs.exists(dst) && fs.rename(tmp, dst)
    def claimEmpty(fs: FileSystem, dst: Path): Boolean =
      try fs.createNewFile(dst)
      catch { case _: java.io.IOException => false }
  }

  private val backends =
    new java.util.concurrent.ConcurrentHashMap[String, ClaimBackend]()
  Seq("file" -> LocalLinkBackend).foreach { case (k, v) =>
    backends.put(k, v) }
  Seq("hdfs", "viewfs", "webhdfs", "o3fs", "ofs").foreach(s =>
    backends.put(s, NoClobberRenameBackend))

  /** Plug a backend for scheme `s` — the deployment hook for object
    * stores with a conditional-create primitive. Replaces any prior
    * registration.
    */
  def register(scheme: String, backend: ClaimBackend): Unit =
    backends.put(scheme, backend)

  private def backendFor(fs: FileSystem): ClaimBackend = {
    val b = backends.get(fs.getScheme)
    if (b == null) throw new UnsupportedOperationException(
      s"no exclusive-create backend registered for filesystem scheme " +
        s"'${fs.getScheme}': its rename semantics are unknown, and on " +
        "a silently-clobbering store an exists+rename protocol lets " +
        "two racers both win — register a ClaimBackend built on the " +
        "store's conditional create (AtomicFiles.register) before " +
        "pointing the snapshot layer at it")
    b
  }

  /** Write `body` to a dot-tmp sibling of `dst`. */
  private def writeTmp(fs: FileSystem, dst: Path,
      body: Array[Byte]): Path = {
    val tmp = new Path(dst.getParent, s".tmp-${dst.getName}-" +
      java.util.UUID.randomUUID().toString.take(8))
    val out = fs.create(tmp, true)
    try out.write(body) finally out.close()
    tmp
  }

  /** Publish `body` at `dst` iff `dst` is absent — ATOMIC and
    * EXCLUSIVE: a racer observes either nothing or the complete file,
    * and exactly one publisher wins (per the scheme's [[ClaimBackend]];
    * a scheme with none refuses loudly). Returns true iff THIS call
    * published.
    */
  def publishExclusive(fs: FileSystem, dst: Path,
      body: Array[Byte]): Boolean = {
    val backend = backendFor(fs) // resolve BEFORE writing the tmp
    val tmp = writeTmp(fs, dst, body)
    try backend.publishExclusive(fs, tmp, dst)
    finally fs.delete(tmp, false)
  }

  /** Create an empty claim file at `dst` iff absent; true iff this
    * call won (per the scheme's [[ClaimBackend]]; unknown schemes
    * refuse loudly). The manifest version-claim primitive.
    */
  def claimEmpty(fs: FileSystem, dst: Path): Boolean =
    backendFor(fs).claimEmpty(fs, dst)

  /** REPLACE `dst` with `body` atomically (clobber allowed): a reader
    * observes the old complete file or the new complete file, never a
    * torn write and never absence. Local FS: raw POSIX rename (which
    * clobbers atomically) with the checksum sidecar moved in step —
    * the wrapped FileSystem rename is unreliable for clobbers (it can
    * fail on the crc half). Remote: FileContext's single-operation
    * OVERWRITE rename (atomic on HDFS; the FileSystem-API
    * delete-then-rename would leave an absence window).
    */
  def replaceWith(fs: FileSystem, dst: Path, body: Array[Byte],
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val tmp = writeTmp(fs, dst, body)
    if (fs.getScheme == "file") {
      def crcOf(x: Path) = new java.io.File(
        new java.io.File(x.toUri.getPath).getParent, s".${x.getName}.crc")
      crcOf(dst).delete()
      require(new java.io.File(tmp.toUri.getPath)
          .renameTo(new java.io.File(dst.toUri.getPath)),
        s"atomic replace of $dst failed")
      if (crcOf(tmp).exists()) crcOf(tmp).renameTo(crcOf(dst))
    } else {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        dst.toUri, conf)
      fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }
}
