package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE copy of the small-file atomic-publish protocols the layer's
  * side files (group markers, `.published` records, view definitions)
  * share. Rename semantics are NOT portable enough to lean on bare:
  * Hadoop's raw local rename clobbers an existing destination and
  * returns true, the checksum wrapper sometimes fails on the crc half,
  * and HDFS refuses — so exclusivity uses a POSIX hard link locally
  * (atomic create-if-absent with the FULL content already in place)
  * and a rename + read-back verification elsewhere, and clobbering
  * replacement uses the raw rename + crc-sidecar dance locally and
  * FileContext's atomic OVERWRITE rename elsewhere.
  */
private[sources] object AtomicFiles {

  private def readFully(fs: FileSystem, p: Path): Array[Byte] = {
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    buf
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
    * and exactly one publisher wins. Local FS: a POSIX hard link from
    * the fully-written tmp (link creation is create-if-absent by
    * contract). Remote: exists-check + no-clobber rename + read-back
    * verification (turns any store that silently clobbers into a loud
    * loss instead of a silent one). Returns true iff THIS call
    * published.
    */
  def publishExclusive(fs: FileSystem, dst: Path,
      body: Array[Byte]): Boolean = {
    val tmp = writeTmp(fs, dst, body)
    try {
      if (fs.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dst.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else {
        if (fs.exists(dst)) false
        else if (!fs.rename(tmp, dst)) false
        else java.util.Arrays.equals(readFully(fs, dst), body)
      }
    } finally fs.delete(tmp, false)
  }

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
