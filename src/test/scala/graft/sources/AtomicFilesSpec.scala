package graft.sources

import java.net.URI
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path, RawLocalFileSystem}
import org.scalatest.funsuite.AnyFunSuite

/** The exclusive-create contract ([[AtomicFiles]] / [[ClaimBackend]]):
  * exactly one winner per destination on backed schemes, a LOUD
  * refusal — never a silent two-winner race — on schemes whose rename
  * clobbers and which have no conditional-create backend registered.
  */
class AtomicFilesSpec extends AnyFunSuite {

  private val conf = new Configuration()

  private def localFs: FileSystem =
    FileSystem.getLocal(conf)

  private def tmpDir(): Path =
    new Path(java.nio.file.Files.createTempDirectory("graft_af").toString)

  private def bytes(s: String) = s.getBytes(StandardCharsets.UTF_8)

  private def readAll(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  test("local publishExclusive: first caller wins, second refuses, " +
      "winner's body is what lands") {
    val fs = localFs
    val dst = new Path(tmpDir(), "marker")
    assert(AtomicFiles.publishExclusive(fs, dst, bytes("first")))
    assert(!AtomicFiles.publishExclusive(fs, dst, bytes("second")))
    assert(readAll(fs, dst) == "first")
  }

  test("local publishExclusive under a 16-thread hammer with IDENTICAL " +
      "bodies: exactly one winner (the body gives racers nothing to " +
      "distinguish themselves by — exclusivity must come from the store)") {
    val fs = localFs
    val dst = new Path(tmpDir(), "claim")
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    val latch = new java.util.concurrent.CountDownLatch(1)
    (1 to 16).foreach { _ =>
      pool.submit(new Runnable {
        def run(): Unit = {
          latch.await()
          // each racer needs its own FileSystem-independent call; the
          // local backend links from a per-call tmp, so sharing fs is
          // fine
          if (AtomicFiles.publishExclusive(fs, dst, bytes("same-body")))
            wins.incrementAndGet()
        }
      })
    }
    latch.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(30,
      java.util.concurrent.TimeUnit.SECONDS))
    assert(wins.get() == 1, s"expected exactly 1 winner, got ${wins.get()}")
    assert(readAll(fs, dst) == "same-body")
  }

  test("local claimEmpty: exactly one of two claimers wins") {
    val fs = localFs
    val dst = new Path(tmpDir(), ".claim-v7")
    assert(AtomicFiles.claimEmpty(fs, dst))
    assert(!AtomicFiles.claimEmpty(fs, dst))
  }

  /** A filesystem whose rename SILENTLY CLOBBERS an existing
    * destination and whose scheme is unknown to the registry — the
    * S3-shaped store the SPI exists to fence off.
    */
  private class ClobberFs extends RawLocalFileSystem {
    override def getScheme: String = "clobber"
    override def rename(src: Path, dst: Path): Boolean = {
      if (exists(dst)) delete(dst, false) // silent replacement
      super.rename(src, dst)
    }
  }

  private def clobberFs(): FileSystem = {
    val fs = new ClobberFs
    fs.initialize(URI.create("file:///"), conf)
    fs
  }

  test("a clobbering-rename scheme with no backend REFUSES loudly — " +
      "publishExclusive and claimEmpty never degrade to a two-winner " +
      "best-effort") {
    val fs = clobberFs()
    val dst = new Path(tmpDir(), "marker")
    val e = intercept[UnsupportedOperationException](
      AtomicFiles.publishExclusive(fs, dst, bytes("x")))
    assert(e.getMessage.contains("clobber"), e.getMessage)
    intercept[UnsupportedOperationException](
      AtomicFiles.claimEmpty(fs, dst))
    // nothing landed — the refusal happened before any write
    assert(!fs.exists(dst))
  }

  test("a registered conditional-create backend makes the clobbering " +
      "scheme usable: exactly one of two racers wins") {
    // a mock of the store-side conditional create (S3 If-None-Match /
    // GCS ifGenerationMatch=0): the store serializes create-if-absent
    val gate = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
    AtomicFiles.register("clobber", new ClaimBackend {
      def publishExclusive(fs: FileSystem, tmp: Path, dst: Path): Boolean =
        if (gate.putIfAbsent(dst.toString, true) != null) false
        else fs.rename(tmp, dst)
      def claimEmpty(fs: FileSystem, dst: Path): Boolean =
        if (gate.putIfAbsent(dst.toString, true) != null) false
        else { fs.create(dst, false).close(); true }
    })
    try {
      val fs = clobberFs()
      val dst = new Path(tmpDir(), "marker")
      val a = AtomicFiles.publishExclusive(fs, dst, bytes("A"))
      val b = AtomicFiles.publishExclusive(fs, dst, bytes("B"))
      assert(a && !b, s"expected first-wins, got a=$a b=$b")
      assert(readAll(fs, dst) == "A")
    } finally {
      // drop the registration so other specs see the refusal contract
      val field = AtomicFiles.getClass.getDeclaredField("backends")
      field.setAccessible(true)
      field.get(AtomicFiles)
        .asInstanceOf[java.util.concurrent.ConcurrentHashMap[String, ClaimBackend]]
        .remove("clobber")
    }
  }

  test("snapshot-table commits run through the claim backend: a table " +
      "on the local scheme commits normally (regression guard for the " +
      "claimEmpty rewiring of publishManifest)") {
    val spark = graft.SparkSpec.spark
    import org.apache.spark.sql.functions.col
    val root = s"${tmpDir()}/t"
    SnapshotTable.commit(
      spark.range(0, 10).select(col("id").as("k")), root)
    SnapshotTable.commit(
      spark.range(10, 20).select(col("id").as("k")), root)
    assert(SnapshotTable.read(spark, root).count() == 20L)
    assert(SnapshotTable.currentSnapshot(spark, root) == 2L)
  }
}
