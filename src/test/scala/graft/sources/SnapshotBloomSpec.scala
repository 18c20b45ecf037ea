package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, In}

import graft.SparkSpec

/** Per-file membership blooms ([[SnapshotTable.buildBloomIndex]]):
  * built as one read-only scan + one metadata-only commit, consumed by
  * every stats-proof path and the scan's runtime join filtering.
  */
class SnapshotBloomSpec extends SparkSpec {

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_bloom_$tag").toString + "/t"

  test("build is metadata-only, refutes absent keys through " +
      "v1ProvesNone where bands cannot, never refutes present keys, " +
      "and auto-sizes to the file NDV") {
    import spark.implicits._
    val root = tmpRoot("core")
    // EVEN keys scattered round-robin: every band covers [0, 1998]
    val df = spark.range(0, 100000).select(
      (col("id") % 1000 * 2).as("k"), (col("id") % 7).as("v"))
    val v1 = SnapshotTable.commit(df.repartition(16), root,
      statsCol = Some("k"))
    val v2 = SnapshotTable.buildBloomIndex(spark, root, "k")
    assert(SnapshotTable.fileList(spark, root, v2) ==
      SnapshotTable.fileList(spark, root, v1),
      "bloom build must not touch the file list")
    val es = SnapshotTable.entries(spark, root, v2)
    assert(es.forall(_.bloomFor("k").isDefined))
    // absent ODD keys inside every band: only the bloom can refute
    val absent = In("k", Array(247L, 1247L))
    assert(es.count(e => SnapshotTable.v1ProvesNone(e, absent)) == es.size)
    // present keys are NEVER refuted (bloom soundness)
    val present = EqualTo("k", 246L)
    assert(es.count(e => SnapshotTable.v1ProvesNone(e, present)) <
      es.size, "a present key must survive in the files that hold it")
    // reading with the static IN pushdown returns the exact rows
    assert(SnapshotTable.read(spark, root)
      .filter(col("k").isin(246L, 247L)).count() == 100L)
  }

  test("rewrites DROP the rewritten files' blooms (stale blooms never " +
      "exist) and carried files keep theirs") {
    import spark.implicits._
    val root = tmpRoot("rewrite")
    val df = (1L to 1000L).map(k => (k, k % 7)).toDF("k", "v")
    SnapshotTable.commit(df.repartitionByRange(8, col("k")), root,
      statsCol = Some("k"))
    SnapshotTable.buildBloomIndex(spark, root, "k")
    // merge touches the low-key files only
    val (v3, touched, carried) = SnapshotTable.merge(
      Seq((5L, 99L), (6L, 99L)).toDF("k", "v"), root, "k")
    assert(touched >= 1 && carried >= 1)
    val es = SnapshotTable.entries(spark, root, v3)
    val (withBloom, without) = es.partition(_.bloomFor("k").isDefined)
    assert(withBloom.size == carried && without.size >= touched,
      s"blooms: kept=${withBloom.size} dropped=${without.size}")
    // a fresh build restores full coverage
    val v4 = SnapshotTable.buildBloomIndex(spark, root, "k")
    assert(SnapshotTable.entries(spark, root, v4)
      .forall(_.bloomFor("k").isDefined))
  }

  test("the runtime join filter prunes fact files through the bloom " +
      "on a plain DSv2 join (dim filtered by a non-key predicate)") {
    import spark.implicits._
    val root = tmpRoot("join")
    val fact = spark.range(0, 100000).select(
      (col("id") % 1000 * 2).as("k"), (col("id") * 7 % 100).as("v"))
    SnapshotTable.commit(fact.repartition(16), root, statsCol = Some("k"))
    SnapshotTable.buildBloomIndex(spark, root, "k")
    // dim keys ODD (absent) selected by a non-key predicate: only the
    // runtime filter can reach the fact scan with them
    val dim = spark.range(0, 2000).select(
      (col("id") * 2 + 1).as("k"), (col("id") % 500).as("cat"))
    val dimSel = dim.filter(col("cat") === 123)
    val j = spark.read.format("graft-snap").load(root).join(dimSel, "k")
    assert(j.count() == 0L)
    val (kept, total) = SnapshotSource.lastPrune(root).get
    assert(kept == 0 && total == 16,
      s"runtime bloom refutation must drop every file: kept=$kept/$total")
  }
}
