package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PARTITION SPEC EVOLUTION ([[SnapshotTable.evolvePartitioning]]):
  * change the partition columns going forward as one metadata-only
  * commit. Sound because partitioning is HIDDEN (per-file manifest
  * stats, not directory paths): reads never cared; SPJ purity
  * withdraws on the mixed-spec table and returns once every file is
  * value-pure on the new key; a partition replace proves what it can
  * on new-spec files and pays the exact read-and-filter rewrite for
  * old-spec files — and its re-staging under the current spec HEALS
  * purity as a side effect.
  */
class SnapshotPartEvolveSpec extends SparkSpec {

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_pevo_$tag").toString + "/t"

  // 24 rows: a in {x,y}, b in {p,q,r}, keys dense
  private def seed(root: String): Long = {
    import spark.implicits._
    val df = (1L to 24L).map(k =>
        (k, if (k % 2 == 0) "x" else "y", Seq("p", "q", "r")((k % 3).toInt),
          s"r$k"))
      .toDF("k", "a", "b", "v")
    SnapshotTable.commit(df, root, statsCol = Some("k"),
      partitionBy = Seq("a"))
  }

  test("evolution is metadata-only; appends then stage value-pure on " +
      "the NEW key; the old spec's append shape refuses; empty cols " +
      "un-partition going forward") {
    import spark.implicits._
    val root = tmpRoot("meta")
    val v1 = seed(root)
    val v2 = SnapshotTable.evolvePartitioning(spark, root, Seq("b"))
    assert(SnapshotTable.fileList(spark, root, v2) ==
      SnapshotTable.fileList(spark, root, v1),
      "evolution must not touch the file list")
    assert(SnapshotTable.partitionColsOf(spark, root, v2) == Seq("b"))
    assert(SnapshotTable.partitionColsOf(spark, root, v1) == Seq("a"),
      "time travel sees each snapshot's own spec")
    // appends inherit the new spec and stage value-pure on it
    val v3 = SnapshotTable.commit(
      Seq((100L, "x", "p", "n1"), (101L, "y", "q", "n2"))
        .toDF("k", "a", "b", "v"), root, statsCol = Some("k"))
    val newEntries = SnapshotTable.entries(spark, root, v3)
      .filterNot(SnapshotTable.entries(spark, root, v2).contains)
    assert(newEntries.nonEmpty && newEntries.forall(e =>
      e.statsFor("b").exists(st => st.mn == st.mx)),
      "post-evolution files must be value-pure on the new key")
    // restating the OLD spec on an append refuses
    intercept[IllegalArgumentException] {
      SnapshotTable.commit(Seq((102L, "x", "p", "n3"))
        .toDF("k", "a", "b", "v"), root, partitionBy = Seq("a"))
    }
    // no-op and unknown columns refuse
    intercept[IllegalArgumentException] {
      SnapshotTable.evolvePartitioning(spark, root, Seq("b"))
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.evolvePartitioning(spark, root, Seq("nope"))
    }
    // empty = un-partition going forward
    val v4 = SnapshotTable.evolvePartitioning(spark, root, Seq.empty)
    assert(SnapshotTable.partitionColsOf(spark, root, v4).isEmpty)
    assert(SnapshotTable.read(spark, root).count() == 26L)
  }

  test("a partition replace on the mixed-spec table is exact: new-spec " +
      "files of the replaced value DROP from metadata, old-spec files " +
      "pay the read-and-filter rewrite, and the re-staging HEALS " +
      "value-purity under the new spec") {
    import spark.implicits._
    val root = tmpRoot("replace")
    seed(root) // v1: partitioned by a — every file mixes b values
    SnapshotTable.evolvePartitioning(spark, root, Seq("b")) // v2
    val v3 = SnapshotTable.commit( // new-spec files, one per b value
      (200L to 205L).map(k =>
          (k, "x", Seq("p", "q", "r")((k % 3).toInt), s"n$k"))
        .toDF("k", "a", "b", "v"), root, statsCol = Some("k"))
    assert(!SnapshotTable.partitionPure(spark, root, v3),
      "old-spec files cannot be pure on the new key")
    // replace partition b='p' with fresh content
    val (v4, dropped, rewritten, carried) = SnapshotTable.commitReplace(
      Seq((300L, "x", "p", "rep300"), (301L, "y", "p", "rep301"))
        .toDF("k", "a", "b", "v"), root, statsCol = Some("k"))
    assert(dropped >= 1, // v3's pure b=p file goes metadata-only
      s"expected a metadata-only drop of the new-spec b=p file, got $dropped")
    assert(rewritten >= 1, // v1's a-partitioned files mix b values
      s"old-spec files must pay the rewrite, got $rewritten")
    assert(carried >= 1, // v3's b=q / b=r files prove no overlap
      s"new-spec files of other values must carry, got $carried")
    val cur = SnapshotTable.read(spark, root)
    val expected =
      (1L to 24L).filter(k => k % 3 != 0) // seed rows outside b=p
        .map(k => (k, s"r$k")) ++
      (200L to 205L).filter(_ % 3 != 0).map(k => (k, s"n$k")) ++
      Seq((300L, "rep300"), (301L, "rep301"))
    assert(cur.select("k", "v").as[(Long, String)].collect().sorted.toSeq ==
      expected.sorted.toSeq)
    // the rewrite re-staged every impure row under the CURRENT spec
    assert(SnapshotTable.partitionPure(spark, root, v4),
      "the replace's rewrite must heal purity under the new spec")
    // with purity healed, the next replace is zero-IO again
    val (_, d2, r2, _) = SnapshotTable.commitReplace(
      Seq((400L, "x", "q", "rep400")).toDF("k", "a", "b", "v"), root)
    assert(r2 == 0 && d2 >= 1,
      s"post-heal replace must be metadata-only, got dropped=$d2 rewritten=$r2")
  }

  test("SQL: CALL system.evolve_partitioning drives the evolution, and " +
      "the change feed crosses the evolution commit as an empty step") {
    import spark.implicits._
    val root = tmpRoot("sql")
    val v1 = seed(root)
    val wh = java.nio.file.Files.createTempDirectory("graft_pevo_wh")
      .toString
    spark.conf.set("spark.sql.catalog.pevocat",
      classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.pevocat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pevocat.db")
    spark.sql("CREATE TABLE pevocat.db.t (k BIGINT, b STRING)")
    spark.sql("INSERT INTO pevocat.db.t VALUES (1, 'p'), (2, 'q')")
    val out = spark.sql(
      "CALL pevocat.system.evolve_partitioning('db.t', 'b')").head()
    assert(out.getLong(0) == 3L) // empty-DDL v1, INSERT v2, evolve v3
    spark.sql("INSERT INTO pevocat.db.t VALUES (3, 'p'), (4, 'r')")
    assert(spark.sql("SELECT count(*) FROM pevocat.db.t").head()
      .getLong(0) == 4L)
    // the .partitions metadata table groups value-pure files by their
    // single-value stats and renders impure (pre-evolution) files as
    // <multi> — one manifest read, zero data files opened
    val partsMeta = spark.sql(
        "SELECT partition, n_files, n_rows FROM pevocat.db.t.partitions")
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(partsMeta.keySet == Set("b=p", "b=r", "b=<multi>"),
      s"got ${partsMeta.keySet}")
    assert(partsMeta("b=p") == 1L && partsMeta("b=r") == 1L &&
      partsMeta("b=<multi>") == 2L, s"got $partsMeta")
    // the evolution commit crosses the feed as an empty step
    val v2 = SnapshotTable.evolvePartitioning(spark, root, Seq("b"))
    val feed = SnapshotTable.changeFeed(spark, root, v1, v2)
    assert(feed.count() == 0L,
      "a spec evolution changes no rows — the feed must cross it empty")
  }
}
