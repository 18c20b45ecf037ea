package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.SnapshotTable

/** The maintained BM25 index ([[Bm25Index]]):
  *
  *  - confluence: after append / merge-update / insert / COW-delete
  *    churn, one maintenance pass leaves tf/dl row-for-row equal to a
  *    from-scratch tokenize of the final corpus;
  *  - search equality: the maintained-index search equals
  *    [[Retrieval.bm25TopK]] over the final corpus, row-for-row;
  *  - idempotence: a replayed pass below the floor is a no-op;
  *  - honesty: dl counts token-less docs with dl = 0 so n_docs never
  *    drifts.
  */
class Bm25IndexSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_bm25ix").toString

  test("maintained tf/dl are confluent with a rebuild, and the index " +
      "search equals the from-scratch scorer after churn") {
    import spark.implicits._
    val b = tmp()
    val corpusRoot = s"$b/corpus"
    val indexRoot = s"$b/ix"
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    SnapshotTable.commit(docs.repartitionByRange(4, col("doc_id")),
      corpusRoot, statsCol = Some("doc_id"))
    Bm25Index.buildBm25Index(spark, corpusRoot, indexRoot)
    // zero-churn audit first
    val (_, diff0) = Bm25Index.confluenceAudit(spark, corpusRoot, indexRoot)
    assert(diff0 == 0L)
    // churn: update, insert (including an EMPTY-text doc), delete
    val mods = docs.filter(col("doc_id") % 7 === 2)
      .withColumn("text", concat(lit("prepended "), col("text")))
    val ins = Seq((20000001L, "fresh tokens here"), (20000002L, ""))
      .toDF("doc_id", "text")
    SnapshotTable.merge(mods.unionByName(ins), corpusRoot, "doc_id")
    SnapshotTable.deleteWhere(spark, corpusRoot,
      Seq(org.apache.spark.sql.sources.GreaterThan("doc_id", 50L),
        org.apache.spark.sql.sources.LessThanOrEqual("doc_id", 90L)))
    val through = Bm25Index.maintainBm25Index(spark, corpusRoot, indexRoot)
    assert(through == SnapshotTable.currentSnapshot(spark, corpusRoot))
    val (nTf, diff) = Bm25Index.confluenceAudit(spark, corpusRoot, indexRoot)
    assert(diff == 0L, s"maintained index diverged from rebuild by $diff")
    assert(nTf > 0L)
    // the empty-text doc must be IN dl (dl = 0) so n_docs is exact
    assert(SnapshotTable.read(spark, Bm25Index.dlRoot(indexRoot))
      .filter(col("doc_id") === 20000002L).head.getLong(1) == 0L)
    // search equality vs the gated from-scratch scorer on the final
    // corpus
    val fromIndex = Bm25Index.searchBm25Index(spark, corpusRoot, indexRoot)
      .orderBy("query_id", "rank").collect().toSeq
    val fromScratch = Retrieval.bm25TopK(
        SnapshotTable.read(spark, corpusRoot))
      .orderBy("query_id", "rank").collect().toSeq
    assert(fromIndex == fromScratch)
    // idempotence: replaying below the floor is a no-op
    val tfV = SnapshotTable.currentSnapshot(spark,
      Bm25Index.tfRoot(indexRoot))
    assert(Bm25Index.maintainBm25Index(spark, corpusRoot, indexRoot)
      == through)
    assert(SnapshotTable.currentSnapshot(spark,
      Bm25Index.tfRoot(indexRoot)) == tfV)
  }

  test("a crashed pass replays idempotently: re-applying the same " +
      "feed below an un-advanced floor converges to the same tables") {
    import spark.implicits._
    val b = tmp()
    val corpusRoot = s"$b/corpus"
    val indexRoot = s"$b/ix"
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "d"))
      .toDF("doc_id", "text")
    SnapshotTable.commit(docs, corpusRoot, statsCol = Some("doc_id"))
    Bm25Index.buildBm25Index(spark, corpusRoot, indexRoot)
    SnapshotTable.merge(Seq((2L, "x y"), (4L, "z")).toDF("doc_id", "text"),
      corpusRoot, "doc_id")
    val from = Bm25Index.maintainedThrough(spark, indexRoot)
    val to = SnapshotTable.currentSnapshot(spark, corpusRoot)
    val feed = SnapshotTable.changeFeed(spark, corpusRoot, from, to)
    // simulate the crash: apply the tf half only (delete + append),
    // floor NOT advanced — then run the real pass over the same feed
    // (r16: the real pass's delete half is the eq-delete commit, so
    // the simulation matches — the replayed delete must outrank and
    // kill the crashed attempt's rows before re-appending them)
    SnapshotTable.deleteByKeysEq(
      feed.select("doc_id").distinct(), Bm25Index.tfRoot(indexRoot))
    Bm25Index.applyFeed(spark, indexRoot, feed, to)
    val (_, diff) = Bm25Index.confluenceAudit(spark, corpusRoot, indexRoot)
    assert(diff == 0L,
      "replay over a half-applied pass must converge, not double-apply")
  }

  test("maintenance deletes are O(delta): a pass publishes equality " +
      "deletes (no touched-file rewrite) and the settle cadence folds " +
      "them back into data files") {
    import spark.implicits._
    val b = tmp()
    val corpusRoot = s"$b/corpus"
    val indexRoot = s"$b/ix"
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "d e"), (4L, "f"))
      .toDF("doc_id", "text")
    SnapshotTable.commit(docs.repartitionByRange(2, col("doc_id")),
      corpusRoot, statsCol = Some("doc_id"))
    Bm25Index.buildBm25Index(spark, corpusRoot, indexRoot)
    val tfR = Bm25Index.tfRoot(indexRoot)
    def files(root: String): Seq[String] = SnapshotTable.fileList(spark,
      root, SnapshotTable.currentSnapshot(spark, root))
    val before = files(tfR).toSet
    SnapshotTable.merge(Seq((2L, "x y")).toDF("doc_id", "text"),
      corpusRoot, "doc_id")
    Bm25Index.maintainBm25Index(spark, corpusRoot, indexRoot)
    val after = files(tfR)
    // O(delta) write: every pre-pass data file survives VERBATIM — the
    // delete half is a delta-sized manifest entry, not a rewrite
    assert(before.subsetOf(after.toSet),
      s"maintenance must not rewrite index files: lost " +
        s"${before.diff(after.toSet)}")
    assert(after.exists(_.startsWith("deletes/eq-")),
      "the delete half must be an equality-delete entry")
    val (_, diff) = Bm25Index.confluenceAudit(spark, corpusRoot, indexRoot)
    assert(diff == 0L, "reads must apply the eq-delete debt")
    // fold cadence: with the threshold at 1, the next pass settles the
    // debt — no delete entries remain and reads stay confluent
    spark.conf.set("graft.index.eqdelete.max.files", "1")
    try {
      SnapshotTable.merge(Seq((3L, "q r")).toDF("doc_id", "text"),
        corpusRoot, "doc_id")
      Bm25Index.maintainBm25Index(spark, corpusRoot, indexRoot)
      assert(!files(tfR).exists(_.startsWith("deletes/")),
        "the settle cadence must fold eq-delete debt")
      val (_, diff2) =
        Bm25Index.confluenceAudit(spark, corpusRoot, indexRoot)
      assert(diff2 == 0L, "folding the debt must preserve the rows")
    } finally spark.conf.unset("graft.index.eqdelete.max.files")
  }

  test("compaction cadence: repeated maintenance passes keep the index " +
      "file count BOUNDED (debt trigger fires), the floor and " +
      "confluence survive the compactions") {
    import spark.implicits._
    val b = tmp()
    val corpusRoot = s"$b/corpus"
    val indexRoot = s"$b/ix"
    val docs = spark.range(0, 400).select(col("id").as("doc_id"),
      concat(lit("tok"), col("id") % 50, lit(" common word")).as("text"))
    SnapshotTable.commit(docs.repartitionByRange(4, col("doc_id")),
      corpusRoot, statsCol = Some("doc_id"))
    Bm25Index.buildBm25Index(spark, corpusRoot, indexRoot)
    // aggressive cadence so the debt trigger fires within the spec's
    // pass budget: every file counts as small, compact at >= 6
    spark.conf.set("graft.index.compact.max.small", "6")
    spark.conf.set("graft.index.compact.min.rows", "1000000")
    spark.conf.set("graft.index.compact.target.rows", "2000000")
    try {
      def tfFiles(): Int = SnapshotTable.fileList(spark,
        Bm25Index.tfRoot(indexRoot),
        SnapshotTable.currentSnapshot(spark,
          Bm25Index.tfRoot(indexRoot))).size
      var maxFiles = 0
      (1 to 12).foreach { i =>
        SnapshotTable.merge(
          spark.range(i * 10L, i * 10L + 10L)
            .select(col("id").as("doc_id"),
              concat(lit("rev"), lit(i), lit(" pass"), col("id"))
                .as("text")),
          corpusRoot, "doc_id")
        Bm25Index.maintainBm25Index(spark, corpusRoot, indexRoot)
        maxFiles = math.max(maxFiles, tfFiles())
      }
      // without the cadence each pass leaves +1..2 files forever; with
      // it the count saw-tooths under (threshold + per-pass delta)
      assert(maxFiles <= 10,
        s"tf file count must stay bounded by the debt trigger, saw " +
          s"$maxFiles")
      assert(Bm25Index.maintainedThrough(spark, indexRoot) ==
        SnapshotTable.currentSnapshot(spark, corpusRoot),
        "the floor must ride the compaction commits")
      val (_, diff) =
        Bm25Index.confluenceAudit(spark, corpusRoot, indexRoot)
      assert(diff == 0L, "compaction is layout-only: confluence holds")
    } finally {
      spark.conf.unset("graft.index.compact.max.small")
      spark.conf.unset("graft.index.compact.min.rows")
      spark.conf.unset("graft.index.compact.target.rows")
    }
  }
}
