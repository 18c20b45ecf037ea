package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The r15 delete-pricing optimization contract: [[SnapshotTable
  * .deleteByKeys]] records its KEYS (delta-sized) instead of the
  * matched pre-image rows, and [[SnapshotTable.changeFeed]]
  * reconstructs the identical `D` rows lazily (removed files ⋉ keys) —
  * the same consumer-pays pricing deleteWhere's metadata-only drops
  * already use. The commit itself must read each touched file ONCE
  * (the survivor rewrite), not twice.
  */
class SnapshotLazyKeysCdfSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_lazykeys").toString

  test("deleteByKeys records keys only; the feed reconstructs full " +
      "pre-image D rows including non-key columns") {
    val root = s"${tmp()}/t"
    val data = spark.range(0, 300).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("payload"))
      .repartitionByRange(6, col("k"))
    SnapshotTable.commit(data, root, statsCol = Some("k"))
    val v0 = SnapshotTable.currentSnapshot(spark, root)
    val keys = Seq(3L, 55L, 299L)
    val (v1, rewr, _) = SnapshotTable.deleteByKeys(keys.toDF("k"), root, "k")
    assert(rewr > 0)
    // the recorded cdf dir holds ONLY the key column — delta-sized,
    // never the touched files' pre-image rows
    val props = SnapshotTable.snapshotProps(spark, root, v1)
    assert(props.get("cdf.keys.col").contains("k"))
    val recorded = spark.read.parquet(s"$root/${props("cdf.dir")}")
    assert(recorded.columns.toSeq == Seq("k"))
    assert(recorded.as[Long].collect().toSet == keys.toSet)
    // the feed's D rows are the FULL pre-images (payload included),
    // exactly the rows the eager frame used to materialize
    val d = SnapshotTable.changeFeed(spark, root, v0, v1)
      .filter(col("_op") === "D")
    assert(d.select("k").as[Long].collect().toSet == keys.toSet)
    assert(d.select("payload").as[String].collect().toSet ==
      keys.map(k => s"v$k").toSet)
    // and the fold over the feed equals the table
    val folded = SnapshotTable.applyChanges(
      SnapshotTable.readAt(spark, root, v0),
      SnapshotTable.changeFeed(spark, root, v0, v1), "k")
    assert(folded.orderBy("k").collect().toSeq ==
      SnapshotTable.read(spark, root).orderBy("k").collect().toSeq)
  }

  test("null keys never match: null-keyed rows survive and the feed's " +
      "D set excludes them, like the eager form's semi-join") {
    val root = s"${tmp()}/t"
    val rows = Seq((Some(1L), "a"), (None, "b"), (Some(2L), "c"))
      .toDF("k", "payload").coalesce(1)
    SnapshotTable.commit(rows, root, statsCol = Some("k"))
    val v0 = SnapshotTable.currentSnapshot(spark, root)
    val (v1, _, _) = SnapshotTable.deleteByKeys(Seq(1L).toDF("k"), root, "k")
    assert(SnapshotTable.read(spark, root).select("payload")
      .as[String].collect().toSet == Set("b", "c"))
    val d = SnapshotTable.changeFeed(spark, root, v0, v1)
      .filter(col("_op") === "D")
    assert(d.select("payload").as[String].collect().toSeq == Seq("a"))
  }
}
