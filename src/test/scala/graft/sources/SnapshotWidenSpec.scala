package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** TYPE WIDENING as a metadata-only commit
  * ([[SnapshotTable.widenColumn]]): the lossless promotion lattice
  * (integral upcasts, float→double, same-scale decimal precision
  * growth) changes ONLY the recorded schema — Spark 4's Parquet
  * readers promote narrow files to the wider read schema natively, so
  * no file is rewritten and no cast lands in the scan. Everything
  * downstream must keep working over mixed-width file epochs: stats
  * pruning, merge, MOR deletes, the change feed, and the SQL
  * `ALTER COLUMN ... TYPE` path through the catalog.
  */
class SnapshotWidenSpec extends SparkSpec {

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_widen_$tag").toString + "/t"

  // 20 rows over 4 range-clustered files: int key, float measure,
  // decimal(10,2) amount, string payload; stats on k
  private def seed(root: String): Long = {
    import spark.implicits._
    val df = (1 to 20).map(k =>
        (k, k.toFloat / 2, BigDecimal(k).setScale(2), s"r$k"))
      .toDF("k", "m", "amt", "v")
      .select(col("k"), col("m"),
        col("amt").cast("decimal(10,2)").as("amt"), col("v"))
    SnapshotTable.commit(df.repartitionByRange(4, col("k")), root,
      statsCol = Some("k"))
  }

  test("widen is metadata-only: file list verbatim, values intact " +
      "under the wider types, time travel sees the narrow types") {
    import spark.implicits._
    val root = tmpRoot("meta")
    val v1 = seed(root)
    val v2 = SnapshotTable.widenColumn(spark, root, "k", LongType)
    val v3 = SnapshotTable.widenColumn(spark, root, "m", DoubleType)
    val v4 = SnapshotTable.widenColumn(spark, root, "amt", DecimalType(16, 2))
    assert(SnapshotTable.fileList(spark, root, v4) ==
      SnapshotTable.fileList(spark, root, v1),
      "a widen must not touch the file list")
    val cur = SnapshotTable.read(spark, root)
    assert(cur.schema("k").dataType == LongType)
    assert(cur.schema("m").dataType == DoubleType)
    assert(cur.schema("amt").dataType == DecimalType(16, 2))
    assert(cur.select("k").as[Long].collect().sorted.toSeq == (1L to 20L))
    assert(cur.agg(sum("m")).as[Double].head() == (1 to 20).map(_ / 2.0).sum)
    // time travel: each snapshot keeps its own width
    val old = SnapshotTable.readAt(spark, root, v1).schema
    assert(old("k").dataType == IntegerType &&
      old("m").dataType == FloatType &&
      old("amt").dataType == DecimalType(10, 2))
    assert(SnapshotTable.readAt(spark, root, v2).schema("m").dataType ==
      FloatType, "v2 widened only k")
    assert(v3 == v2 + 1 && v4 == v3 + 1)
  }

  test("mixed-width file epochs read as one table: wide appends land " +
      "values past int32, narrow late-writer appends stay accepted, " +
      "and stats prune across all epochs") {
    import spark.implicits._
    val root = tmpRoot("mixed")
    seed(root)
    SnapshotTable.widenColumn(spark, root, "k", LongType)
    // a wide append: keys only LongType can hold
    SnapshotTable.commit(
      Seq((3000000021L, 1.5f, BigDecimal(21).setScale(2), "wide"))
        .toDF("k", "m", "amt", "v")
        .select(col("k"), col("m"),
          col("amt").cast("decimal(10,2)").as("amt"), col("v")),
      root, statsCol = Some("k"))
    // a narrow late writer (old int frame) — the recorded wider type wins
    val v3 = SnapshotTable.commit(
      Seq((21, 10.5f, BigDecimal(22).setScale(2), "narrow"))
        .toDF("k", "m", "amt", "v")
        .select(col("k"), col("m"),
          col("amt").cast("decimal(10,2)").as("amt"), col("v")),
      root, statsCol = Some("k"))
    assert(SnapshotTable.storedSchema(spark, root, v3).get("k")
      .dataType == LongType, "narrow append must not narrow the schema")
    val cur = SnapshotTable.read(spark, root)
    assert(cur.select("k").as[Long].collect().sorted.toSeq ==
      ((1L to 21L) :+ 3000000021L))
    // pruning with LONG bounds skips narrow-epoch files too (stats
    // compare in the "i" domain whatever the declared width)
    val (_, kept, total) = SnapshotTable.pruneFiles(
      spark, root, v3, "k", 3000000000L, 4000000000L)
    assert(kept < total && kept >= 1, s"kept=$kept total=$total")
    assert(SnapshotTable.readWhere(spark, root, v3, "k",
      3000000000L, 4000000000L).select("v").as[String].collect().toSeq ==
      Seq("wide"))
  }

  test("a widen DROPS the widened column's blooms — bloom bits hash " +
      "the build-time string rendering, and a float widened to double " +
      "renders differently — while other columns' blooms survive") {
    import spark.implicits._
    val root = tmpRoot("bloom")
    seed(root)
    SnapshotTable.buildBloomIndex(spark, root, "k")
    SnapshotTable.buildBloomIndex(spark, root, "m")
    val v = SnapshotTable.widenColumn(spark, root, "m", DoubleType)
    val es = SnapshotTable.entries(spark, root, v).filterNot(_.isDelete)
    assert(es.forall(_.bloomFor("m").isEmpty),
      "the widened float column's blooms must drop (frozen renderings " +
        "would wrongly refute files)")
    assert(es.exists(_.bloomFor("k").isDefined),
      "other columns' blooms must survive the widen")
    assert(SnapshotTable.read(spark, root).agg(sum("m")).as[Double]
      .head() == (1 to 20).map(_ / 2.0).sum)
  }

  test("refusals: narrowing, non-widen retype, scale change, partition " +
      "column, unknown column; appending WIDER than recorded refuses " +
      "with the widen hint") {
    import spark.implicits._
    val root = tmpRoot("refuse")
    seed(root)
    def refused(f: => Any): String =
      intercept[IllegalArgumentException](f).getMessage
    assert(refused(SnapshotTable.widenColumn(spark, root, "k", ShortType))
      .contains("not a lossless widening"))
    assert(refused(SnapshotTable.widenColumn(spark, root, "k", StringType))
      .contains("not a lossless widening"))
    assert(refused(SnapshotTable.widenColumn(spark, root, "m", FloatType))
      .contains("not a lossless widening"))
    assert(refused( // scale change is NOT a widen even if precision grows
      SnapshotTable.widenColumn(spark, root, "amt", DecimalType(16, 4)))
      .contains("not a lossless widening"))
    intercept[IllegalArgumentException](
      SnapshotTable.widenColumn(spark, root, "nope", LongType))
    // a WIDER incoming frame refuses with the widen pointer
    val wide = Seq((99L, 1.5f, BigDecimal(1).setScale(2), "w"))
      .toDF("k", "m", "amt", "v")
      .select(col("k"), col("m"),
        col("amt").cast("decimal(10,2)").as("amt"), col("v"))
    assert(refused(SnapshotTable.commit(wide, root))
      .contains("widen the table first"))
    // partition columns refuse: staging and replace tuples key on the
    // recorded value rendering
    val proot = tmpRoot("part")
    SnapshotTable.commit(
      (1 to 8).map(k => (k, k % 2, s"r$k")).toDF("k", "p", "v"),
      proot, partitionBy = Seq("p"))
    assert(refused(SnapshotTable.widenColumn(spark, proot, "p", LongType))
      .contains("partition column"))
  }

  test("the change feed crosses a widen without re-baselining: " +
      "pre-widen frames union into post-widen ones by coercion, and " +
      "applyChanges over the whole range equals the table") {
    import spark.implicits._
    val root = tmpRoot("cdf")
    val v1 = seed(root)
    SnapshotTable.widenColumn(spark, root, "k", LongType)
    SnapshotTable.commit( // wide append after the widen
      Seq((3000000021L, 1.5f, BigDecimal(21).setScale(2), "wide"))
        .toDF("k", "m", "amt", "v")
        .select(col("k"), col("m"),
          col("amt").cast("decimal(10,2)").as("amt"), col("v")),
      root, statsCol = Some("k"))
    val (v4, _, _) = SnapshotTable.merge( // touch keys on both sides
      Seq((5L, 99.0f, BigDecimal(5).setScale(2), "updated"),
        (3000000022L, 9.0f, BigDecimal(9).setScale(2), "fresh"))
        .toDF("k", "m", "amt", "v")
        .select(col("k"), col("m"),
          col("amt").cast("decimal(10,2)").as("amt"), col("v")),
      root, "k")
    val feed = SnapshotTable.changeFeed(spark, root, v1, v4)
    assert(feed.schema("k").dataType == LongType,
      "the feed's key must widen by union coercion")
    val folded = SnapshotTable.applyChanges(
      SnapshotTable.readAt(spark, root, v1), feed, "k")
    val table = SnapshotTable.read(spark, root)
    assert(folded.select("k", "v").except(table.select("k", "v")).isEmpty &&
      table.select("k", "v").except(folded.select("k", "v")).isEmpty,
      "fold across the widen must equal the table")
  }

  test("SQL: ALTER COLUMN TYPE widens through the catalog; narrower " +
      "and non-widen retypes refuse; INSERT of wide values lands") {
    val wh = java.nio.file.Files.createTempDirectory("graft_widen_wh")
      .toString
    spark.conf.set("spark.sql.catalog.snapwiden",
      classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.snapwiden.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapwiden.db")
    spark.sql("CREATE TABLE snapwiden.db.w (k INT, m FLOAT, v STRING)")
    spark.sql("INSERT INTO snapwiden.db.w VALUES (1, 0.5, 'a'), (2, 1.5, 'b')")
    spark.sql("ALTER TABLE snapwiden.db.w ALTER COLUMN k TYPE BIGINT")
    spark.sql("ALTER TABLE snapwiden.db.w ALTER COLUMN m TYPE DOUBLE")
    val sch = spark.table("snapwiden.db.w").schema
    assert(sch("k").dataType == LongType && sch("m").dataType == DoubleType)
    spark.sql(
      "INSERT INTO snapwiden.db.w VALUES (3000000003, 2.5, 'c')")
    assert(spark.sql(
        "SELECT sum(k) FROM snapwiden.db.w").head().getLong(0) ==
      3000000006L)
    // narrowing: Spark's own analyzer refuses before the catalog runs
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE snapwiden.db.w ALTER COLUMN k TYPE INT"))
    assert(e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"))
    // a retype Spark's upcast check allows but the layer's lattice
    // does not (bigint -> decimal changes the physical representation)
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE snapwiden.db.w ALTER COLUMN k TYPE DECIMAL(20,0)"))
    assert(e2.getMessage.contains("not a lossless widening"))
  }
}
