package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** V2 views in the snapshot catalog ([[SnapshotCatalog]] as a Spark
  * `ViewCatalog`): pure-SQL users name governed reads — the view body
  * re-resolves against the catalog on every read, so it always sees
  * the CURRENT snapshot (and keeps every scan optimization: the
  * manifest file skipping rides the same table resolution).
  */
class SnapshotViewSpec extends SparkSpec {

  private lazy val wh =
    java.nio.file.Files.createTempDirectory("graft_view_wh").toString
  private val cat = "viewcat"

  private def ensure(): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
  }

  test("CREATE VIEW / SELECT / SHOW resolution: a view over a snapshot " +
      "table reads the CURRENT snapshot on every reference") {
    ensure()
    spark.sql(s"CREATE TABLE $cat.db.base (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.db.base VALUES (1, 'a'), (2, 'b'), (3, 'a')")
    spark.sql(s"CREATE VIEW $cat.db.av AS " +
      s"SELECT v, count(*) AS n FROM $cat.db.base GROUP BY v")
    val got = spark.sql(s"SELECT * FROM $cat.db.av ORDER BY v")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 2L), ("b", 1L)))
    // the view re-resolves: a later commit is visible through it
    spark.sql(s"INSERT INTO $cat.db.base VALUES (4, 'b')")
    val got2 = spark.sql(s"SELECT * FROM $cat.db.av ORDER BY v")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got2 == Seq(("a", 2L), ("b", 2L)))
    // file pruning still rides the resolution under the view
    spark.sql(s"CREATE VIEW $cat.db.small AS " +
      s"SELECT k FROM $cat.db.base WHERE k <= 2")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.small")
      .head.getLong(0) == 2L)
  }

  test("view lifecycle: duplicate refuses, drop removes, rename moves; " +
      "a view name cannot shadow a table") {
    ensure()
    spark.sql(s"CREATE TABLE $cat.db.t2 (k BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.t2 VALUES (10)")
    spark.sql(s"CREATE VIEW $cat.db.v2 AS SELECT k FROM $cat.db.t2")
    intercept[Exception](
      spark.sql(s"CREATE VIEW $cat.db.v2 AS SELECT k FROM $cat.db.t2"))
    intercept[Exception]( // view name colliding with a table refuses
      spark.sql(s"CREATE VIEW $cat.db.t2 AS SELECT 1 AS x"))
    val c = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[SnapshotCatalog]
    assert(c.listViews("db").map(_.name()).contains("v2"))
    spark.sql(s"ALTER VIEW $cat.db.v2 RENAME TO db.v2r")
    assert(spark.sql(s"SELECT * FROM $cat.db.v2r").head.getLong(0) == 10L)
    spark.sql(s"DROP VIEW $cat.db.v2r")
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.db.v2r").collect())
    // _views never leaks into the namespace listing
    assert(!spark.sql(s"SHOW NAMESPACES IN $cat").collect()
      .map(_.getString(0)).contains("_views"))
  }
}
