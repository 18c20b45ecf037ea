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

  test("definition-context capture: an unqualified body name resolves " +
      "where the AUTHOR sat — the reader's USE state and same-named " +
      "temp views cannot redirect the view") {
    ensure()
    spark.sql(s"CREATE TABLE $cat.db.ctxbase (k BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.ctxbase VALUES (1), (2), (3)")
    val prevCat = spark.sessionState.catalogManager.currentCatalog.name
    try {
      spark.sql(s"USE $cat.db")
      spark.sql("CREATE VIEW ctxv AS SELECT count(*) AS n FROM ctxbase")
    } finally spark.sql(s"USE $prevCat")
    // the reader sits elsewhere AND shadows the base name with a temp
    // view — the stored context must win on both axes
    spark.range(0, 50).toDF("k").createOrReplaceTempView("ctxbase")
    try {
      assert(spark.sql(s"SELECT n FROM $cat.db.ctxv").head.getLong(0) == 3L,
        "view body resolved in the READER's context, not the author's")
    } finally spark.catalog.dropTempView("ctxbase")
    // CTE names inside the body stay lexical — qualification must not
    // rewrite them into (nonexistent) catalog tables
    spark.sql(s"CREATE VIEW $cat.db.ctev AS " +
      s"WITH c AS (SELECT k FROM $cat.db.ctxbase WHERE k >= 2) " +
      "SELECT count(*) AS n FROM c")
    assert(spark.sql(s"SELECT n FROM $cat.db.ctev").head.getLong(0) == 2L)
  }

  test("a persistent view may not capture a TEMP view — refused at " +
      "create and at alter") {
    ensure()
    spark.range(0, 5).toDF("k").createOrReplaceTempView("ephemeral")
    try {
      val e = intercept[Exception](spark.sql(
        s"CREATE VIEW $cat.db.leaky AS SELECT k FROM ephemeral"))
      assert(e.getMessage.contains("TEMP view"), e.getMessage)
    } finally spark.catalog.dropTempView("ephemeral")
  }

  test("ALTER VIEW ... AS replaces the definition IN PLACE: new body " +
      "visible, user properties carried, the view never stops existing") {
    ensure()
    spark.sql(s"CREATE TABLE $cat.db.alt (k BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.alt VALUES (1), (2), (3), (4)")
    spark.sql(s"CREATE VIEW $cat.db.altv " +
      "TBLPROPERTIES ('owner'='curation') " +
      s"AS SELECT count(*) AS n FROM $cat.db.alt")
    assert(spark.sql(s"SELECT n FROM $cat.db.altv").head.getLong(0) == 4L)
    spark.sql(s"ALTER VIEW $cat.db.altv AS " +
      s"SELECT count(*) AS n FROM $cat.db.alt WHERE k >= 3")
    assert(spark.sql(s"SELECT n FROM $cat.db.altv").head.getLong(0) == 2L)
    val c = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[SnapshotCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("db"), "altv")
    assert(c.loadView(ident).properties().get("owner") == "curation",
      "ALTER VIEW ... AS must carry the stored user properties")
    // property changes alter in place through the V2 ViewChange surface
    import org.apache.spark.sql.connector.catalog.ViewChange
    c.alterView(ident, ViewChange.setProperty("tier", "gold"))
    assert(c.loadView(ident).properties().get("tier") == "gold")
    c.alterView(ident, ViewChange.removeProperty("owner"))
    assert(!c.loadView(ident).properties().containsKey("owner"))
    // the body survived the property edits
    assert(spark.sql(s"SELECT n FROM $cat.db.altv").head.getLong(0) == 2L)
  }

  test("a refused CREATE OR REPLACE leaves the existing view standing " +
      "(validate-then-swap, no drop window)") {
    ensure()
    spark.sql(s"CREATE TABLE $cat.db.orr (k BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.orr VALUES (1), (2)")
    spark.sql(s"CREATE VIEW $cat.db.orrv AS " +
      s"SELECT count(*) AS n FROM $cat.db.orr")
    spark.range(0, 9).toDF("k").createOrReplaceTempView("orr_tmp")
    try {
      intercept[Exception](spark.sql(s"CREATE OR REPLACE VIEW " +
        s"$cat.db.orrv AS SELECT k FROM orr_tmp"))
      // the old definition survives the refused replacement
      assert(spark.sql(s"SELECT n FROM $cat.db.orrv").head.getLong(0) == 2L)
    } finally spark.catalog.dropTempView("orr_tmp")
    // a VALID replacement swaps in place
    spark.sql(s"CREATE OR REPLACE VIEW $cat.db.orrv AS " +
      s"SELECT count(*) AS n FROM $cat.db.orr WHERE k >= 2")
    assert(spark.sql(s"SELECT n FROM $cat.db.orrv").head.getLong(0) == 1L)
    // a SELF-REFERENTIAL replacement would validate against the OLD
    // body and then make every read unresolvable — refused up front,
    // through OR REPLACE and ALTER ... AS alike; the view still serves
    val e1 = intercept[Exception](spark.sql(
      s"CREATE OR REPLACE VIEW $cat.db.orrv AS " +
        s"SELECT n FROM $cat.db.orrv"))
    assert(e1.getMessage.contains("itself"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      s"ALTER VIEW $cat.db.orrv AS SELECT n FROM $cat.db.orrv"))
    assert(e2.getMessage.contains("itself"), e2.getMessage)
    assert(spark.sql(s"SELECT n FROM $cat.db.orrv").head.getLong(0) == 1L)
  }

  test("an unqualified body relation under its own AS OF is still " +
      "definition-context-qualified (RelationTimeTravel is a leaf)") {
    ensure()
    spark.sql(s"CREATE TABLE $cat.db.ttq (k BIGINT)") // v1 empty
    spark.sql(s"INSERT INTO $cat.db.ttq VALUES (1), (2)") // v2
    spark.sql(s"INSERT INTO $cat.db.ttq VALUES (3)") // v3
    val prevCat = spark.sessionState.catalogManager.currentCatalog.name
    try {
      spark.sql(s"USE $cat.db")
      spark.sql("CREATE VIEW ttqv AS " +
        "SELECT count(*) AS n FROM ttq VERSION AS OF 2")
    } finally spark.sql(s"USE $prevCat")
    // reader shadows the base name — the stored context must still win
    spark.range(0, 50).toDF("k").createOrReplaceTempView("ttq")
    try {
      assert(spark.sql(s"SELECT n FROM $cat.db.ttqv").head.getLong(0) == 2L)
    } finally spark.catalog.dropTempView("ttq")
  }

  test("view time travel: VERSION/TIMESTAMP AS OF on a view pins its " +
      "snapshot-catalog bases; a base's own AS OF in the body wins") {
    ensure()
    spark.sql(s"CREATE TABLE $cat.db.ttb (k BIGINT)") // v1: empty seed
    spark.sql(s"INSERT INTO $cat.db.ttb VALUES (1), (2)") // v2
    val tsAfterV2 = java.time.Instant.now().toString
    Thread.sleep(1100) // manifest mtimes are second-granular on some FS
    spark.sql(s"INSERT INTO $cat.db.ttb VALUES (3)") // v3
    spark.sql(s"CREATE VIEW $cat.db.ttv AS " +
      s"SELECT count(*) AS n FROM $cat.db.ttb")
    assert(spark.sql(s"SELECT n FROM $cat.db.ttv").head.getLong(0) == 3L)
    assert(spark.sql(s"SELECT n FROM $cat.db.ttv VERSION AS OF 2")
      .head.getLong(0) == 2L)
    assert(spark.sql(
      s"SELECT n FROM $cat.db.ttv TIMESTAMP AS OF '$tsAfterV2'")
      .head.getLong(0) == 2L)
    // a base pinned INSIDE the body keeps its own pin under an outer
    // travel (the inner AS OF is the author's explicit intent)
    spark.sql(s"CREATE VIEW $cat.db.ttv1 AS " +
      s"SELECT count(*) AS n FROM $cat.db.ttb VERSION AS OF 2")
    assert(spark.sql(s"SELECT n FROM $cat.db.ttv1").head.getLong(0) == 2L)
    assert(spark.sql(s"SELECT n FROM $cat.db.ttv1 VERSION AS OF 3")
      .head.getLong(0) == 2L)
  }
}
