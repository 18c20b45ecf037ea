package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 hardening of the snapshot layer:
  *
  *  - [[SnapshotTable.rewriteDeletes]]' equality-delete stats
  *    refutation compares bounds in the TYPED stats domain
  *    ([[SnapshotTable.statDomainBound]]) — a float key's
  *    double-widened file stats no longer wrongly refute ("0.1" vs
  *    "0.10000000149011612" silently resurrected deleted rows) and a
  *    date/timestamp key no longer crashes the "i" comparison;
  *  - rename/drop refuse columns referenced by CHECK constraints
  *    (otherwise every later commit fails at the publish choke point
  *    on the vanished name);
  *  - reserved merge-on-read working column names refuse at commit;
  *  - the forced delete-state broadcasts carry a size guardrail
  *    (`graft.snapshot.delete.broadcast.max.rows`) with a
  *    shuffle-join fallback producing identical rows;
  *  - [[SnapshotTable.deleteByKeys]] — the join-form keyed COW delete
  *    whose key set never visits the driver — equals the
  *    deleteWhere(In) collect form row-for-row and change-feeds like
  *    any delete;
  *  - the `.partitions` / `.files` metadata tables subtract
  *    delete-vector rows and surface NULL (undefined until fold) for
  *    eq-burdened counts, matching rowCount's honesty.
  */
class SnapshotRound13Spec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_r13").toString

  test("rewriteDeletes settles FLOAT-keyed equality deletes: the " +
      "double-widened file stats must not refute the narrow-rendered " +
      "key bound (that silently resurrected deleted rows)") {
    import spark.implicits._
    val root = s"${tmp()}/t"
    SnapshotTable.commit(
      Seq((1L, 0.1f), (2L, 0.7f)).toDF("id", "x").coalesce(1),
      root, statsCol = Some("x"))
    SnapshotTable.deleteByKeysEq(Seq(0.1f).toDF("x"), root)
    // the read path already subtracts correctly
    assert(SnapshotTable.read(spark, root).select("id")
      .as[Long].collect().toSeq == Seq(2L))
    // ... and the FOLD must agree: the file holds 0.1f, so it must be
    // rewritten, the delete entry dropped, and the row stay dead
    SnapshotTable.rewriteDeletes(spark, root)
    val cur = SnapshotTable.currentSnapshot(spark, root)
    assert(!SnapshotTable.entries(spark, root, cur).exists(_.isDelete))
    assert(SnapshotTable.read(spark, root).select("id")
      .as[Long].collect().toSeq == Seq(2L))
    assert(SnapshotTable.rowCount(spark, root, cur).contains(1L))
  }

  test("rewriteDeletes settles DATE-keyed equality deletes (the 'i' " +
      "domain comparison used to crash on the date rendering)") {
    import spark.implicits._
    val root = s"${tmp()}/t"
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-06-15")
    SnapshotTable.commit(
      Seq((1L, d1), (2L, d2)).toDF("id", "day").coalesce(1),
      root, statsCol = Some("day"))
    SnapshotTable.deleteByKeysEq(Seq(d1).toDF("day"), root)
    SnapshotTable.rewriteDeletes(spark, root) // used to throw NFE here
    val cur = SnapshotTable.currentSnapshot(spark, root)
    assert(!SnapshotTable.entries(spark, root, cur).exists(_.isDelete))
    assert(SnapshotTable.read(spark, root).select("id")
      .as[Long].collect().toSeq == Seq(2L))
  }

  test("rewriteDeletes still stats-refutes in the typed domain: a " +
      "float delete band outside every file stays metadata-only") {
    import spark.implicits._
    val root = s"${tmp()}/t"
    SnapshotTable.commit(
      Seq((1L, 0.1f), (2L, 0.7f)).toDF("id", "x").coalesce(1),
      root, statsCol = Some("x"))
    val pre = SnapshotTable.fileList(spark, root,
      SnapshotTable.currentSnapshot(spark, root)).toSet
    SnapshotTable.deleteByKeysEq(Seq(99.5f).toDF("x"), root)
    SnapshotTable.rewriteDeletes(spark, root)
    val cur = SnapshotTable.currentSnapshot(spark, root)
    // refuted: the data file carried VERBATIM (no rewrite happened)
    assert(SnapshotTable.fileList(spark, root, cur).toSet == pre)
    assert(SnapshotTable.read(spark, root).count() == 2L)
  }

  test("renameColumn / dropColumn refuse a column referenced by a " +
      "CHECK constraint; unset re-opens them") {
    import spark.implicits._
    val root = s"${tmp()}/t"
    SnapshotTable.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    SnapshotTable.setTableProps(spark, root,
      Map("constraint.pos" -> "k >= 0"))
    val er = intercept[IllegalArgumentException](
      SnapshotTable.renameColumn(spark, root, "k", "kk"))
    assert(er.getMessage.contains("constraint"), er.getMessage)
    val ed = intercept[IllegalArgumentException](
      SnapshotTable.dropColumn(spark, root, "k"))
    assert(ed.getMessage.contains("constraint"), ed.getMessage)
    // an unconstrained column still renames/drops freely
    SnapshotTable.renameColumn(spark, root, "v", "w")
    // after unset, the rename proceeds and later commits stay healthy
    SnapshotTable.unsetTableProps(spark, root, Seq("constraint.pos"))
    SnapshotTable.renameColumn(spark, root, "k", "kk")
    SnapshotTable.commit(Seq((3L, "c")).toDF("kk", "w"), root)
    assert(SnapshotTable.read(spark, root).count() == 3L)
  }

  test("reserved merge-on-read working column names refuse at the " +
      "commit choke point") {
    import spark.implicits._
    val root = s"${tmp()}/t"
    val e = intercept[IllegalArgumentException](
      SnapshotTable.commit(Seq((1L, 2L)).toDF("k", "__eq_sq"), root))
    assert(e.getMessage.contains("reserved"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      SnapshotTable.commit(Seq((1L, 2L)).toDF("__dv_pos", "v"), root))
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
  }

  test("delete-state broadcast guardrail: past the row threshold the " +
      "anti-joins drop the hint (no forced broadcast in the plan) and " +
      "return identical rows") {
    import spark.implicits._
    val rootDv = s"${tmp()}/dv"
    val rootEq = s"${tmp()}/eq"
    SnapshotTable.commit(spark.range(0, 100).select(
      col("id").as("k"), (col("id") * 2).as("v")), rootDv,
      statsCol = Some("k"))
    SnapshotTable.deleteWhereMor(spark, rootDv,
      Seq(org.apache.spark.sql.sources.LessThan("k", 10L)))
    SnapshotTable.commit(spark.range(0, 100).select(
      col("id").as("k"), (col("id") * 2).as("v")), rootEq,
      statsCol = Some("k"))
    SnapshotTable.upsertEq(
      spark.range(0, 10).select(col("id").as("k"),
        (col("id") * 7).as("v")), rootEq, Seq("k"))
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // isolate the HINT: disable size-based broadcast so the plan
      // shape reflects exactly whether the guardrail kept it
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the DV read plan has exactly one join (the vector anti-join),
      // so operator presence alone identifies the hint's effect
      def dvPlanHasBroadcastAnti: Boolean =
        SnapshotTable.read(spark, rootDv).queryExecution.sparkPlan
          .toString.contains("BroadcastHashJoin")
      spark.conf.unset("graft.snapshot.delete.broadcast.max.rows")
      val hinted = SnapshotTable.read(spark, rootDv)
        .orderBy("k").collect().toSeq
      assert(dvPlanHasBroadcastAnti, "delta-sized debt must broadcast")
      val hintedEq = SnapshotTable.read(spark, rootEq)
        .orderBy("k").collect().toSeq
      spark.conf.set("graft.snapshot.delete.broadcast.max.rows", "0")
      assert(!dvPlanHasBroadcastAnti,
        "past-threshold debt must not force a broadcast")
      assert(SnapshotTable.read(spark, rootDv)
        .orderBy("k").collect().toSeq == hinted)
      assert(SnapshotTable.read(spark, rootEq)
        .orderBy("k").collect().toSeq == hintedEq)
      assert(hinted.size == 90 && hintedEq.size == 100)
      assert(hintedEq.count(_.getLong(1) % 7 == 0) >= 10)
    } finally {
      spark.conf.unset("graft.snapshot.delete.broadcast.max.rows")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
  }

  test("deleteByKeys (join form, no driver key collect) equals " +
      "deleteWhere(In) row-for-row with the same touched/carried " +
      "split, and change-feeds like any delete") {
    import spark.implicits._
    val rootA = s"${tmp()}/a"
    val rootB = s"${tmp()}/b"
    val data = spark.range(0, 400).select(col("id").as("k"),
      (col("id") % 7).as("v")).repartitionByRange(8, col("k"))
      .sortWithinPartitions("k")
    Seq(rootA, rootB).foreach(r =>
      SnapshotTable.commit(data, r, statsCol = Some("k")))
    val keys = Seq(5L, 17L, 100L, 399L)
    val v0 = SnapshotTable.currentSnapshot(spark, rootA)
    val (va, rewrA, carrA) = SnapshotTable.deleteByKeys(
      keys.toDF("k"), rootA, "k")
    val (_, dropB, rewrB, carrB) = SnapshotTable.deleteWhere(spark, rootB,
      Seq(org.apache.spark.sql.sources.In("k",
        keys.map(k => k: Any).toArray)))
    assert(dropB == 0 && rewrA == rewrB && carrA == carrB,
      s"split diverged: join-form ($rewrA, $carrA) vs collect-form " +
        s"($dropB, $rewrB, $carrB)")
    val a = SnapshotTable.read(spark, rootA).orderBy("k").collect().toSeq
    val b = SnapshotTable.read(spark, rootB).orderBy("k").collect().toSeq
    assert(a == b && a.size == 396)
    // a key set provably absent everywhere is a metadata no-op
    val (vNoop, rewr0, _) = SnapshotTable.deleteByKeys(
      Seq(100000L).toDF("k"), rootA, "k")
    assert(vNoop == va && rewr0 == 0)
    // the change feed crosses it as an exact op-D step
    val feed = SnapshotTable.changeFeed(spark, rootA, v0, va)
    assert(feed.filter(col("_op") === "D").select("k")
      .as[Long].collect().toSet == keys.toSet)
    val folded = SnapshotTable.applyChanges(
      SnapshotTable.readAt(spark, rootA, v0), feed, "k")
    assert(folded.orderBy("k").collect().toSeq == a)
  }

  test(".partitions subtracts delete-vector rows per file; eq-burdened" +
      " counts read NULL (undefined until fold) in .partitions and " +
      ".files — rowCount's honesty in the metadata tables") {
    import spark.implicits._
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.r13cat",
      classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.r13cat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS r13cat.db")
    // MoR-vectored partitioned table: per-partition live counts
    val rootM = s"$wh/db/m"
    SnapshotTable.commit(
      Seq((1L, "p"), (2L, "p"), (3L, "q")).toDF("k", "b"),
      rootM, partitionBy = Seq("b"))
    SnapshotTable.deleteWhereMor(spark, rootM,
      Seq(org.apache.spark.sql.sources.EqualTo("k", 1L)))
    val parts = spark.sql(
        "SELECT partition, n_rows FROM r13cat.db.m.partitions")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) -99L else r.getLong(1))).toMap
    assert(parts == Map("b=p" -> 1L, "b=q" -> 1L), s"got $parts")
    // eq-burdened table: counts are UNDEFINED until rewriteDeletes
    val rootE = s"$wh/db/e"
    SnapshotTable.commit(
      Seq((1L, "p"), (2L, "q")).toDF("k", "b"), rootE,
      partitionBy = Seq("b"))
    SnapshotTable.deleteByKeysEq(Seq(1L).toDF("k"), rootE)
    assert(spark.sql("SELECT n_rows FROM r13cat.db.e.partitions")
      .collect().forall(_.isNullAt(0)))
    val files = spark.sql("SELECT path, n_rows FROM r13cat.db.e.files")
      .collect()
    // pre-delete DATA files: undefined; the delete entry itself
    // reports its key count
    assert(files.filter(_.getString(0).startsWith("data/"))
      .forall(_.isNullAt(1)), files.mkString("|"))
    assert(files.filter(_.getString(0).startsWith("deletes/"))
      .forall(_.getLong(1) == 1L))
    // after the fold the counts come back
    SnapshotTable.rewriteDeletes(spark, rootE)
    assert(spark.sql("SELECT sum(n_rows) FROM r13cat.db.e.partitions")
      .head.getLong(0) == 1L)
  }
}
