package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The manifest NDV stats group ([[SnapshotTable.buildNdvIndex]] /
  * [[SnapshotTable.ndvOf]]) and its consumer, the scan's V2 column
  * statistics:
  *
  *  - per-file registers in the manifest are BIT-EQUAL to the
  *    query-level `hll_regs` aggregate over the same rows, and the
  *    driver-side merge+finalize equals the query-level estimate over
  *    all rows (max is associative);
  *  - honesty: ndvOf withdraws (None) when a rewrite refreshed a file
  *    after the build, and on eq-burdened tables;
  *  - CBO: with the index built, the planner sees the grouping
  *    column's distinct count, estimates the aggregate side small, and
  *    BROADCASTS a join it would otherwise sort-merge — the join-size
  *    decision made from manifest metadata, zero fact scans.
  */
class SnapshotNdvSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ndv").toString

  test("per-file manifest registers equal the query-level hll_regs; " +
      "the driver merge equals the whole-column estimate") {
    val root = s"${tmp()}/t"
    SnapshotTable.commit(
      spark.range(0, 5000).select(col("id").as("k"),
          (col("id") % 97).as("g"))
        .repartitionByRange(4, col("k")),
      root, statsCol = Some("k"))
    SnapshotTable.buildNdvIndex(spark, root, "g")
    val cur = SnapshotTable.currentSnapshot(spark, root)
    // query-level per-file registers over the same canonical strings
    val perFile = SnapshotTable.read(spark, root)
      .select(col("_metadata.file_name").as("f"),
        graft.ops.Sketches.h48(col("g").cast("string")).as("h"))
      .groupBy("f")
      .agg(graft.functions.HllRegsAgg.hll_regs(col("h")).as("reg"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toArray)
      .toMap
    val es = SnapshotTable.entries(spark, root, cur)
      .filterNot(_.isDelete)
    assert(es.nonEmpty)
    es.foreach { e =>
      val manifest = e.ndvRegsFor("g").get.toSeq
      assert(manifest == perFile(e.fileName).toSeq,
        s"register drift on ${e.fileName}")
    }
    // driver merge+finalize == query-level estimate over ALL rows
    val allRegs = SnapshotTable.read(spark, root)
      .select(graft.ops.Sketches.h48(col("g").cast("string")).as("h"))
      .agg(graft.functions.HllRegsAgg.hll_regs(col("h")).as("reg"))
      .head.getSeq[Int](0).toArray
    assert(SnapshotTable.ndvOf(spark, root, cur, "g")
      .contains(graft.ops.Sketches.estimateFromRegs(allRegs)))
  }

  test("the NDV group is MAINTAINED: appends and merges stamp their " +
      "own files (estimate stays defined and exact-to-the-arithmetic); " +
      "explicit disable and eq-burden withdraw honestly") {
    import spark.implicits._
    val root = s"${tmp()}/t"
    SnapshotTable.commit(
      spark.range(0, 1000).select(col("id").as("k"),
        (col("id") % 10).as("g")), root, statsCol = Some("k"))
    SnapshotTable.buildNdvIndex(spark, root, "g")
    val v2 = SnapshotTable.currentSnapshot(spark, root)
    assert(SnapshotTable.ndvOf(spark, root, v2, "g").isDefined)
    // a MERGE rewrites a file; an APPEND adds new values: both commits
    // stamp their own files' registers, so the estimate stays defined
    // and tracks the data — no rebuild
    SnapshotTable.merge(Seq((5L, 99L)).toDF("k", "g"), root, "k")
    SnapshotTable.commit(
      spark.range(2000, 2100).select(col("id").as("k"),
        (col("id") % 1000 + 100).as("g")), root)
    val v4 = SnapshotTable.currentSnapshot(spark, root)
    val est = SnapshotTable.ndvOf(spark, root, v4, "g")
    assert(est.isDefined, "maintained group must survive merge+append")
    // ... and equals the whole-column register arithmetic
    val allRegs = SnapshotTable.read(spark, root)
      .select(graft.ops.Sketches.h48(col("g").cast("string")).as("h"))
      .agg(graft.functions.HllRegsAgg.hll_regs(col("h")).as("reg"))
      .head.getSeq[Int](0).toArray
    assert(est.contains(graft.ops.Sketches.estimateFromRegs(allRegs)))
    // a commit that explicitly DISABLES the group leaves an unstamped
    // file → None (never a silently-partial estimate)
    SnapshotTable.commit(Seq((9000L, 1L)).toDF("k", "g"), root,
      props = Map("stats.ndv.cols" -> ""))
    val v5 = SnapshotTable.currentSnapshot(spark, root)
    assert(SnapshotTable.ndvOf(spark, root, v5, "g").isEmpty)
    // the disable is genuinely ONE-SHOT: the empty value did not
    // poison the carried group — the NEXT commit resumes stamping its
    // own files (the estimate stays None only because v5's file is
    // still register-less, exactly the documented boundary)
    assert(!SnapshotTable.snapshotProps(spark, root, v5)
      .getOrElse("stats.ndv.cols", "").isEmpty,
      "the carried stats.ndv.cols must survive a one-commit disable")
    SnapshotTable.commit(Seq((9100L, 2L)).toDF("k", "g"), root)
    val v6 = SnapshotTable.currentSnapshot(spark, root)
    val v6New = SnapshotTable.entries(spark, root, v6)
      .filterNot(_.isDelete).filter(_.seq == v6)
    assert(v6New.nonEmpty && v6New.forall(_.ndvRegsFor("g").isDefined),
      "post-disable commits must resume stamping registers")
    assert(SnapshotTable.ndvOf(spark, root, v6, "g").isEmpty,
      "estimate stays withdrawn while the skipped file lacks registers")
    // rebuild restores; an eq delete then withdraws again
    SnapshotTable.buildNdvIndex(spark, root, "g")
    assert(SnapshotTable.ndvOf(spark, root,
      SnapshotTable.currentSnapshot(spark, root), "g").isDefined)
    SnapshotTable.deleteByKeysEq(Seq(7L).toDF("k"), root)
    assert(SnapshotTable.ndvOf(spark, root,
      SnapshotTable.currentSnapshot(spark, root), "g").isEmpty)
  }

  test("CONFIGURABLE register count: wider groups estimate tighter, " +
      "maintenance stamps new files at the build's width, and mixed " +
      "widths refuse") {
    val exactN = 40000L
    def errAt(m: Int): Double = {
      val root = s"${tmp()}/t$m"
      SnapshotTable.commit(
        spark.range(0, exactN).select(col("id").as("k")), root)
      SnapshotTable.buildNdvIndex(spark, root, "k", registers = m)
      // maintenance at the SAME width: the append's own files stamp m
      // registers and the estimate stays defined
      SnapshotTable.commit(
        spark.range(exactN, exactN + 500).select(col("id").as("k")), root)
      val cur = SnapshotTable.currentSnapshot(spark, root)
      val est = SnapshotTable.ndvOf(spark, root, cur, "k")
      assert(est.isDefined, s"maintained estimate must survive at m=$m")
      val widths = SnapshotTable.entries(spark, root, cur)
        .filterNot(_.isDelete).flatMap(_.ndvRegsFor("k")).map(_.length)
      assert(widths.distinct == Seq(m),
        s"every file must carry $m registers, saw ${widths.distinct}")
      math.abs(est.get.toDouble - (exactN + 500)) / (exactN + 500)
    }
    val e64 = errAt(64)
    val e1024 = errAt(1024)
    val e4096 = errAt(4096)
    // 1.04/sqrt(m): 64 -> ~13%, 1024 -> ~3.3%, 4096 -> ~1.6%; assert
    // generous bounds (one draw each) plus strict monotone improvement
    // from 64 to the widest
    assert(e1024 < 0.12, s"m=1024 error $e1024")
    assert(e4096 < 0.06, s"m=4096 error $e4096")
    assert(e4096 < math.max(e64, 0.02),
      s"widest must beat the 64-register default: e64=$e64 e4096=$e4096")
    // a second column at a DIFFERENT width refuses (one width per group)
    val root = s"${tmp()}/mix"
    SnapshotTable.commit(
      spark.range(0, 1000).select(col("id").as("k"),
        (col("id") % 50).as("g")), root)
    SnapshotTable.buildNdvIndex(spark, root, "k", registers = 256)
    val e = intercept[IllegalArgumentException](
      SnapshotTable.buildNdvIndex(spark, root, "g", registers = 64))
    assert(e.getMessage.contains("256 registers"), e.getMessage)
    // same width is fine; and rebuilding the ONLY column may change width
    SnapshotTable.buildNdvIndex(spark, root, "g", registers = 256)
    assert(SnapshotTable.ndvOf(spark, root,
      SnapshotTable.currentSnapshot(spark, root), "g").isDefined)
  }

  test("POST-PRUNE column statistics: a file-skipping filter shrinks " +
      "the scan's reported NDV/rows to the SURVIVING files, and the " +
      "pruned aggregate side broadcasts where the table-level estimate " +
      "would not") {
    val base = tmp()
    val factRoot = s"$base/fact"
    val dimRoot = s"$base/dim"
    val payload = md5(col("id").cast("string"))
    // k-clustered fact with g == k: every file holds a DISTINCT g
    // range, so pruning on k shrinks the true g-NDV of the survivors
    SnapshotTable.commit(
      spark.range(0, 60000).select(col("id").as("k"), col("id").as("g"),
          payload.as("p"))
        .repartitionByRange(30, col("k")).sortWithinPartitions("k"),
      factRoot, statsCol = Some("k"))
    SnapshotTable.buildNdvIndex(spark, factRoot, "g")
    SnapshotTable.commit(
      spark.range(0, 60000).select(col("id").as("g"), payload.as("q")),
      dimRoot, statsCol = Some("g"))
    def scanStatsOf(df: org.apache.spark.sql.DataFrame)
        : (Option[Long], Option[Long]) = {
      val scan = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2ScanRelation => r.scan
      }.head
      val st = scan
        .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
        .estimateStatistics()
      import scala.jdk.CollectionConverters._
      val ndv = st.columnStats().asScala.collectFirst {
        case (ref, cs) if ref.describe() == "g" &&
            cs.distinctCount().isPresent => cs.distinctCount().getAsLong
      }
      val rows = if (st.numRows().isPresent) Some(st.numRows().getAsLong)
        else None
      (ndv, rows)
    }
    val fact = spark.read.format("graft-snap").load(factRoot)
    val (fullNdv, _) = scanStatsOf(fact)
    val (prunedNdv, prunedRows) = scanStatsOf(fact.filter(col("k") < 2000))
    assert(fullNdv.exists(_ > 40000L), s"table-level NDV, got $fullNdv")
    assert(prunedNdv.exists(_ < 6000L),
      s"post-prune NDV must fold only the surviving files' registers, " +
        s"got $prunedNdv vs table-level $fullNdv")
    // under a pushed row filter the scan reports the SURVIVORS' row
    // sum — an upper-bound estimate (exactness is impossible once
    // parquet filters inside the files), far tighter than the 60k
    // table total and the number CBO chains into the join sizing below
    assert(prunedRows.exists(_ <= 4200L),
      s"post-prune row estimate must be the survivors' sum, got " +
        s"$prunedRows")
    // the plan-shape consequence: the pruned, grouped fact side is
    // estimated tiny (its NDV bounds the aggregate's output) and
    // BROADCASTS; unpruned, the same join stays sort-merge
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "262144")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val dim = spark.read.format("graft-snap").load(dimRoot)
      def plan(filtered: Boolean): String = {
        val side = if (filtered) fact.filter(col("k") < 2000) else fact
        side.groupBy("g").agg(sum(col("k")).as("s")).join(dim, "g")
          .queryExecution.sparkPlan.toString
      }
      assert(!plan(filtered = false).contains("BroadcastHashJoin"),
        "table-level estimate (60k distinct) must NOT broadcast")
      assert(plan(filtered = true).contains("BroadcastHashJoin"),
        "the stats-pruned aggregate side must broadcast")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
    }
  }

  test("CBO broadcast decision from manifest NDV: the grouped fact " +
      "side broadcasts only once the index tells the planner its " +
      "distinct count") {
    val base = tmp()
    val factRoot = s"$base/fact"
    val dimRoot = s"$base/other"
    // both sides well past the (lowered) broadcast threshold by SIZE
    val payload = md5(col("id").cast("string"))
    SnapshotTable.commit(
      spark.range(0, 60000).select(col("id").as("k"),
        (col("id") % 16).as("g"), payload.as("p")), factRoot,
      statsCol = Some("g"))
    SnapshotTable.commit(
      spark.range(0, 60000).select((col("id") % 16).as("g"),
        payload.as("q")), dimRoot, statsCol = Some("g"))
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      def plan(): String = {
        val agg = spark.read.format("graft-snap").load(factRoot)
          .groupBy("g").agg(sum(col("k")).as("s"))
        val joined = agg.join(
          spark.read.format("graft-snap").load(dimRoot), "g")
        joined.queryExecution.sparkPlan.toString
      }
      assert(!plan().contains("BroadcastHashJoin"),
        "without NDV stats both sides exceed the size threshold")
      SnapshotTable.buildNdvIndex(spark, factRoot, "g")
      assert(plan().contains("BroadcastHashJoin"),
        "with the index, CBO estimates the 16-group aggregate tiny " +
          "and must broadcast it")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
    }
  }

  test("downfoldRegs is EXACT: folding a wide register array equals " +
      "the native narrow build over the same rows, at every nesting " +
      "step") {
    val hashes = spark.range(0, 20000)
      .select(graft.ops.Sketches.h48(col("id").cast("string")).as("h"))
    def regsAt(m: Int): Array[Int] = hashes
      .agg(graft.functions.HllRegsAgg.hll_regs(col("h"), m).as("reg"))
      .head.getSeq[Int](0).toArray
    val wide = regsAt(4096)
    Seq(1024, 256, 64, 16).foreach { m =>
      assert(graft.ops.Sketches.downfoldRegs(wide, m).toSeq ==
        regsAt(m).toSeq, s"downfold 4096 -> $m drifted from native")
      // folding is transitive through intermediate widths
      assert(graft.ops.Sketches.downfoldRegs(
        graft.ops.Sketches.downfoldRegs(wide, 1024), m).toSeq ==
        regsAt(m).toSeq, s"transitive downfold -> $m drifted")
    }
    // non-nesting targets refuse
    intercept[IllegalArgumentException](
      graft.ops.Sketches.downfoldRegs(wide, 48))
    intercept[IllegalArgumentException](
      graft.ops.Sketches.downfoldRegs(regsAt(64), 128))
  }

  test("ndvOf stays LIVE across a register-width migration: files " +
      "stamped at mixed widths estimate at the narrow width's error " +
      "band instead of withdrawing") {
    val root = s"${tmp()}/t"
    SnapshotTable.commit(
      spark.range(0, 4000).select(col("id").as("k"),
          (col("id") % 1500).as("g"))
        .repartitionByRange(4, col("k")),
      root, statsCol = Some("k"))
    SnapshotTable.buildNdvIndex(spark, root, "g", registers = 1024)
    // a commit stamped at a DIFFERENT width — the migration state (the
    // carried stats.ndv.m prop overridden for this commit)
    SnapshotTable.commit(
      spark.range(4000, 6000).select(col("id").as("k"),
        (col("id") % 1500 + 1000).as("g")),
      root, props = Map("stats.ndv.m" -> "64"))
    val cur = SnapshotTable.currentSnapshot(spark, root)
    val widths = SnapshotTable.entries(spark, root, cur)
      .filterNot(_.isDelete).flatMap(_.ndvRegsFor("g")).map(_.length)
      .distinct.sorted
    assert(widths == Seq(64, 1024), s"expected a width mix, got $widths")
    // true distinct g over both commits: 0..1499 ∪ 1000..2499 = 2500
    val est = SnapshotTable.ndvOf(spark, root, cur, "g")
    assert(est.isDefined, "mixed widths must estimate, not withdraw")
    val err = math.abs(est.get - 2500L).toDouble / 2500.0
    // 64 registers => ~1.04/sqrt(64) = 13% standard error; allow 3x
    assert(err < 0.40, s"estimate ${est.get} vs exact 2500 (err $err)")
  }
}
