package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, GraphOps, PipelineOps}

/** Scale probe for the non-sort operator families whose 100 TB claims
  * rest on plan shape: pipe_pack (two-pass sharded prefix sum),
  * graph_pagerank (de-broadcast src-partitioned iteration), and the
  * dedup prefix-join / connected-components path. Times each at 1x,
  * 10x, 100x of the sf0.1 tables (~sf0.1 / sf1 / sf10 equivalents) and
  * prints the curve — linear-ish growth backs the designs, superlinear
  * blowup flags a fix.
  *
  * Inputs scale by unioning SHIFTED copies of the real tables, keeping
  * every distribution while growing structure:
  *  - documents: remapped doc_ids; copy i > 0 rewrites each token with a
  *    copy prefix, so within-copy near-dup structure is preserved
  *    exactly but copies of the same doc share NO shingles (naive text
  *    duplication would plant k-cliques of near-dups and quadratically
  *    inflate the dedup OUTPUT, measuring the wrong thing).
  *  - events: remapped user/event ids AND item ids (rewritten through
  *    the props JSON), so the transition graph grows to k x nodes and
  *    k x edges — structural growth, not just edge-weight inflation.
  *
  * Env knobs: SPARK_GRAFT_SF_DIR (default sf0.1), SCALE_MULTS (default
  * "1,10,100").
  */
object OpScaleProbe {
  def main(a: Array[String]): Unit = {
    // Shuffle partitions SCALE WITH THE DATA, as they would on a real
    // cluster (size partitions to fit executor memory): holding them at
    // 32 while data grows 100x measures fat-partition spill, not the
    // plan. Measured x100 dedup_prefix sweep on this box: 32p=199.6s,
    // 128p=149.0s, 256p=191.8s — the classic spill-vs-task-overhead
    // curve, so the auto-scale caps at 128 on local[32]. SCALE_PARTS
    // overrides for experiments.
    def partsFor(k: Int): Int = sys.env.get("SCALE_PARTS").map(_.toInt)
      .getOrElse(math.max(32, math.min(128, 32 * k / 4)))
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-op-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mults = sys.env.getOrElse("SCALE_MULTS", "1,10,100")
      .split(",").map(_.trim.toInt).toSeq

    val docsBase = Tables.documents(spark, sfDir)
    val evBase = Tables.events(spark, sfDir)
    // strides for disjoint id spaces per copy (one O(1) agg each)
    val docStride = docsBase.agg(max(col("doc_id"))).head.getLong(0) + 1
    val evMax = evBase
      .agg(max(col("user_id")), max(col("event_id")),
        max(get_json_object(col("props"), "$.k").cast("long")))
      .head
    val userStride = evMax.getLong(0) + 1
    val eventStride = evMax.getLong(1) + 1
    val itemStride = evMax.getLong(2) + 1

    def scaledDocs(k: Int): DataFrame =
      (0 until k).map { i =>
        if (i == 0) docsBase
        else docsBase.select(
          (col("doc_id") + lit(i * docStride)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"c${i}_$$1").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)

    def scaledEvents(k: Int): DataFrame =
      (0 until k).map { i =>
        if (i == 0) evBase
        else evBase.select(
          (col("event_id") + lit(i * eventStride)).as("event_id"),
          col("ts"),
          (col("user_id") + lit(i * userStride)).as("user_id"),
          col("event_type"), col("value"),
          when(get_json_object(col("props"), "$.k").isNotNull,
            concat(lit("{\"k\": "),
              (get_json_object(col("props"), "$.k").cast("long") +
                lit(i * itemStride)).cast("string"), lit("}")))
            .otherwise(col("props")).as("props"))
      }.reduce(_ unionByName _)

    // SCALE_OPS=csv prefixes: probe only matching operators (isolation —
    // a 200 s dedup sweep right before a small op bleeds GC into its
    // number; the r7 hll_native x100 first measured 45.5 s after the
    // dedup block and 7.2 s in a cleaner run)
    val onlyOps = sys.env.get("SCALE_OPS")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    def wanted(name: String): Boolean =
      onlyOps.isEmpty || onlyOps.exists(name.startsWith)

    val ordBase = Tables.orders(spark, sfDir)
    val ordMax = ordBase.agg(max(col("o_orderkey")), max(col("o_custkey"))).head
    val (okeyStride, ckeyStride) = (ordMax.getLong(0) + 1, ordMax.getLong(1) + 1)

    // disjoint key spaces per copy: customer histories grow in COUNT, not
    // in length, matching how a real orders table scales
    def scaledOrders(k: Int): DataFrame =
      (0 until k).map { i =>
        if (i == 0) ordBase
        else ordBase.select(
          (col("o_orderkey") + lit(i * okeyStride)).as("o_orderkey"),
          (col("o_custkey") + lit(i * ckeyStride)).as("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
          col("o_orderpriority"))
      }.reduce(_ unionByName _)

    def timed(name: String)(df: => DataFrame): Double = {
      if (!wanted(name)) return 0.0
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      println(f"$name%-20s $dt%8.1f s")
      dt
    }

    // warm scans + JIT once so the 1x numbers aren't first-touch costs
    docsBase.write.format("noop").mode("overwrite").save()
    evBase.write.format("noop").mode("overwrite").save()
    println(s"maxMemory=${Runtime.getRuntime.maxMemory >> 30}g")

    // SCALE_DIAG=1: print the intermediate cardinalities that decide the
    // dedup join's fate (shingles, prefix index, candidate pairs) instead
    // of timing the full pipelines — the blowup localizer
    if (sys.env.get("SCALE_DIAG").contains("1")) {
      mults.foreach { k =>
        val docs = scaledDocs(k)
        val sh = Dedup.shingles(docs)
        val nSh = sh.count()
        val hot = sh.groupBy("shingle").count()
          .agg(max(col("count")), count(lit(1))).head
        val nCand = Dedup.prefixCandidates(docs).count()
        println(s"x$k shingles=$nSh distinct=${hot.getLong(1)} " +
          s"maxBucket=${hot.getLong(0)} candidates=$nCand")
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop()
      return
    }

    mults.foreach { k =>
      spark.conf.set("spark.sql.shuffle.partitions", partsFor(k).toString)
      println(s"== x$k (docs=${5000L * k}-ish, events=${100000L * k}-ish, " +
        s"parts=${partsFor(k)}) ==")
      timed(s"pipe_pack x$k") {
        PipelineOps.packSequences(scaledDocs(k), PipelineOps.PackBudget)
      }
      timed(s"graph_pagerank x$k") { GraphOps.pagerank(scaledEvents(k)) }
      timed(s"dedup_prefix x$k") { Dedup.prefixJaccardDocs(scaledDocs(k)) }
      timed(s"dedup_clusters x$k") {
        Dedup.clustersFromPairs(spark, Dedup.prefixJaccardDocs(scaledDocs(k)))
      }
      // register-build paths only (the exact-NDV reference would dominate
      // and is identical for both): composed two-level groupBy vs the
      // native one-pass TypedImperativeAggregate — token NDV grows ~k
      // because scaled copies rewrite tokens with a copy prefix
      def hllToks = graft.ops.OpUtil.spread(scaledDocs(k))
        .select(col("source"), explode(split(col("text"), " ", -1)).as("tok"))
        .filter(length(col("tok")) > 0)
      timed(s"hll_composed x$k") { graft.ops.Sketches.hllRegisters(hllToks) }
      timed(s"hll_native x$k") {
        hllToks
          .select(col("source"), graft.ops.Sketches.h48(col("tok")).as("h"))
          .groupBy("source")
          .agg(graft.functions.HllRegsAgg.hll_regs(col("h")).as("reg"))
      }
      // same codegen-vs-object-agg question for the KMV family: the
      // udaf(Aggregator) path (Vector insert + encoder per row) vs the
      // window row_number shape the oracle uses (sort shuffle, codegen)
      def kmvIn = hllToks
        .select(col("source"), graft.ops.Sketches.h48(col("tok")).as("h"))
        .distinct()
      timed(s"kmv_udaf x$k") {
        import org.apache.spark.sql.functions.udaf
        val kmv = udaf(new graft.ops.Sketches.KMinValues(
          graft.ops.Sketches.KmvK))
        kmvIn.groupBy("source").agg(kmv(col("h")).as("mins"))
      }
      timed(s"kmv_window x$k") {
        import org.apache.spark.sql.expressions.Window
        kmvIn
          .withColumn("rn", row_number().over(
            Window.partitionBy("source").orderBy("h")))
          .filter(col("rn") <= graft.ops.Sketches.KmvK)
          .groupBy("source").agg(sort_array(collect_list(col("h"))).as("mins"))
      }
      // warehouse family: SCD2 (one window shuffle, sort-dominated) and
      // the CDC MERGE join (batch derived in-plan, same residue rule)
      timed(s"wh_scd2 x$k") { graft.ops.Warehouse.scd2(scaledOrders(k)) }
      timed(s"wh_cdc x$k") {
        val base = scaledOrders(k)
        graft.ops.Warehouse.cdcMerge(base,
          base.filter(col("o_orderkey") % 10 <= lit(3))
            .select(col("o_orderkey"),
              when(col("o_orderkey") % 10 === lit(3), lit("D"))
                .otherwise(lit("U")).as("op"),
              (col("o_totalprice") + lit(100.0)).as("new_price")))
      }
      // retrieval/ML family (round-8 session 2). Scaled docs rewrite
      // tokens with a copy prefix, so: bm25's candidate set stays
      // bounded by the copy-0 query terms' df (the design claim — cost
      // growth should be the linear tf/dl build, not the join); NB's
      // vocabulary and token stream grow ~k; AUC's distinct-score set
      // grows ~k through the sharded prefix sum.
      timed(s"text_bm25 x$k") { graft.ops.Retrieval.bm25TopK(scaledDocs(k)) }
      timed(s"ml_naive_bayes x$k") { graft.ops.MlOps.naiveBayes(scaledDocs(k)) }
      timed(s"ml_auc x$k") {
        graft.ops.MlOps.aucReport(
          graft.ops.MlOps.naiveBayes(scaledDocs(k)), "llr_fp", "is_en")
      }
      // round-8 session 3. The stump's risky dimension is the distinct-
      // threshold cardinality feeding the sharded prefix sum: each order
      // copy shifts its price range into a disjoint band (the copy index
      // is o_orderkey div stride), so |thresholds| grows ~k like a real
      // continuous feature would. Snapshot-asof is one combinable
      // aggregation over a 2.15x-rows changelog; label-prop/modularity
      // graphs grow ~k in nodes AND edges (disjoint item spaces).
      timed(s"ml_stump x$k") {
        graft.ops.MlOps.decisionStump(scaledOrders(k).select(
          (round(col("o_totalprice") * 100).cast("long")
            + (col("o_orderkey") / lit(okeyStride)).cast("long")
              * lit(10000000L)).as("f"),
          when(col("o_orderstatus") === lit("F"), 1L).otherwise(0L).as("y")))
      }
      timed(s"wh_snapshot x$k") {
        graft.ops.Warehouse.snapshotAsOf(
          graft.ops.Warehouse.versionedLog(scaledOrders(k)), asof = 2)
      }
      timed(s"graph_labelprop x$k") {
        graft.ops.GraphOps.labelPropagation(scaledEvents(k))
      }
      timed(s"graph_modularity x$k") {
        graft.ops.GraphOps.modularity(scaledEvents(k))
      }
      // round-8 session 4. k-core/CC-star graphs grow ~k in nodes AND
      // edges like the label-prop probe. kNN holds the TEST fold
      // constant (holdout scales with k) while the corpus grows ~k —
      // the operator's contract is a broadcastable query fold against
      // an arbitrarily large corpus, so the probe measures the
      // corpus-side scan, not a quadratic both-sides blowup.
      timed(s"graph_kcore x$k") {
        graft.ops.GraphOps.kcore(scaledEvents(k))
      }
      timed(s"graph_ccstar x$k") {
        graft.ops.GraphOps.ccStar(scaledEvents(k))
      }
      timed(s"graph_mst x$k") {
        graft.ops.GraphOps.mst(scaledEvents(k))
      }
      timed(s"graph_covisit x$k") {
        graft.ops.GraphOps.covisitation(scaledEvents(k))
      }
      timed(s"graph_hits x$k") {
        graft.ops.GraphOps.hits(scaledEvents(k))
      }
      timed(s"graph_temporal x$k") {
        graft.ops.GraphOps.temporalPaths(scaledEvents(k))
      }
      timed(s"pipe_bloom_decontam x$k") {
        // scaled docs keep source labels, so the bench slice (src0 ∩
        // doc_id%20) and the train side both grow with k
        graft.ops.PipelineOps.bloomDecontamOn(scaledDocs(k))
      }
      timed(s"ml_pca x$k") {
        val embBase = Tables.embeddings(spark, sfDir)
        val vecStride = embBase.agg(max(col("vec_id"))).head.getLong(0) + 1
        val scaled = (0 until k).map { i =>
          if (i == 0) embBase
          else embBase.select(
            (col("vec_id") + lit(i * vecStride)).as("vec_id"),
            col("embedding"), col("label"))
        }.reduce(_ unionByName _)
        graft.ops.Similarity.pcaPower(scaled)
      }
      timed(s"ml_knn x$k") {
        val embBase = Tables.embeddings(spark, sfDir)
        val vecStride = embBase.agg(max(col("vec_id"))).head.getLong(0) + 1
        val scaled = (0 until k).map { i =>
          if (i == 0) embBase
          else embBase.select(
            (col("vec_id") + lit(i * vecStride)).as("vec_id"),
            col("embedding"), col("label"))
        }.reduce(_ unionByName _)
        graft.ops.MlOps.knnClassify(scaled,
          holdout = graft.ops.MlOps.KnnHoldout * k)
      }
      // round-11. Copy-on-write merge, both pruning forms, with the
      // TABLE FIXED and the DELTA growing xk (keys spread across the
      // whole key range, so the touched-file set saturates immediately
      // and the curve isolates the delta-dependent cost): the collect
      // form ships every distinct key to the driver, the join form
      // range-joins keys against the broadcast per-file stats frame —
      // both must stay ~flat because merge cost is touched-files +
      // delta, never delta-squared; the join form additionally holds
      // driver memory at O(files) whatever k does.
      if (wanted("snap_merge")) {
        import graft.sources.SnapshotTable
        Seq(
          ("collect", (u: DataFrame, r: String) =>
            SnapshotTable.merge(u, r, "o_orderkey")),
          ("join", (u: DataFrame, r: String) =>
            SnapshotTable.mergeLarge(u, r, "o_orderkey"))
        ).foreach { case (tag, doMerge) =>
          val root = java.nio.file.Files
            .createTempDirectory(s"graft_snapm_${tag}_x$k").toString + "/t"
          val base = ordBase
            .select("o_orderkey", "o_orderstatus", "o_totalprice")
          SnapshotTable.commit(
            base.repartitionByRange(16, col("o_orderkey")), root,
            statsCol = Some("o_orderkey"))
          val updates = base
            .filter(col("o_orderkey") % lit(math.max(1200 / k, 1)) === 0)
            .withColumn("o_totalprice", lit(0.0))
          val t0 = System.nanoTime()
          val (_, touched, carried) = doMerge(updates, root)
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"snap_merge_$tag%-13s x$k $dt%8.1f s " +
            s"touched=$touched carried=$carried")
          spark.sharedState.cacheManager.clearCache()
        }
      }
      // round-11 session 2. Manifest-metadata scaling: DATA FIXED, the
      // FILE COUNT growing xk (16 -> 1600 files) — the axis that
      // stresses the driver-side skipping machinery itself. (a) the
      // transparent DSv2 pushdown read of a 10% key band must stay
      // ~flat (it opens ~10% of files whatever their count; the
      // per-entry stats test is O(files) driver arithmetic); (b) a 40%
      // key-band DELETE must stay ~flat with dropped ~= 0.4 x files
      // growing xk while rewritten stays O(1) boundary files — the
      // decision is manifest arithmetic, the rewrite cost tracks data
      // volume, never file count.
      if (wanted("snap_meta")) {
        import graft.sources.{SnapshotSource, SnapshotTable}
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_snapmeta_x$k").toString + "/t"
        val base = ordBase.select("o_orderkey", "o_orderstatus", "o_totalprice")
        SnapshotTable.commit(
          base.repartitionByRange(16 * k, col("o_orderkey")), root,
          statsCol = Some("o_orderkey"))
        val hi = base.agg(max(col("o_orderkey"))).head.getLong(0)
        val t0 = System.nanoTime()
        val n = spark.read.format("graft-snap").load(root)
          .filter(col("o_orderkey") >= hi / 2 &&
            col("o_orderkey") < hi * 6 / 10).count()
        val dtRead = (System.nanoTime() - t0) / 1e9
        val (kept, total) = SnapshotSource.lastPrune(root).getOrElse((0, 0))
        val t1 = System.nanoTime()
        val (_, dropped, rewritten, carried) = SnapshotTable.deleteWhere(
          spark, root, Seq(org.apache.spark.sql.sources.LessThan(
            "o_orderkey", hi * 4 / 10)))
        val dtDel = (System.nanoTime() - t1) / 1e9
        println(f"snap_meta_read  x$k $dtRead%8.1f s rows=$n " +
          s"kept=$kept/$total")
        println(f"snap_meta_del   x$k $dtDel%8.1f s dropped=$dropped " +
          s"rewritten=$rewritten carried=$carried")
        // (c) a 10% key-band SQL UPDATE through the row-level COW
        // path: the pushed condition prunes the group scan to the
        // band's files, so the rewrite must track the BAND's data
        // volume (fixed) while carried grows with the file count
        // unique catalog name per k: catalog instances cache by name,
        // so a shared name would pin the first iteration's warehouse
        spark.conf.set(s"spark.sql.catalog.gsnapp$k",
          classOf[graft.sources.SnapshotCatalog].getName)
        spark.conf.set(s"spark.sql.catalog.gsnapp$k.warehouse",
          new java.io.File(root).getParent)
        val filesBefore = SnapshotTable
          .fileList(spark, root, SnapshotTable.currentSnapshot(spark, root))
          .toSet
        val t2 = System.nanoTime()
        spark.sql(s"UPDATE gsnapp$k.t SET o_totalprice = 0.0 WHERE " +
          s"o_orderkey >= ${hi * 7 / 10} AND o_orderkey < ${hi * 8 / 10}")
        val dtUpd = (System.nanoTime() - t2) / 1e9
        val filesAfter = SnapshotTable
          .fileList(spark, root, SnapshotTable.currentSnapshot(spark, root))
          .toSet
        println(f"snap_meta_upd   x$k $dtUpd%8.1f s " +
          s"carried=${filesBefore.intersect(filesAfter).size}/" +
          s"${filesBefore.size}")
        spark.sharedState.cacheManager.clearCache()
      }
      // merge-on-read delete vectors vs file count (orders fixed at
      // sf0.1, file count x1/x10/x100): (a) a 20% key-band MOR delete
      // must stay metadata-priced (whole files drop, ONE boundary file
      // marks — never rewrites) and its fold must rewrite exactly the
      // referenced boundary file at every count; (b) a scattered
      // (stats-blind) MOR delete pays one scan of the table ONCE at
      // delete time, and the vector-subtracting read's overhead over a
      // plain read must stay a broadcast hash probe, flat in file count
      if (wanted("snap_dv")) {
        import graft.sources.SnapshotTable
        import org.apache.spark.sql.sources.LessThan
        val base = ordBase.select("o_orderkey", "o_orderstatus", "o_totalprice")
        val hi = base.agg(max(col("o_orderkey"))).head.getLong(0)
        // (a) band delete + fold on its own table
        val rootA = java.nio.file.Files
          .createTempDirectory(s"graft_snapdv_a_x$k").toString + "/t"
        SnapshotTable.commit(
          base.repartitionByRange(16 * k, col("o_orderkey")), rootA,
          statsCol = Some("o_orderkey"))
        val t0 = System.nanoTime()
        val (_, dropped, marked, carried) = SnapshotTable.deleteWhereMor(
          spark, rootA, Seq(LessThan("o_orderkey", hi * 2 / 10)))
        val dtBand = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val vFold = SnapshotTable.rewriteDeletes(spark, rootA)
        val dtFold = (System.nanoTime() - t1) / 1e9
        val nowFiles = SnapshotTable.fileList(spark, rootA, vFold).size
        println(f"snap_dv_band    x$k $dtBand%8.1f s dropped=$dropped " +
          s"marked=$marked carried=$carried")
        println(f"snap_dv_fold    x$k $dtFold%8.1f s rewrote=" +
          s"${marked} files_now=$nowFiles")
        // (b) scattered delete + read overhead on a fresh table
        val rootB = java.nio.file.Files
          .createTempDirectory(s"graft_snapdv_b_x$k").toString + "/t"
        SnapshotTable.commit(
          base.repartitionByRange(16 * k, col("o_orderkey")), rootB,
          statsCol = Some("o_orderkey"))
        val p10 = base.stat.approxQuantile("o_totalprice", Array(0.1), 0.01)(0)
        val tr0 = System.nanoTime()
        val n0 = SnapshotTable.read(spark, rootB).count()
        val dtRead0 = (System.nanoTime() - tr0) / 1e9
        val t2 = System.nanoTime()
        val (_, _, markedB, _) = SnapshotTable.deleteWhereMor(
          spark, rootB, Seq(LessThan("o_totalprice", p10)))
        val dtScat = (System.nanoTime() - t2) / 1e9
        val t3 = System.nanoTime()
        val n1 = SnapshotTable.read(spark, rootB).count()
        val dtRead1 = (System.nanoTime() - t3) / 1e9
        println(f"snap_dv_scatter x$k $dtScat%8.1f s marked_files=$markedB")
        println(f"snap_dv_read    x$k plain=$dtRead0%.1f s (rows=$n0) " +
          f"vectored=$dtRead1%.1f s (rows=$n1)")
        spark.sharedState.cacheManager.clearCache()
      }
      // round-11 session 4. Incremental view maintenance vs table size:
      // TABLE grows xk (rows AND files), the DELTA stays FIXED (a
      // 1000-key band merge confined to the first copy, so the touched-
      // file set is constant). The maintained refresh (change feed →
      // per-group delta → fold into the view) must stay ~flat — the
      // feed plans O(metadata) and scans only the merge's change frame
      // — while the from-scratch rebuild grows with the table. This is
      // the O(|delta| + |view|) vs O(table) separation the operator's
      // scaladoc claims.
      if (wanted("snap_imv")) {
        import graft.ops.IncrementalView
        import graft.sources.SnapshotTable
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_snapimv_x$k").toString + "/t"
        val scaled = scaledOrders(k)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        SnapshotTable.commit(
          scaled.repartitionByRange(16 * k, col("o_orderkey")), root,
          statsCol = Some("o_orderkey"))
        val view = IncrementalView.build(
          SnapshotTable.readAt(spark, root, 1L),
          Seq("o_orderstatus"), Seq("o_orderkey")).persist()
        view.count() // the standing view: per-group partials, tiny
        val updates = ordBase
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .filter(col("o_orderkey").between(1000, 9000)) // first copy only
          .withColumn("o_totalprice", lit(0.0))
        val nUpd = updates.count()
        val (v2, touched, _) = SnapshotTable.merge(updates, root, "o_orderkey")
        val t0 = System.nanoTime()
        val feed = SnapshotTable.changeFeed(spark, root, 1L, v2)
        val n = IncrementalView.maintain(view, feed,
          Seq("o_orderstatus"), Seq("o_orderkey")).count()
        val dtMaint = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        IncrementalView.build(SnapshotTable.read(spark, root),
          Seq("o_orderstatus"), Seq("o_orderkey")).count()
        val dtRebuild = (System.nanoTime() - t1) / 1e9
        view.unpersist(blocking = false)
        println(f"snap_imv_maint  x$k $dtMaint%8.1f s groups=$n " +
          s"delta=$nUpd touched=$touched")
        println(f"snap_imv_rebuild x$k $dtRebuild%7.1f s")
        spark.sharedState.cacheManager.clearCache()
      }
      // round-11 session 5. Write-audit-publish cost vs table size:
      // TABLE grows xk (rows AND files — so the carried manifest grows
      // too), the staged DELTA stays FIXED. Stage cost is the delta
      // write plus one manifest render (the carried lines are copied
      // verbatim, never re-stat'd); publish is one manifest move —
      // both must stay ~flat while the table grows x100, or the
      // "ingest earns trust off the serving path" claim fails exactly
      // when staging matters.
      if (wanted("snap_wap")) {
        import graft.sources.SnapshotTable
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_snapwap_x$k").toString + "/t"
        val scaled = scaledOrders(k)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        SnapshotTable.commit(
          scaled.repartitionByRange(16 * k, col("o_orderkey")), root,
          statsCol = Some("o_orderkey"))
        val delta = ordBase
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .filter(col("o_orderkey").between(1000, 9000))
          .withColumn("o_orderkey", col("o_orderkey") + 900000000L)
        val nDelta = delta.count()
        val t0 = System.nanoTime()
        SnapshotTable.commitWap(delta, root, "probe")
        val dtStage = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val v2 = SnapshotTable.publishWap(spark, root, "probe")
        val dtPub = (System.nanoTime() - t1) / 1e9
        val files = SnapshotTable.fileList(spark, root, v2).size
        println(f"snap_wap_stage  x$k $dtStage%8.1f s delta=$nDelta " +
          s"carried_files=${files}")
        println(f"snap_wap_publish x$k $dtPub%7.3f s")
        spark.sharedState.cacheManager.clearCache()
      }
      // round-11 session 5. Bin-pack compaction vs table size: the
      // LARGE bulk grows xk (rows AND files), the small-file debt
      // stays FIXED (24 tiny appends). Pack cost must track the SMALL
      // rows — flat — while the large files are carried as manifest
      // lines; a compaction that reads the table would grow xk and
      // fail the operator's own O(small rows) claim.
      if (wanted("snap_binpack")) {
        import graft.sources.SnapshotTable
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_snapbp_x$k").toString + "/t"
        val scaled = scaledOrders(k)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        SnapshotTable.commit(
          scaled.repartitionByRange(16 * k, col("o_orderkey")), root,
          statsCol = Some("o_orderkey"))
        val small = ordBase
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .filter(col("o_orderkey") % 100 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 900000000L)
        (0 until 24).foreach { i =>
          SnapshotTable.commit(
            small.filter((col("o_orderkey") / 100) % 24 === i)
              .coalesce(1), root)
        }
        val nFiles = SnapshotTable.fileList(spark,
          root, SnapshotTable.currentSnapshot(spark, root)).size
        // large files hold ~9k rows at every k (files scale with the
        // bulk), smalls ~60 — a fixed 1000-row threshold splits them
        val minRows = 1000L
        val t0 = System.nanoTime()
        val (_, packed, written) = SnapshotTable.compactSmallFiles(
          spark, root, minRows, targetRows = Long.MaxValue / 2)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"snap_binpack    x$k $dt%8.1f s packed=$packed " +
          s"written=$written carried=${nFiles - packed}")
        spark.sharedState.cacheManager.clearCache()
      }
      // round-11 session 5. Streaming CDC upsert vs table size: the
      // table grows xk (rows AND range-clustered files), each applied
      // batch stays FIXED (a 2001-key band confined to the first
      // copy). Per-batch cost must track touched files + batch — flat
      // — or the "per-minute CDC stream affordable at 100 TB" claim
      // fails exactly where CDC matters.
      if (wanted("snap_upsert")) {
        import graft.sources.{SnapshotStreamSink, SnapshotTable}
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_snapups_x$k").toString + "/t"
        val scaled = scaledOrders(k)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        SnapshotTable.commit(
          scaled.repartitionByRange(16 * k, col("o_orderkey")), root,
          statsCol = Some("o_orderkey"))
        val w = SnapshotStreamSink.upsertWriter(root, "probe", "o_orderkey")
        val batch = ordBase
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .filter(col("o_orderkey").between(1000, 3000)) // first copy
          .withColumn("o_totalprice", lit(1.0))
        val nBatch = batch.count()
        val t0 = System.nanoTime()
        (1 to 3).foreach(i => w(batch, i.toLong))
        val dt = (System.nanoTime() - t0) / 1e9 / 3
        val files = SnapshotTable.fileList(spark, root,
          SnapshotTable.currentSnapshot(spark, root)).size
        println(f"snap_upsert     x$k $dt%8.1f s/batch batch=$nBatch " +
          s"files=$files")
        spark.sharedState.cacheManager.clearCache()
      }

      // round 12 session 2. EQUALITY-DELETE upsert vs table size: the
      // zero-read CDC write ([[SnapshotTable.upsertEq]]) must be FLAT
      // in the table — each batch writes its own files plus a
      // delta-sized key file and reads NOTHING — where the merge-based
      // sink above pays the touched-file read-back. The debt moves to
      // the read (two broadcast probes) and the fold (touched files
      // once): both timed so the trade is priced, not asserted.
      if (wanted("snap_eqdelete")) {
        import graft.sources.SnapshotTable
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_snapeq_x$k").toString + "/t"
        val scaled = scaledOrders(k)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        SnapshotTable.commit(
          scaled.repartitionByRange(16 * k, col("o_orderkey")), root,
          statsCol = Some("o_orderkey"))
        val batch = ordBase
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .filter(col("o_orderkey").between(1000, 3000)) // first copy
          .withColumn("o_totalprice", lit(1.0))
        val nBatch = batch.count()
        val t0 = System.nanoTime()
        (1 to 3).foreach(_ =>
          SnapshotTable.upsertEq(batch, root, Seq("o_orderkey")))
        val dtWrite = (System.nanoTime() - t0) / 1e9 / 3
        val t1 = System.nanoTime()
        val nRead = SnapshotTable.read(spark, root).count()
        val dtRead = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        SnapshotTable.rewriteDeletes(spark, root)
        val dtFold = (System.nanoTime() - t2) / 1e9
        println(f"snap_eqdelete   x$k write=$dtWrite%6.2f s/batch " +
          f"read=$dtRead%6.1f s (rows=$nRead) fold=$dtFold%6.1f s " +
          s"batch=$nBatch")
        spark.sharedState.cacheManager.clearCache()
      }

      // round 12. applyChanges catch-up vs COMMIT COUNT: a consumer
      // resuming after 2*k row-removing commits folds one anti-join +
      // union per commit; the depth barrier (graft.cdf.fold.barrier)
      // localCheckpoints every K steps so plan analysis stays
      // O(barrier) deep however long the feed. The fold must grow
      // ~linearly in commit count (each barrier materializes a
      // state-sized frame) — superlinear growth or a StackOverflow is
      // the unbarriered failure, the BPE fold-arm lesson. The feed is
      // synthetic (the fold consumes only the frame contract) so the
      // axis isolates fold cost from commit I/O; BARRIER_EVERY
      // overrides for K experiments.
      // round 12. Incremental ANN maintenance vs corpus size: the
      // corpus grows xk (disjoint vec_id spaces per copy), the CHURN
      // stays fixed (one merge repricing a 2001-key band of the first
      // copy + inserting 500 shifted vectors, one COW delete of a
      // 101-key band). Maintain must stay ~flat — it prices the churn
      // through the change feed, never the corpus — while the rebuild
      // (buildSq8Index: codebook scan + full quantize) grows with the
      // corpus. The gap IS the reason the index is maintained.
      if (wanted("snap_annmaint")) {
        import graft.ops.AnnIndex
        import graft.sources.SnapshotTable
        import org.apache.spark.sql.sources.{GreaterThan, LessThanOrEqual}
        val embBase = Tables.embeddings(spark, sfDir)
          .select("vec_id", "embedding")
        val embStride = embBase.agg(max(col("vec_id"))).head.getLong(0) + 1
        def scaledEmb(k2: Int): DataFrame =
          (0 until k2).map { i =>
            if (i == 0) embBase
            else embBase.select(
              (col("vec_id") + lit(i * embStride)).as("vec_id"),
              col("embedding"))
          }.reduce(_ unionByName _)
        val b = java.nio.file.Files
          .createTempDirectory(s"graft_annm_x$k").toString
        val corpusRoot = s"$b/corpus"
        val indexRoot = s"$b/index"
        SnapshotTable.commit(
          scaledEmb(k).repartitionByRange(
            math.max(8, 8 * k / 4), col("vec_id")),
          corpusRoot, statsCol = Some("vec_id"))
        val t0 = System.nanoTime()
        AnnIndex.buildSq8Index(spark, corpusRoot, indexRoot)
        val dtBuild = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        // fixed churn, confined to the first copy
        SnapshotTable.merge(
          embBase.filter(col("vec_id").between(1000, 3000))
            .withColumn("embedding",
              transform(col("embedding"), x => x * lit(2.0f)))
            .unionByName(embBase.filter(col("vec_id") < 500)
              .select((col("vec_id") + 900000000L).as("vec_id"),
                col("embedding"))),
          corpusRoot, "vec_id")
        SnapshotTable.deleteWhere(spark, corpusRoot,
          Seq(GreaterThan("vec_id", 500L), LessThanOrEqual("vec_id", 601L)))
        val t1 = System.nanoTime()
        AnnIndex.maintainSq8Index(spark, corpusRoot, indexRoot)
        val dtMaint = (System.nanoTime() - t1) / 1e9
        val nIdx = SnapshotTable.rowCount(spark, indexRoot,
          SnapshotTable.currentSnapshot(spark, indexRoot)).getOrElse(-1L)
        println(f"snap_annmaint   x$k maintain=$dtMaint%8.1f s " +
          f"rebuild=$dtBuild%8.1f s index_rows=$nIdx")
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }

      // round 12. Bloom index build + runtime-refuted read vs corpus
      // size: the build is the documented one-read-only-scan cost
      // (grows with the corpus — an index build, paid once), while an
      // absent-key IN read over the SCATTERED table must stay ~flat:
      // every file refutes from the manifest bloom alone, zero data
      // files open, whatever the table size.
      if (wanted("snap_bloom")) {
        import graft.sources.SnapshotTable
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_snapbl_x$k").toString + "/t"
        val scaled = scaledOrders(k)
          .select(col("o_orderkey"),
            (col("o_custkey") % 4096 * 2).as("ck2"), col("o_totalprice"))
        SnapshotTable.commit(scaled.repartition(partsFor(k)), root,
          statsCol = Some("ck2"))
        val t0 = System.nanoTime()
        SnapshotTable.buildBloomIndex(spark, root, "ck2")
        val dtBuild = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        // absent ODD keys inside every band: bloom-only refutation
        val t1 = System.nanoTime()
        val n = spark.read.format("graft-snap").load(root)
          .filter(col("ck2").isin(101L, 1001L, 2001L, 3001L))
          .count()
        val dtRead = (System.nanoTime() - t1) / 1e9
        val (kept, total) = graft.sources.SnapshotSource.lastPrune(root)
          .getOrElse((-1, -1))
        println(f"snap_bloom      x$k build=$dtBuild%8.1f s " +
          f"absent_read=$dtRead%6.2f s rows=$n kept=$kept/$total")
        spark.sharedState.cacheManager.clearCache()
      }

      if (wanted("snap_cdf_fold")) {
        import graft.sources.SnapshotTable
        sys.env.get("BARRIER_EVERY").foreach(v =>
          spark.conf.set("graft.cdf.fold.barrier", v))
        val nCommits = 2 * k
        val state0 = ordBase
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val nKeys = okeyStride
        val stepFrames = (1 to nCommits).map { c =>
          ordBase.select("o_orderkey", "o_orderstatus", "o_totalprice")
            .filter(col("o_orderkey") % 97 === c % 97)
            .withColumn("o_totalprice", lit(c.toDouble))
            .withColumn("_op", lit("U"))
            .withColumn("_commit", lit(c.toLong))
        }
        val feed = stepFrames.reduce(_ unionByName _)
          .localCheckpoint(eager = true) // isolate fold cost from feed build
        val t0 = System.nanoTime()
        val folded = SnapshotTable.applyChanges(state0, feed, "o_orderkey")
        folded.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"snap_cdf_fold   x$k $dt%8.1f s commits=$nCommits " +
          s"keys=$nKeys barrier=" +
          spark.conf.get("graft.cdf.fold.barrier", "16"))
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
