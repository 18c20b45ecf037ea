package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r15 optimization round): phase-level timing of the heavy
  * lifecycle gates — attributes each gate's seconds to its library
  * calls (build / churn / maintain / audit / search) so optimization
  * targets the phase that actually costs, not the gate wholesale.
  * Usage: `sbt "runMain graft.R15Prof <gate> [sfDir]"`.
  */
object R15Prof {
  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }
  private def drain(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .appName("r15prof")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // optional session conf overrides for plan/A-B probes:
    // SPARK_GRAFT_CONF="k=v,k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); s.conf.set(k, v)
    })
    // warm like the bench
    SparkEntry.entry(s).write.format("noop").mode("overwrite").save()
    args.headOption.getOrElse("bm25") match {
      case "bm25" => bm25(s, dir)
      case "ann" => ann(s, dir)
      case "readtable" => readtable(s, dir)
      case "sink" => sink(s, dir)
      case "curate" => curate(s, dir)
      case "prefix" => prefix(s, dir)
      case "merge" => mergeProbe(s, dir)
      case "hybrid" =>
        import graft.ops.{Retrieval, Similarity}
        t("bm25TopK") { drain(Retrieval.bm25TopK(
          graft.Tables.documents(s, dir))) }
        t("annIvfPq") { drain(Similarity.annIvfPq(s, dir)) }
        s.sharedState.cacheManager.clearCache()
        System.gc()
        t("hybridIvfPq full") { drain(SparkEntry.queries("ann_hybrid_ivfpq")(s, dir)) }
        s.sharedState.cacheManager.clearCache()
        System.gc()
        t("recallHybrid full") { drain(SparkEntry.queries("ann_recall_hybrid")(s, dir)) }
      case "abeq" =>
        // r16 A/B: eq-delete vs COW maintenance, alternating within one
        // JVM so box drift cancels (the mergeProbe pattern). Full gate
        // runs — build + churn + maintain + audit + search — so the
        // read-side eq debt is priced too, not just the delete.
        val gates = Seq("text_bm25_maintained", "ann_sq8_maintained",
          "stream_bm25_maintain", "stream_ann_maintain")
        (1 to 8).foreach { i =>
          val eq = i % 2 == 1
          s.conf.set("graft.index.maintain.eq", eq.toString)
          val tag = if (eq) "eq " else "cow"
          gates.foreach { g =>
            t(s"$g $tag $i") { drain(SparkEntry.queries(g)(s, dir)) }
            graft.ops.Dedup.clearShared()
            s.sharedState.cacheManager.clearCache()
            s.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(blocking = false))
            System.gc(); Thread.sleep(50)
          }
        }
        s.conf.unset("graft.index.maintain.eq")
      case "plan" =>
        // dump the executed plan of a query without timing it
        val q = args(1)
        val df = SparkEntry.queries(q)(s,
          if (args.length > 2) args(2) else "/root/testdata/sf0.01")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      case other =>
        // any registered query, end-to-end, 3 timed runs
        val fn = SparkEntry.queries(other)
        (1 to 3).foreach { i =>
          t(s"$other run$i") { drain(fn(s, dir)) }
          graft.ops.Dedup.clearShared()
          s.sharedState.cacheManager.clearCache()
          s.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          System.gc(); Thread.sleep(50)
        }
    }
    s.stop()
  }

  private def bm25(s: SparkSession, dir: String): Unit = {
    import graft.sources.SnapshotTable
    import graft.ops.{Bm25Index, Retrieval}
    import org.apache.spark.sql.sources.{GreaterThan, LessThanOrEqual}
    val b = java.nio.file.Files.createTempDirectory("r15_bm25").toString
    val corpusRoot = s"$b/corpus"
    val indexRoot = s"$b/bm25"
    val docs = graft.Tables.documents(s, dir).select("doc_id", "text")
    t("corpus commit") {
      SnapshotTable.commit(docs.repartitionByRange(8, col("doc_id")),
        corpusRoot, statsCol = Some("doc_id"))
    }
    t("buildBm25Index") { Bm25Index.buildBm25Index(s, corpusRoot, indexRoot) }
    val mods = docs.filter(col("doc_id") % 10 === 3)
      .withColumn("text", concat(col("text"), lit(" zzupdatedtoken")))
    val ins = docs.filter(col("doc_id") % 10 === 7)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    t("corpus merge") {
      SnapshotTable.merge(mods.unionByName(ins), corpusRoot, "doc_id")
    }
    t("corpus deleteWhere") {
      SnapshotTable.deleteWhere(s, corpusRoot,
        Seq(GreaterThan("doc_id", 100L), LessThanOrEqual("doc_id", 200L)))
    }
    // r16: the eq-delete maintain runs as one phase (the r15 COW
    // decomposition mirrored internals that no longer exist)
    t("maintainBm25Index") {
      Bm25Index.maintainBm25Index(s, corpusRoot, indexRoot)
    }
    val (nTf, diff) = t("confluenceAudit") {
      Bm25Index.confluenceAudit(s, corpusRoot, indexRoot)
    }
    t("search+drain") {
      drain(Bm25Index.searchBm25Index(s, corpusRoot, indexRoot)
        .withColumn("index_matches_rebuild", lit(if (diff == 0L) 1L else 0L))
        .withColumn("n_tf_rows", lit(nTf)))
    }
  }

  private def ann(s: SparkSession, dir: String): Unit = {
    import graft.sources.SnapshotTable
    import graft.ops.{AnnIndex, Similarity}
    import org.apache.spark.sql.sources.{GreaterThan, LessThanOrEqual}
    val b = java.nio.file.Files.createTempDirectory("r15_ann").toString
    val corpusRoot = s"$b/corpus"
    val indexRoot = s"$b/index"
    val emb = graft.Tables.embeddings(s, dir).select("vec_id", "embedding")
    t("corpus commit") {
      SnapshotTable.commit(emb.repartitionByRange(8, col("vec_id")),
        corpusRoot, statsCol = Some("vec_id"))
    }
    t("buildSq8Index") { AnnIndex.buildSq8Index(s, corpusRoot, indexRoot) }
    val mods = emb.filter(col("vec_id") % 10 === 3)
      .withColumn("embedding", transform(col("embedding"), x => x * lit(2.0f)))
    val ins = emb.filter(col("vec_id") % 10 === 7)
      .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"))
    t("corpus merge") {
      SnapshotTable.merge(mods.unionByName(ins), corpusRoot, "vec_id")
    }
    t("corpus deleteWhere") {
      SnapshotTable.deleteWhere(s, corpusRoot,
        Seq(GreaterThan("vec_id", 100L), LessThanOrEqual("vec_id", 200L)))
    }
    t("maintainSq8Index") { AnnIndex.maintainSq8Index(s, corpusRoot, indexRoot) }
    val (nIdx, diff) = t("confluenceAudit") {
      AnnIndex.confluenceAudit(s, corpusRoot, indexRoot)
    }
    t("search+drain") {
      drain(AnnIndex.searchSq8Index(s, indexRoot,
          Similarity.queryVectors(s, dir), Similarity.DefaultK)
        .withColumn("index_matches_rebuild", lit(if (diff == 0L) 1L else 0L))
        .withColumn("n_index_rows", lit(nIdx)))
    }
  }

  private def curate(s: SparkSession, dir: String): Unit = {
    import graft.ops.{Dedup, TextAnalysis}
    val docs = graft.Tables.documents(s, dir)
    val gated = t("1 gate (gopherKeep fused)") {
      TextAnalysis.gopherKeep(docs).cache()
        .localCheckpoint(eager = true)
    }
    val pairs = t("2a prefixJaccardDocs") {
      Dedup.prefixJaccardDocs(gated).localCheckpoint(eager = true)
    }
    val clusters = t("2b clustersFromPairs (CC)") {
      Dedup.clustersFromPairs(s, pairs).localCheckpoint(eager = true)
    }
    val losers = t("2c canonical election") {
      clusters.join(
          Dedup.canonicalFromLabels(gated, clusters)
            .select(col("cluster").as("canonical"), col("kept_doc")),
          "canonical")
        .filter(col("doc_id") =!= col("kept_doc"))
        .select("doc_id").localCheckpoint(eager = true)
    }
    val deduped = t("2d anti-join survivors") {
      gated.join(losers, Seq("doc_id"), "left_anti")
        .localCheckpoint(eager = true)
    }
    val clean = t("3 decontam (shingles)") {
      val bench = deduped.filter(col("source") === "src0" &&
        col("doc_id") % 20 === 0)
      val benchSh = Dedup.shingles(bench).select("shingle").distinct()
      val contaminated = Dedup.shingles(
          deduped.filter(col("source") =!= "src0"))
        .join(broadcast(benchSh), "shingle")
        .select("doc_id").distinct()
      deduped.join(contaminated, Seq("doc_id"), "left_anti")
        .localCheckpoint(eager = true)
    }
    t("4+5 card/dp/sched joins") {
      val card = clean.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        countDistinct(md5(col("text"))).as("n_unique_texts"))
      val dp = graft.ops.PipelineOps.dpRelease(clean)
        .select(col("source"), col("noise"), col("released"))
      val sched = graft.ops.PipelineOps.epochOrder(clean)
        .groupBy("source").agg(
          count(lit(1)).as("n_sched"),
          countDistinct(col("epoch")).as("n_epochs"),
          sum(col("pos")).as("sched_checksum"))
      drain(card.join(dp, "source").join(sched, "source"))
    }
  }

  private def prefix(s: SparkSession, dir: String): Unit = {
    import graft.ops.Dedup
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.documents(s, dir)
    // A/B: plain cached shingles vs doc_id-pre-partitioned cached
    // shingles (window + verify aggregation then reuse the layout)
    (1 to 4).foreach { rep =>
      val pre = rep % 2 == 0
      val tag = if (pre) "prepart" else "plain  "
      val sh = t(s"$tag shingles + cache $rep") {
        val f0 = Dedup.shingles(docs)
        val f = (if (pre) f0.repartition(col("doc_id")) else f0).cache()
        f.write.format("noop").mode("overwrite").save(); f
      }
      val dfc = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      val byRarity = Window.partitionBy(col("doc_id"))
        .orderBy(col("df"), col("shingle"))
      val whole = Window.partitionBy(col("doc_id"))
      val prefixes = t(s"$tag df+windows $rep") {
        val f = sh.join(dfc, "shingle")
          .withColumn("rank", row_number().over(byRarity))
          .withColumn("n", count(lit(1)).over(whole))
          .filter(col("rank") <= col("n") - expr(s"(n * 80 + 99) div 100") + 1)
          .select(col("doc_id"), col("shingle"), col("n"))
          .cache()
        f.write.format("noop").mode("overwrite").save(); f
      }
      val cands = t(s"$tag self-join $rep") {
        prefixes.as("a")
          .join(prefixes.as("b"),
            col("a.shingle") === col("b.shingle") &&
              col("a.doc_id") < col("b.doc_id") &&
              col("a.n") * 100 >= col("b.n") * 80 &&
              col("b.n") * 100 >= col("a.n") * 80)
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct().localCheckpoint(eager = true)
      }
      t(s"$tag verify $rep") {
        drain(Dedup.verifyJaccard(cands, sh))
      }
      s.sharedState.cacheManager.clearCache()
      System.gc(); Thread.sleep(50)
    }
  }

  /** 3 reps each of the text-corpus merge and the embeddings merge on
    * fresh tables — the shared COW write path most lifecycle gates pay.
    */
  private def mergeProbe(s: SparkSession, dir: String): Unit = {
    import graft.sources.SnapshotTable
    // alternate cache-on/cache-off per rep so box drift cancels
    (1 to 8).foreach { i =>
      val cache = i % 2 == 1
      s.conf.set("graft.snapshot.merge.cache", cache.toString)
      val tag = if (cache) "cached" else "plain "
      val b = java.nio.file.Files.createTempDirectory("r15_mg").toString
      val docs = graft.Tables.documents(s, dir).select("doc_id", "text")
      SnapshotTable.commit(docs.repartitionByRange(8, col("doc_id")),
        s"$b/c", statsCol = Some("doc_id"))
      val mods = docs.filter(col("doc_id") % 10 === 3)
        .withColumn("text", concat(col("text"), lit(" zzupdatedtoken")))
      val ins = docs.filter(col("doc_id") % 10 === 7)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      t(s"docs merge $tag $i") {
        SnapshotTable.merge(mods.unionByName(ins), s"$b/c", "doc_id")
      }
      val emb = graft.Tables.embeddings(s, dir).select("vec_id", "embedding")
      SnapshotTable.commit(emb.repartitionByRange(8, col("vec_id")),
        s"$b/e", statsCol = Some("vec_id"))
      val emods = emb.filter(col("vec_id") % 10 === 3)
        .withColumn("embedding", transform(col("embedding"), x => x * lit(2.0f)))
      val eins = emb.filter(col("vec_id") % 10 === 7)
        .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"))
      t(s"emb merge $tag $i") {
        SnapshotTable.merge(emods.unionByName(eins), s"$b/e", "vec_id")
      }
      s.sharedState.cacheManager.clearCache()
      System.gc(); Thread.sleep(50)
    }
    s.conf.unset("graft.snapshot.merge.cache")
  }

  private def readtable(s: SparkSession, dir: String): Unit = {
    // 3 end-to-end runs of the registered query with phase visibility
    // on the commit half: time the commits alone, then the query
    import graft.sources.SnapshotTable
    val o = graft.Tables.orders(s, dir)
      .select(col("o_orderkey").cast("bigint").as("o_orderkey"),
        col("o_orderstatus"),
        col("o_totalprice").cast("double").as("o_totalprice"))
    val b = java.nio.file.Files.createTempDirectory("r15_rt").toString
    t("commit 60% of orders") {
      SnapshotTable.commit(o.filter(col("o_orderkey") % 10 <= 4), s"$b/t1")
    }
    t("commit 40% of orders") {
      SnapshotTable.commit(
        o.filter(col("o_orderkey") % 10 >= 5 && col("o_orderkey") % 10 <= 8),
        s"$b/t1")
    }
    (1 to 3).foreach { i =>
      t(s"stream_snapshot_readtable $i") {
        drain(SparkEntry.queries("stream_snapshot_readtable")(s, dir))
      }
    }
  }

  private def sink(s: SparkSession, dir: String): Unit = {
    (1 to 3).foreach { i =>
      t(s"stream_snapshot_sink $i") {
        drain(SparkEntry.queries("stream_snapshot_sink")(s, dir))
      }
      t(s"stream_snapshot_totable $i") {
        drain(SparkEntry.queries("stream_snapshot_totable")(s, dir))
      }
    }
  }
}
