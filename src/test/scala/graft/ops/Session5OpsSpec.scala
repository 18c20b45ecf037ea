package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.UnicodeNormExpr.unicode_norm

/** Round-8 session-5 additions: unicode normalization and deletion
  * propagation.
  */
class Session5OpsSpec extends SparkSpec {
  import spark.implicits._

  test("unicode_norm NFC recomposes, NFD decomposes, NFKC folds compatibility forms") {
    // "café" with a DECOMPOSED final e + combining acute (U+0301), plus a
    // compatibility ligature ﬁ (U+FB01) and fullwidth digit １ (U+FF11)
    val decomposed = "café ﬁle １"
    val out = Seq(decomposed).toDF("s")
      .select(
        length(col("s")).as("raw"),
        length(unicode_norm(col("s"), "NFC")).as("nfc"),
        unicode_norm(col("s"), "NFC").as("nfc_s"),
        unicode_norm(col("s"), "NFKC").as("nfkc_s"),
        length(regexp_replace(unicode_norm(col("s"), "NFD"), "\\p{Mn}", ""))
          .as("stripped"))
      .head()
    assert(out.getAs[Int]("raw") == 11) // e+mark counted separately
    assert(out.getAs[Int]("nfc") == 10) // recomposed é is one codepoint
    assert(out.getAs[String]("nfc_s") == "café ﬁle １")
    // NFKC additionally expands the ligature and de-widths the digit
    assert(out.getAs[String]("nfkc_s") == "café file 1")
    // NFD + strip marks drops the accent entirely
    assert(out.getAs[Int]("stripped") == 10)
  }

  test("unicode_norm agrees between codegen and interpreted eval, null-safe") {
    val df = Seq(Some("ábc"), Some("plain"), None).toDF("s")
    val normed = df.select(unicode_norm(col("s"), "NFC").as("n"))
      .as[Option[String]].collect().toSet
    assert(normed == Set(Some("ábc"), Some("plain"), None))
    // interpreted path (eval) through a filter that disables codegen fusion
    val viaSql = {
      graft.functions.GraftFunctions.register(spark)
      df.createOrReplaceTempView("u5")
      spark.sql("SELECT unicode_norm(s, 'NFC') FROM u5 WHERE s IS NOT NULL")
        .as[String].collect().toSet
    }
    assert(viaSql == Set("ábc", "plain"))
  }

  test("kAnonymity partitions rows exactly into suppressed and published") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 10:30:00")
    // 6 rows in class (click, hour 10, band 0): published at k=5;
    // 2 rows in class (click, hour 11, band 0): suppressed;
    // 1 row in (view, hour 10, band 1): suppressed
    val rows =
      (0 until 6).map(i => (i.toLong, ts0, 1L, "click", 1.00)) ++
        Seq(
          (6L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 2L, "click", 1.00),
          (7L, java.sql.Timestamp.valueOf("2024-01-01 11:59:00"), 3L, "click", 2.00),
          (8L, ts0, 4L, "view", 7.77))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val audit = PipelineOps.kAnonymity(ev)
      .select("event_type", "n_classes", "suppressed_classes",
        "suppressed_rows", "published_rows", "max_class_size")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(audit("click") == ((2L, 1L, 2L, 6L, 6L)))
    assert(audit("view") == ((1L, 1L, 1L, 0L, 1L)))
  }

  test("covisitation caps user history and ranks neighbors by co-count") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // users 1 and 2 both visit items {10, 11}; user 2 also visits 12;
    // user 3 is a "bot" visiting CovisitCap + 5 items ONCE each — the
    // cap keeps its 20 lowest item ids (all visit counts tie)
    val rows =
      Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (2L, 12L)) ++
        (0 until GraphOps.CovisitCap + 5).map(i => (3L, 100L + i))
    val ev = rows.zipWithIndex.map { case ((u, item), i) =>
      (i.toLong, ts0, u, "view", s"""{"k": $item}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "props")
    val out = GraphOps.covisitation(ev)
      .select("item_a", "item_b", "n_users", "rank")
      .as[(Long, Long, Long, Int)].collect()
    // (10, 11) seen by both users 1 and 2 — rank 1 for item 10
    assert(out.contains((10L, 11L, 2L, 1)))
    assert(out.contains((10L, 12L, 1L, 2)))
    // bot pairs exist but only within the capped 20-item window: no
    // pair may involve the 5 highest item ids (119 < b <= 124 cut)
    val botPairs = out.filter(_._1 >= 100L)
    assert(botPairs.nonEmpty)
    assert(botPairs.forall { case (a, b, _, _) => a <= 119L && b <= 119L })
  }

  test("hits ranks the fan-out node top hub and the fan-in node top authority") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    // user u walks item 5 → 6, 5 appearing before each target builds
    // edges 5→6, 5→7, 5→8 (hub 5); users 1-3 each walk x→10 (authority
    // 10 via edges 1→10, 2→10, 3→10)
    val walks = Seq(
      (100L, Seq(5L, 6L)), (101L, Seq(5L, 7L)), (102L, Seq(5L, 8L)),
      (103L, Seq(1L, 10L)), (104L, Seq(2L, 10L)), (105L, Seq(3L, 10L)))
    val ev = walks.flatMap { case (u, items) =>
      items.zipWithIndex.map { case (item, i) =>
        (u * 10 + i, t(i), u, "view", s"""{"k": $item}""")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "props")
    val out = GraphOps.hits(ev)
      .select("node", "hub_fp", "auth_fp")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // node 5 is the unique top hub, node 10 the unique top authority
    val topHub = out.maxBy(_._2._1)
    val topAuth = out.maxBy(_._2._2)
    assert(topHub._1 == 5L && topAuth._1 == 10L)
    // pure sources have zero authority; pure sinks zero hub
    assert(out(5L)._2 == 0L && out(10L)._1 == 0L)
    // the integer renorm x div (max div 1e6 + 1) lands the leader in
    // [5e5, 1e6] (here max = 3e6 → divisor 4 → exactly 750000)
    assert(topHub._2._1 > 500000L && topAuth._2._2 > 500000L)
  }

  test("dedupCanonical elects the longest doc per cluster, bytes audited") {
    // independent recomputation: fold the cluster and length maps in
    // plain Scala and compare against the Spark aggregation
    val clusters = Dedup.dedupClusters(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    val chars = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars").cast("long"))
      .as[(Long, Long)].collect().toMap
    val expected = clusters.groupBy(_._2).map { case (canon, members) =>
      val ids = members.keys.toSeq
      val kept = ids.maxBy(id => (chars(id), -id))
      canon -> ((ids.size.toLong, kept, ids.map(chars).sum - chars(kept)))
    }
    val out = Dedup.dedupCanonical(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == expected)
    assert(out.nonEmpty)
  }

  test("datasetCard reports exact volume, language, and dup statistics") {
    val docs = Seq(
      (0L, "alpha beta", "en", "s1", 10L),
      (1L, "alpha beta", "en", "s1", 10L), // exact dup of doc 0
      (2L, "gamma", "de", "s1", 5L),
      (3L, "delta", "fr", "s2", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val card = PipelineOps.datasetCard(docs)
      .select("source", "n_docs", "total_chars", "n_langs", "avg_chars",
        "max_chars", "n_en", "n_unique_texts")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(card("s1") == (("s1", 3L, 25L, 2L, 8L, 10L, 2L, 2L)))
    assert(card("s2") == (("s2", 1L, 5L, 1L, 5L, 5L, 0L, 1L)))
  }

  test("zstd parquet files carry the codec suffix and round-trip exactly") {
    val li = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity")
    val dir = java.nio.file.Files.createTempDirectory("zstd_spec").toString
    li.write.mode("overwrite").option("compression", "zstd").parquet(dir)
    val files = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty &&
      files.forall(_.getName.endsWith(".zstd.parquet")),
      s"expected .zstd.parquet files, got ${files.map(_.getName).toSeq}")
    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    assert(back.agg(sum("l_orderkey")).head.getLong(0) ==
      li.agg(sum("l_orderkey")).head.getLong(0))
  }

  test("ivfPqTopK agrees with pqSearch ADC on every shared pair") {
    val ivfpq = graft.SparkEntry.queries("ann_ivfpq")(spark, sfDir)
      .select("query_id", "neighbor_id", "adc")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val pq = graft.SparkEntry.queries("ann_pq_search")(spark, sfDir)
      .select("query_id", "neighbor_id", "adc")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(ivfpq.nonEmpty)
    // the composed index scores with the SAME asymmetric distance: any
    // pair both indexes return must carry an identical ADC value
    val shared = ivfpq.keySet intersect pq.keySet
    assert(shared.nonEmpty)
    shared.foreach(k => assert(ivfpq(k) == pq(k), s"adc mismatch at $k"))
    // 10 queries x top-5 with full cells at fixture scale
    assert(ivfpq.keys.map(_._1).toSet.size == 10)
  }

  test("driftChi2 terms match the hand-computed cross-multiplication") {
    def doc(id: Long, len: Long, src: String) = (id, "x", "en", src, len)
    val docs = (
      (0 until 4).map(i => doc(i, 50, "src0")) ++
        (4 until 8).map(i => doc(i, 150, "src0")) ++
        (10 until 16).map(i => doc(i, 50, "src1")) ++
        (16 until 18).map(i => doc(i, 150, "src1")) ++
        (18 until 20).map(i => doc(i, 550, "src1")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = PipelineOps.driftChi2(docs)
      .select("bucket", "o", "e", "chi2_ppm", "new_mass")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4)))).toMap
    // No=10, Ne=8; bucket 0: (6*8-4*10)^2*1e6 div (4*10*8) = 200000
    assert(out(0L) == ((6L, 4L, 200000L, 0L)))
    // bucket 1: (2*8-4*10)^2*1e6 div 320 = 1800000
    assert(out(1L) == ((2L, 4L, 1800000L, 0L)))
    // bucket 5: reference never saw it — no finite term, flagged
    assert(out(5L) == ((2L, 0L, -1L, 1L)))
  }

  test("bloomDecontam has no false negatives: flagged = exact + FP exactly") {
    val out = PipelineOps.bloomDecontam(spark, sfDir)
      .select("source", "n_docs", "bloom_flagged", "exact_contaminated",
        "false_positives")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (src, n, bloom, exact, fp) =>
      // every exactly-contaminated doc is bloom-flagged (Bloom filters
      // cannot miss), so the flag count decomposes exactly
      assert(bloom == exact + fp, s"$src: $bloom != $exact + $fp")
      assert(bloom <= n)
    }
  }

  test("temporalPaths counts only time-respecting in-window 2-hop paths") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    // user walks build transition occurrences (src→dst at the LATER ts):
    //   u1: 1→2 at t10; u2: 2→3 at t40  (within 1h of t10 → path 1→2→3)
    //   u3: 4→2 at t50; but u2's 2→3 at t40 precedes it → NO path 4→2→3
    //   u4: 5→2 at t10; u5: 2→6 at t80 (70min later, beyond 1h → NO path)
    val walks = Seq(
      (1L, Seq((1L, 0), (2L, 10))), (2L, Seq((2L, 30), (3L, 40))),
      (3L, Seq((4L, 45), (2L, 50))), (4L, Seq((5L, 5), (2L, 10))),
      (5L, Seq((2L, 75), (6L, 80))))
    val ev = walks.flatMap { case (u, items) =>
      items.zipWithIndex.map { case ((item, minute), i) =>
        (u * 10 + i, t(minute), u, "view", s"""{"k": $item}""")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "props")
    val out = GraphOps.temporalPaths(ev)
      .select("item", "n_2paths", "n_mid_partners")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // 1→2 (t10) then 2→3 (t40): one in-window path
    // 5→2 (t10) then 2→3 (t40): also in-window — 5 has one path too
    // 4→2 (t50): only 2→6 (t80) follows within 1h → one path from 4
    // 2→6 (t80): nothing follows → 2 has no outgoing temporal path
    assert(out(1L) == ((1L, 1L)))
    assert(out.get(2L).isEmpty)
    assert(out(4L) == ((1L, 1L)))
    assert(out(5L) == ((1L, 1L)))
    assert(out.size == 3)
  }

  test("ivmAgg delta-apply equals the from-scratch recompute") {
    val o = graft.Tables.orders(spark, sfDir)
    val cents = round(col("o_totalprice") * 100).cast("long")
    // full recompute over the merged (post-change) state
    val recompute = o
      .withColumn("op",
        when(col("o_orderkey") % 10 === 3, "D")
          .when(col("o_orderkey") % 10 <= 3, "U"))
      .filter(col("op").isNull || col("op") =!= "D")
      .withColumn("c",
        cents + when(col("op") === "U", 10000L).otherwise(0L))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), sum(col("c")).as("total_cents"))
      .orderBy("o_orderstatus").collect().map(_.toSeq).toSeq
    val ivm = Warehouse.ivmAgg(spark, sfDir)
      .orderBy("o_orderstatus").collect().map(_.toSeq).toSeq
    assert(ivm == recompute)
    assert(ivm.nonEmpty)
  }

  test("forget purges exactly the users whose latest event is an error") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    // user 1: latest is error -> purged (2 events)
    // user 2: error happened but NOT latest -> kept
    // user 3: single error event -> purged
    val ev = Seq(
      (0L, t(0), 1L, "click"),
      (1L, t(5), 1L, "error"),
      (2L, t(0), 2L, "error"),
      (3L, t(9), 2L, "purchase"),
      (4L, t(2), 3L, "error"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val audit = Warehouse.forget(ev)
      .select("event_type", "kept_events", "purged_events", "purged_users")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(audit("click") == ((0L, 1L, 1L)))
    assert(audit("error") == ((1L, 2L, 2L)))
    assert(audit("purchase") == ((1L, 0L, 0L)))
  }
}
