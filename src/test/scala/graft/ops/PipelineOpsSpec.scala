package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
// round-4 additions exercised at the bottom of this suite

class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("gopherKeep == docs ⋈ (gopherRules WHERE pass = 1): the fused " +
      "scan-side gate keeps exactly the join's row set, all columns") {
    val docs = graft.Tables.documents(spark, sfDir)
    val fused = TextAnalysis.gopherKeep(docs)
    assert(fused.columns.toSeq == docs.columns.toSeq,
      "gopherKeep must preserve the input columns verbatim")
    val joined = docs.join(
      TextAnalysis.gopherRules(docs).filter(col("pass") === 1)
        .select("doc_id"), "doc_id")
      .select(docs.columns.map(col): _*)
    assert(fused.exceptAll(joined).count() == 0L)
    assert(joined.exceptAll(fused).count() == 0L)
    assert(fused.count() > 0L, "the sf0.001 fixture must pass some docs")
  }

  test("mixture sampling: per-source rates honored, deterministic") {
    val docs = graft.Tables.documents(spark, sfDir)
    val out = PipelineOps.queries("pipe_mixture")(spark, sfDir)
    val rates = out.select("source", "rate").distinct()
      .as[(String, Double)].collect().toMap
    // rate cycles (idx % 4 + 1)/4 by source index
    rates.foreach { case (src, r) =>
      val idx = src.stripPrefix("src").toInt
      assert(r == (idx % 4 + 1) / 4.0, s"$src rate $r")
    }
    // a rate-1.0 source keeps every document
    val full = rates.collectFirst { case (s, r) if r == 1.0 => s }.get
    assert(out.filter(col("source") === full).count() ==
      docs.filter(col("source") === full).count())
    // pure row function => identical on rerun
    val again = PipelineOps.queries("pipe_mixture")(spark, sfDir)
    assert(out.collect().toSet == again.collect().toSet)
    // realized keep fraction tracks the configured mix (loose bound:
    // 500 docs, binomial noise)
    val kept = out.count().toDouble / docs.count()
    val expected = rates.values.sum / rates.size
    assert(math.abs(kept - expected) < 0.15, s"kept $kept vs $expected")
  }

  test("vocab encode plan: top-V is TakeOrdered, encode join is broadcast") {
    val df = TextAnalysis.vocabEncode(graft.Tables.documents(spark, sfDir))
    df.collect() // AQE: final plan only exists after execution
    val plan = df.queryExecution.executedPlan.toString
    // the vocabulary selection must never be a global sort of the counts
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered in:\n$plan")
    // the encode join must not shuffle the token stream
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("span dedup plan: aggregation is partial+final (map-side combine)") {
    val df = Dedup.duplicatedSpans(graft.Tables.documents(spark, sfDir))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // partial aggregate before the exchange keeps shuffle bytes
    // proportional to distinct spans per partition, not total spans
    assert(plan.contains("HashAggregate"), s"no hash agg in:\n$plan")
    assert("partial_count|partial_min|merge_count".r.findFirstIn(plan).isDefined
      || plan.split("Exchange").head.contains("HashAggregate"),
      s"no map-side partial before exchange in:\n$plan")
  }

  test("new operators return empty (not a crash) on an empty corpus") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.duplicatedSpans(empty).count() == 0)
    assert(TextAnalysis.collocations(empty).count() == 0)
    assert(TextAnalysis.vocabEncode(empty).count() == 0)
  }

  test("vocab encode: rank by count then word, OOV id 0, position order") {
    val docs = Seq(
      (1L, "b b b a a c"),
      (2L, "a b rare")
    ).toDF("doc_id", "text")
    // counts: b=4, a=3, c=1, rare=1 -> vocab (V=2): b=1, a=2
    val out = TextAnalysis.vocabEncode(docs, vocabSize = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((6L, 1L, "1,1,1,2,2,0")))
    assert(out(2L) == ((3L, 1L, "2,1,0")))
  }

  test("span mask: rate near 1/MaskRate, positions sorted and counted consistently") {
    val out = PipelineOps.spanMask(graft.Tables.documents(spark, sfDir))
      .as[(Long, Long, Long, String, Long)].collect()
    assert(out.nonEmpty)
    var tok = 0L; var msk = 0L
    out.foreach { case (id, n, m, posStr, chars) =>
      tok += n; msk += m
      val ps = if (posStr.isEmpty) Seq.empty else posStr.split(",").map(_.toLong).toSeq
      assert(ps.length.toLong == m, s"doc $id list length")
      assert(ps == ps.sorted, s"doc $id positions ordered")
      assert(ps.forall(p => p >= 1 && p <= n), s"doc $id bounds")
      assert(chars >= 0)
    }
    val rate = msk.toDouble / tok
    val expected = 1.0 / PipelineOps.MaskRate
    assert(math.abs(rate - expected) < 0.03, s"mask rate $rate vs $expected")
  }

  test("span mask is identical across repartitionings (resumable shard contract)") {
    val docs = graft.Tables.documents(spark, sfDir)
    val a = PipelineOps.spanMask(docs).collect().map(_.toString).sorted.toSeq
    val b = PipelineOps.spanMask(docs.repartition(7)).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("lang confusion matrix partitions the corpus (cells sum to doc count)") {
    // the synthetic corpus's lang labels are metadata, not prose ground
    // truth, so accuracy is near chance here — classifier QUALITY is
    // covered by the real-prose tests in FunctionsSpec; this asserts the
    // matrix structure
    val cells = graft.queries.TextQueries
      .queries("text_lang_confusion")(spark, sfDir)
      .as[(String, String, Long)].collect()
    assert(cells.map(_._3).sum == graft.Tables.documents(spark, sfDir).count())
    assert(cells.forall(_._3 > 0), "no empty cells are emitted")
    // every labeled language appears as a row
    val labels = graft.Tables.documents(spark, sfDir)
      .select("lang").distinct().as[String].collect().toSet
    assert(cells.map(_._1).toSet == labels)
  }

  test("shuffle-shard: rank is a permutation, shard positions dense, repartition-invariant") {
    val docs = graft.Tables.documents(spark, sfDir)
    val out = PipelineOps.shuffleShard(docs)
      .as[(Long, Long, Long, Long)].collect()
    val n = out.length
    assert(out.map(_._3).sorted.toSeq == (1L to n.toLong),
      "global rank is a permutation")
    out.groupBy(_._2).foreach { case (shard, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (1L to rs.length.toLong),
        s"shard $shard dense")
    }
    val again = PipelineOps.shuffleShard(docs.repartition(5))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(again == out.sorted.toSeq)
  }

  test("weighted sample: exactly k out, weight-biased, plan is TakeOrdered") {
    val docs = graft.Tables.documents(spark, sfDir)
    val out = PipelineOps.weightedSample(docs)
    assert(out.count() == PipelineOps.WeightedSampleK)
    val ws = out.select("w").as[Long].collect()
    assert(ws.forall(w => w >= 1 && w <= PipelineOps.WeightedSampleWCap))
    // priority sampling favors heavy docs: the sample's mean token weight
    // must beat the corpus mean (w/u with uniform u is rank-biased by w)
    val corpusMean = docs
      .select(size(split(trim(col("text")), "\\s+")).cast("double").as("w"))
      .agg(avg(col("w"))).as[Double].head()
    assert(ws.map(_.toDouble).sum / ws.length > corpusMean,
      s"sample mean ${ws.sum / ws.length} vs corpus mean $corpusMean")
    // deterministic: a re-run selects the identical doc set
    val again = PipelineOps.weightedSample(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
    // top-k must plan as TakeOrdered (partial per-partition heads), not
    // a global sort of the corpus
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), plan)
  }

  test("token budget: allocations sum exactly, each within 1 of proportional") {
    val out = PipelineOps.tokenBudget(graft.Tables.documents(spark, sfDir))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val b = PipelineOps.TokenBudget
    assert(out.map(_._4).sum == b, "Hamilton apportionment exhausts the budget")
    val tw = out.map(_._2).sum
    out.foreach { case (src, w, _, alloc, _) =>
      val exact = b.toDouble * w / tw
      assert(math.abs(alloc - exact) < 1.0, s"$src alloc $alloc vs $exact")
    }
  }

  test("epoch order realizes each source's token budget to within one document") {
    val docs = graft.Tables.documents(spark, sfDir)
    val sched = PipelineOps.epochOrder(docs)
    val toks = docs.select(col("doc_id"),
      when(length(trim(col("text"))) === 0, 0L)
        .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
        .as("t"))
    val budget = PipelineOps.tokenBudget(docs)
      .select("source", "alloc").as[(String, Long)].collect().toMap
    val mass = sched.join(toks, "doc_id").groupBy("source")
      .agg(sum(col("t")).as("m")).as[(String, Long)].collect().toMap
    val maxT = toks.agg(max(col("t"))).as[Long].head()
    assert(mass.nonEmpty)
    mass.foreach { case (src, m) =>
      assert(m <= budget(src), s"$src scheduled past its allocation")
      assert(budget(src) - m <= maxT,
        s"$src under-filled by more than one document")
    }
    // positions are dense within each (source, epoch) pass
    val dense = sched.groupBy("source", "epoch")
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"))
      .filter(col("n") =!= col("mx")).count()
    assert(dense == 0)
  }

  test("quality-weighted sample: rate honored per band, floor keeps some junk out") {
    val docs = graft.Tables.documents(spark, sfDir)
    val out = PipelineOps.qualityWeightedSample(docs)
      .as[(Long, String, Int, Int)].collect()
    assert(out.nonEmpty && out.length < docs.count())
    out.foreach { case (_, _, qp, rate) =>
      assert(rate == math.min(20 + qp * 8, 100))
    }
    // deterministic
    val again = PipelineOps.qualityWeightedSample(docs)
      .as[(Long, String, Int, Int)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("ANN recall report agrees with a direct set comparison") {
    val report = graft.queries.OpsQueries.queries("ann_recall_srp")(spark, sfDir)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    val emb = graft.Tables.embeddings(spark, sfDir)
    val q = Similarity.queryVectors(spark, sfDir)
    val exact = Similarity.bruteForceTopK(emb, q, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val srp = Similarity.srpLshTopK(spark, emb, q, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    report.foreach { case (qid, hits) =>
      val direct = exact.filter(_._1 == qid).count(srp.contains)
      assert(hits == direct, s"query $qid: $hits vs $direct")
    }
  }

  test("curate v2: survivors = gate AND sample, with a clean shard assignment") {
    val docs = graft.Tables.documents(spark, sfDir)
    val out = PipelineOps.curateV2(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val gate = TextAnalysis.gopherRules(docs).filter(col("pass") === 1)
      .select("doc_id").as[Long].collect().toSet
    val sample = PipelineOps.qualityWeightedSample(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(out.map(_._1).toSet == (gate & sample), "exactly the intersection")
    assert(out.map(_._3).sorted.toSeq == (1L to out.length.toLong),
      "dense shuffle ranks")
  }

  test("length buckets: pad-to-power-of-two edges and waste, hand-checked") {
    val docs = Seq(
      (1L, "a"),          // 1 tok  → pad 1, waste 0
      (2L, "a b"),        // 2 toks → pad 2, waste 0
      (3L, "a b c"),      // 3 toks → pad 4, waste 1
      (4L, "a b c d e"),  // 5 toks → pad 8, waste 3
      (5L, "a b c d e f g h"), // 8 toks → pad 8, waste 0
      (6L, "  ")          // empty  → pad 1, waste 1
    ).toDF("doc_id", "text")
    val out = PipelineOps.lengthBuckets(docs)
      .select("pad_to", "n_docs", "sum_tokens", "sum_waste", "waste_pct")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out == Map(
      1L -> ((2L, 1L, 1L, 50L)),
      2L -> ((1L, 2L, 0L, 0L)),
      4L -> ((1L, 3L, 1L, 25L)),
      8L -> ((2L, 13L, 3L, 18L))))
  }

  test("LOCF carries each user's latest preceding purchase, null before any") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Relational.q39Locf(spark, sfDir)
      .join(graft.Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts"), col("value")), "event_id")
      .select("user_id", "ts", "event_id", "event_type", "value", "last_purchase")
      .as[(Long, java.sql.Timestamp, Long, String, Double, Option[Double])]
      .collect()
    // fold each user's stream locally and compare the carried value
    rows.groupBy(_._1).foreach { case (_, evs) =>
      var carried: Option[Double] = None
      evs.sortBy(e => (e._2.getTime, e._3)).foreach { e =>
        if (e._4 == "purchase") carried = Some(e._5)
        val want = carried.map(v =>
          BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
        assert(e._6 == want, s"event ${e._3}: got ${e._6}, want $want")
      }
    }
    assert(rows.exists(_._6.isEmpty), "some event precedes any purchase")
    assert(rows.exists(_._6.nonEmpty))
  }

  test("outlierFlags applies the exact cross-multiplied 3-sigma predicate") {
    // 12 zeros + one 13.00: n=13, s=1300, mean=100, population var
    // = (13*1690000 - 1690000)/169; z^2 for the spike = 12 > 9 ->
    // flagged; z^2 for each zero = 1/12 -> not. Exactly one row, with
    // the exact integer numerators.
    val ev = ((1L to 12L).map(i => (i, "t", 0.0)) :+ (13L, "t", 13.0))
      .toDF("event_id", "event_type", "value")
    val out = PipelineOps.outlierFlags(ev)
      .select("event_id", "value_cents", "z2_num", "var_num")
      .as[(Long, Long, String, String)].collect()
    assert(out.toSeq == Seq((13L, 1300L, "243360000", "20280000")))
    // raise the spike's group variance with a second spike: now neither
    // reaches z^2 > 9 (two outliers split the deviation budget)
    val ev2 = ev.unionByName(Seq((14L, "t", 13.0)).toDF(
      "event_id", "event_type", "value"))
    assert(PipelineOps.outlierFlags(ev2).count() == 0L)
  }
}
