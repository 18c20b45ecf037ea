package graft.ops

import graft.SparkSpec

/** Sketch semantics: the properties that make each summary trustworthy
  * (the gate only proves cross-engine equality; these prove the sketch
  * contracts themselves).
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("KMV aggregator: merge order never changes the state; k smallest distinct kept") {
    val agg = new Sketches.KMinValues(4)
    val values = Seq(9L, 3L, 3L, 7L, 1L, 8L, 2L, 7L, 5L)
    val sequential = values.foldLeft(agg.zero)(agg.reduce)
    assert(sequential == Seq(1L, 2L, 3L, 5L), s"got $sequential")
    // arbitrary split + merge = same state (map-side partial safety)
    for (cut <- 1 until values.size) {
      val (a, b) = values.splitAt(cut)
      val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      assert(merged == sequential, s"cut at $cut: $merged")
    }
  }

  test("KMV estimate lands within 3 standard errors of the exact count") {
    val out = Sketches.kmvDistinct(graft.Tables.documents(spark, sfDir))
      .select("source", "n_exact", "ndv_est").as[(String, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (src, exact, est) =>
      // KMV relative standard error ~ 1/sqrt(k-2); allow 3 sigma
      val tol = 3.0 / math.sqrt(Sketches.KmvK - 2)
      assert(math.abs(est - exact).toDouble / exact <= tol,
        s"$src: est $est vs exact $exact (tol ${(tol * 100).round}%)")
    }
  }

  test("KMV overlap: union estimate within sketch error, intersection sane") {
    val out = Sketches.kmvOverlap(graft.Tables.documents(spark, sfDir))
      .select("union_est", "inter_est", "exact_union", "exact_inter")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val tol = 3.0 / math.sqrt(Sketches.KmvK - 2)
    out.foreach { case (uEst, iEst, uEx, iEx) =>
      assert(math.abs(uEst - uEx).toDouble / uEx <= tol,
        s"union est $uEst vs $uEx")
      assert(iEst <= uEst, "intersection cannot exceed union")
      // the intersection sample estimator is noisier: just demand the
      // right order of magnitude when the true intersection is large
      if (iEx > uEx / 4)
        assert(iEst > 0 && math.abs(iEst - iEx).toDouble / iEx <= 2 * tol,
          s"inter est $iEst vs $iEx")
    }
  }

  test("HLL: registers bounded by m, estimate within 3 standard errors") {
    val out = Sketches.hllDistinct(graft.Tables.documents(spark, sfDir))
      .select("source", "n_exact", "m_used", "hll_est", "hll_lc")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // raw HLL relative standard error ~ 1.04/sqrt(m); allow 3 sigma
    val m = Sketches.HllBuckets
    val tol = 3.0 * 1.04 / math.sqrt(m)
    out.foreach { case (src, exact, mUsed, est, lc) =>
      assert(mUsed >= 1 && mUsed <= m, s"$src: m $mUsed")
      if (mUsed < m && est <= Sketches.HllLcThreshold) {
        // small-range regime (empty registers left, raw estimate under
        // 2.5m): the EMITTED hll_lc column is the linear-counting
        // estimate m*ln(m/empty) from the shared lookup table, and it —
        // not the high-biased raw estimator — recovers the count
        assert(lc == Sketches.HllLcTable((m - mUsed).toInt - 1),
          s"$src: hll_lc $lc not the table entry for V=${m - mUsed}")
        assert(math.abs(lc - exact).toDouble / exact <= tol,
          s"$src: linear-count $lc vs exact $exact")
      } else {
        // out of the small range the correction is the identity
        assert(lc == est, s"$src: hll_lc $lc != raw $est outside LC range")
        assert(math.abs(est - exact).toDouble / exact <= tol,
          s"$src: est $est vs exact $exact (tol ${(tol * 100).round}%)")
      }
    }
  }

  test("count-min never underestimates, and estimates the heavy hitters tightly") {
    val out = Sketches.countMinTopTokens(graft.Tables.documents(spark, sfDir))
      .select("exact_cnt", "cm_est", "over_err").as[(Long, Long, Long)].collect()
    assert(out.length == Sketches.CmTopK)
    out.foreach { case (exact, est, err) =>
      assert(est >= exact, "count-min is an overestimate by construction")
      assert(err == est - exact)
    }
    // depth-4 sketch over a small corpus: the top tokens should be
    // within 2x of truth (loose, but catches a broken bucket hash)
    assert(out.count { case (e, c, _) => c <= 2 * e } >= Sketches.CmTopK / 2)
  }

  test("AMS F2 estimate is unbiased-ish: within 2/sqrt(rows) relative error here") {
    val out = Sketches.amsF2(graft.Tables.documents(spark, sfDir))
      .select("source", "f2_exact", "ams_est").as[(String, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (src, exact, est) =>
      assert(est > 0, s"$src estimate positive")
      // AMS variance gives rse ~ sqrt(2/rows); allow a loose 3-sigma band
      val tol = 3.0 * math.sqrt(2.0 / Sketches.AmsRows)
      assert(math.abs(est - exact).toDouble / exact <= tol,
        s"$src: est $est vs exact $exact")
    }
  }

  test("streaming KMV equals the batch KMV sketch exactly") {
    val batch = Sketches.kmvDistinct(graft.Tables.documents(spark, sfDir))
      .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
    val stream = graft.streaming.EventStreams.kmvDistinctStream(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(stream == batch)
  }

  test("quantile sketch: one-sided estimate within the 1/16 relative-error bound") {
    val out = Sketches.quantileSketch(graft.Tables.orders(spark, sfDir))
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(out.map(_._1).sorted.toSeq == Sketches.QuantileQs.sorted)
    out.foreach { case (q, n, est, exact, _) =>
      assert(n > 0 && est <= exact, s"q$q: bucket lower bound exceeds exact")
      assert((exact - est).toDouble / exact <= 1.0 / 16 + 1e-9,
        s"q$q: est $est vs exact $exact breaks the bucket-width guarantee")
    }
  }

  test("quantile exact reference: the distributed two-pass cumsum " +
      "(graft.quantile.exact.parts > 1) equals the global-window path " +
      "row-for-row") {
    val plain = Sketches.quantileSketch(graft.Tables.orders(spark, sfDir))
      .as[(Int, Long, Long, Long, Long)].collect().sorted.toSeq
    spark.conf.set("graft.quantile.exact.parts", "7")
    try {
      val dist = Sketches.quantileSketch(graft.Tables.orders(spark, sfDir))
        .as[(Int, Long, Long, Long, Long)].collect().sorted.toSeq
      assert(dist == plain,
        "range-partitioned cumsum must reconstruct the global running sum")
    } finally spark.conf.unset("graft.quantile.exact.parts")
  }

  test("streaming HLL equals the batch HLL sketch exactly") {
    val batch = Sketches.hllDistinct(graft.Tables.documents(spark, sfDir))
      .as[(String, Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val stream = graft.streaming.EventStreams.hllDistinctStream(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(stream == batch)
  }

  test("streaming quantile sketch equals the batch sketch exactly") {
    val batch = Sketches.quantileSketch(graft.Tables.orders(spark, sfDir))
      .as[(Int, Long, Long, Long, Long)].collect().sorted.toSeq
    val stream = graft.streaming.EventStreams
      .quantileSketchStream(spark, sfDir)
      .as[(Int, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(stream == batch)
  }

  test("fixed-point k-means partitions the corpus and is run-deterministic") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val out = Similarity.cmeansFixedPoint(emb)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == (0L until Similarity.FpK.toLong))
    assert(out.map(_._2).sum == emb.count(), "every vector assigned once")
    assert(out.forall(_._2 > 0), "no empty cluster on this fixture")
    val again = Similarity.cmeansFixedPoint(emb)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == again)
  }

  test("fixed-point soft-EM: responsibilities normalize, partitions, " +
      "run-deterministic") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val out = Similarity.gmmFixedPoint(emb)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == (0L until Similarity.FpK.toLong))
    assert(out.map(_._2).sum == emb.count(), "every vector hard-assigned once")
    // soft assignment: every cluster carries responsibility mass, and the
    // total mass is n_points x RespScale up to the per-point integer-div
    // truncation (< K units per point)
    assert(out.forall(_._3 > 0), "soft EM leaves no cluster empty")
    val totalMass = out.map(_._3).sum
    val n = emb.count()
    assert(totalMass <= n * Similarity.GmmRespScale &&
      totalMass >= n * (Similarity.GmmRespScale - Similarity.FpK),
      s"mass $totalMass vs ${n * Similarity.GmmRespScale}")
    val again = Similarity.gmmFixedPoint(emb)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == again)
  }

  test("fixed-cell IVF: dense ranks, no self, recall vs brute force") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = Similarity.queryVectors(spark, sfDir)
    val out = Similarity.ivfFixedTopK(emb, queries, 5)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    assert(out.groupBy(_._1).size == 10)
    assert(!out.exists(r => r._1 == r._2))
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & out.map(r => (r._1, r._2)).toSet).size.toDouble / exact.size
    assert(recall >= 0.4, s"fixed-IVF recall@5 = $recall")
  }

  test("bloom join: zero false negatives; false positives are the overshoot exactly") {
    val out = Sketches.bloomJoinStats(
      graft.Tables.customer(spark, sfDir), graft.Tables.orders(spark, sfDir))
      .select("n_orders", "n_pass", "n_true", "n_false_pos")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (n, pass, truth, fp) =>
      assert(pass >= truth, "a Bloom filter never drops a true member")
      assert(pass - truth == fp, "pass = true members + false positives")
      assert(pass <= n)
    }
    // the filter must actually filter: across all priorities some orders
    // are dropped (non-BUILDING customers exist in the fixture)
    assert(out.map(_._2).sum < out.map(_._1).sum)
  }
}
