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
