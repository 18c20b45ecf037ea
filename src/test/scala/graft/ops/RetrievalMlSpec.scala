package graft.ops

import graft.SparkSpec

/** Known-answer and structural checks for the retrieval (BM25 / RRF)
  * and exact-ML (Cramer least squares / batch perceptron) families.
  */
class RetrievalMlSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 ranks the full-match duplicate above the partial match, ties by doc_id") {
    // doc 0 is the query doc (doc_id < QueryDocs); doc 20 repeats its
    // text exactly (same score -> id tiebreak), doc 21 matches 2 of 4
    // terms, doc 22 matches none and must be absent
    val docs = Seq(
      (0L, "apple banana cherry date"),
      (20L, "apple banana cherry date"),
      (21L, "apple banana kiwi kiwi"),
      (22L, "melon fig plum grape")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs)
      .select("query_id", "doc_id", "n_terms", "rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(out.map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((0L, 4L, 1), (20L, 4L, 2), (21L, 2L, 3)))
    assert(out.forall(_._1 == 0L))
  }

  test("bm25 on the fixture corpus: dense ranks, positive fixed-point scores") {
    val out = Retrieval.bm25Query(spark, sfDir)
      .select("query_id", "doc_id", "score_fp", "rank")
      .as[(Long, Long, Long, Int)].collect()
    assert(out.nonEmpty)
    assert(out.forall(_._3 > 0L))
    val byQ = out.groupBy(_._1)
    assert(byQ.size == Retrieval.QueryDocs)
    byQ.values.foreach { rs =>
      assert(rs.map(_._4).sorted.toSeq == (1 to rs.length).toSeq)
      assert(rs.length <= Retrieval.TopK)
    }
  }

  test("hybrid rrf fuses both arms with integer rank arithmetic") {
    val out = Retrieval.hybridRrf(spark, sfDir)
      .select("query_id", "doc_id", "lex_rank", "vec_rank", "rrf_fp", "rank")
      .as[(Long, Long, Long, Long, Long, Int)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, _, lex, vec, fp, rank) =>
      assert(rank >= 1 && rank <= Retrieval.FuseK)
      assert(lex >= 0 && lex <= Retrieval.TopK)
      assert(vec >= 0 && vec <= Similarity.DefaultK)
      val expect =
        (if (lex == 0) 0L else 1000000L / (Retrieval.RrfK + lex)) +
          (if (vec == 0) 0L else 1000000L / (Retrieval.RrfK + vec))
      assert(fp == expect)
      assert(lex > 0 || vec > 0)
    }
  }

  test("linregExact recovers y = 1 + 2x exactly on a known triple") {
    val li = Seq((1.0, 0.03), (2.0, 0.05), (3.0, 0.07))
      .toDF("l_quantity", "l_extendedprice")
    val r = MlOps.linregExact(li).collect().head
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[String]("sx") == "6")
    assert(r.getAs[String]("sy") == "15")
    assert(r.getAs[String]("sxx") == "14")
    assert(r.getAs[String]("sxy") == "34")
    assert(r.getAs[String]("det") == "6")
    assert(r.getAs[String]("beta0_num") == "6")
    assert(r.getAs[String]("beta1_num") == "12")
    assert(r.getAs[Double]("beta0") == 1.0)
    assert(r.getAs[Double]("beta1") == 2.0)
  }

  test("perceptron replays the hand-computed 2-doc trajectory") {
    // en doc: x = (1, 3, 2, 1) y = +1; zh doc: x = (1, 2, 1, 0) y = -1
    val docs = Seq(
      (0L, "a 1", "en", 3L),
      (1L, "bb", "zh", 2L)).toDF("doc_id", "text", "lang", "n_chars")
    val out = MlOps.perceptron(docs)
      .as[(Int, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1, 0L, 1L, 1L, 1L, 2L),
      (2, -1L, -1L, 0L, 1L, 1L),
      (3, 0L, 2L, 2L, 2L, 1L)))
  }

  test("naive bayes replays the hand-computable 2-doc LLR") {
    val docs = Seq(
      (0L, "a a", "en"),
      (1L, "b", "zh")).toDF("doc_id", "text", "lang")
    val out = MlOps.naiveBayes(docs)
      .as[(Long, Long, Int, Int)].collect().sortBy(_._1)
    // vocab = {a, b}, tot_en = 2, tot_ot = 1, prior = ln(1/1) = 0
    val llrA = math.round((math.log(3.0 / 4) - math.log(1.0 / 3)) * 1000000)
    val llrB = math.round((math.log(1.0 / 4) - math.log(2.0 / 3)) * 1000000)
    assert(out.toSeq == Seq(
      (0L, 2 * llrA, 1, 1),   // two occurrences of 'a', en-positive
      (1L, llrB, 0, 0)))
  }

  test("naive bayes on the fixture corpus beats the majority-class baseline") {
    val out = MlOps.naiveBayes(Tables_documents)
      .as[(Long, Long, Int, Int)].collect()
    assert(out.length == Tables_documents.count())
    val acc = out.count(r => r._3 == r._4).toDouble / out.length
    val majority = out.map(_._4).sum.toDouble / out.length
    // resubstitution accuracy must at least clear predicting all-en
    assert(acc >= majority, s"acc $acc vs majority $majority")
  }

  test("auc report handles ties by midrank: hand case 7/8") {
    // pairs: pos(2) vs neg(1) win, pos(2) vs neg(2) tie=0.5,
    // pos(3) beats both -> AUC = 3.5/4 = 0.875
    val scored = Seq((1L, 0), (2L, 1), (2L, 0), (3L, 1))
      .toDF("llr_fp", "is_en")
    val r = MlOps.aucReport(scored, "llr_fp", "is_en").collect().head
    assert(r.getAs[Long]("n_pos") == 2L)
    assert(r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Long]("auc_num") == 7L)
    assert(r.getAs[Long]("auc_den") == 8L)
    assert(r.getAs[Double]("auc") == 0.875)
  }

  test("dp release: noise follows the two-sided geometric it claims") {
    // 10k single-doc sources => 10k independent noise draws; the
    // mechanism's mean (0) and variance (2a/(1-a)^2, a = e^-1 => 1.842)
    // must show up empirically, not just plumb through
    val docs = (0 until 10000).map(i => (i.toLong, s"src$i"))
      .toDF("doc_id", "source")
    val noise = PipelineOps.dpRelease(docs)
      .select("noise").as[Long].collect().map(_.toDouble)
    assert(noise.length == 10000)
    val mean = noise.sum / noise.length
    val variance = noise.map(x => (x - mean) * (x - mean)).sum / noise.length
    assert(math.abs(mean) < 0.06, s"mean $mean")
    assert(variance > 1.5 && variance < 2.2, s"variance $variance")
    // and the release is non-negative + deterministic
    val rel = PipelineOps.dpRelease(docs.repartition(13))
      .select("source", "released").as[(String, Long)].collect().toMap
    val rel2 = PipelineOps.dpRelease(docs)
      .select("source", "released").as[(String, Long)].collect().toMap
    assert(rel == rel2)
    assert(rel.values.forall(_ >= 0))
  }

  test("calibration bins: llr 0 lands mid-bin at 0.5, p=1 clamps to bin 9") {
    val scored = Seq((0L, 1), (0L, 0), (20000000L, 1))
      .toDF("llr_fp", "is_en")
    val out = MlOps.calibrationReport(scored, "llr_fp", "is_en")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (5L, 2L, 1L, 500000L, 500000L),   // two p=0.5 docs, one positive
      (9L, 1L, 1L, 1000000L, 1000000L)))  // saturated sigmoid clamps
  }

  test("linregMulti recovers the plane y = 1 + 2*x1 + 3*x2 exactly") {
    // (x1, x2, y cents): perfect fit, so Cramer ratios are exact integers
    val li = Seq(
      (1.0, 0.01, 0.06), (2.0, 0.01, 0.08),
      (1.0, 0.02, 0.09), (3.0, 0.02, 0.13))
      .toDF("l_quantity", "l_discount", "l_extendedprice")
    val r = MlOps.linregMulti(li).collect().head
    assert(r.getAs[Double]("beta0") == 1.0)
    assert(r.getAs[Double]("beta1") == 2.0)
    assert(r.getAs[Double]("beta2") == 3.0)
    // numerators are det-multiples: b0n/det = 1 etc., det nonzero
    assert(BigInt(r.getAs[String]("det")) != 0)
    assert(BigInt(r.getAs[String]("beta1_num")) ==
      2 * BigInt(r.getAs[String]("det")))
  }

  test("streamed linreg accumulates across micro-batches to the exact batch fit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pts = Seq((1.0, 0.03), (2.0, 0.05), (3.0, 0.07), (4.0, 0.09))
    val mem = MemoryStream[(Double, Double)]
    val in = mem.toDF().toDF("l_quantity", "l_extendedprice")
    val name = "linreg_sink"
    val q = MlOps.linregSums(in).writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName(name).start()
    try {
      mem.addData(pts.take(2)); q.processAllAvailable()
      mem.addData(pts.drop(2)); q.processAllAvailable()
    } finally q.stop()
    val streamed = MlOps.linregFinalize(spark.table(name))
      .collect().head.toSeq
    spark.catalog.dropTempView(name)
    val batch = MlOps.linregExact(
      pts.toDF("l_quantity", "l_extendedprice")).collect().head.toSeq
    assert(streamed == batch)
    // y = 0.01 + 0.02x exactly: beta checks the fit is the true one
    assert(streamed(8) == 1.0 && streamed(9) == 2.0)
  }

  test("perceptron epoch deltas are sums: order/partitioning independent") {
    val docs = Tables_documents
    val a = MlOps.perceptron(docs).collect().map(_.toSeq).toSet
    val b = MlOps.perceptron(docs.repartition(7)).collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  private def Tables_documents =
    graft.Tables.documents(spark, sfDir)

  test("boostedStumps replays the hand-computed doubling trajectory and fixes the single stump") {
    // f=1..6, y=1,1,0,0,1,1: every single threshold errs on 2 rows
    // (stump1 ties -> t=1, predicts all-1, misses f=3,4). Doubling the
    // misses drives stump2 to t=2 (f<=2 -> 1 else 0; misses 5,6) and
    // stump3 to t=4 (f<=4 -> 0 else 1; misses 1,2) — and the majority
    // of the three classifies all 6 rows correctly. Hand-verified
    // weighted prefix sums; the exact trajectory is the point.
    val labeled = Seq((1L, 1L), (2L, 1L), (3L, 0L), (4L, 0L), (5L, 1L),
      (6L, 1L)).toDF("f", "y")
    val out = MlOps.boostedStumps(labeled).head()
    assert(out.getLong(0) == 1L && out.getLong(1) == 2L) // t1, err1
    assert(out.getLong(2) == 2L && out.getLong(3) == 2L) // t2, err2_w
    assert(out.getLong(4) == 4L && out.getLong(5) == 2L) // t3, err3_w
    assert((out.getLong(6), out.getLong(7), out.getLong(8),
      out.getLong(9)) == ((4L, 0L, 2L, 0L))) // tp fp tn fn: perfect
    assert(out.getDouble(10) == 1.0)
  }

  test("decisionStumpW with unit weights equals decisionStump") {
    val labeled = Seq((10L, 1L), (20L, 0L), (30L, 1L), (40L, 0L))
      .toDF("f", "y")
    val a = MlOps.decisionStump(labeled).head().toSeq
    val b = MlOps.decisionStumpW(labeled.withColumn("w",
      org.apache.spark.sql.functions.lit(1L))).head().toSeq
    assert(a == b)
  }

  test("ridge at lambda=0 is OLS; positive lambda shrinks the coefficient norm") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val ols = MlOps.linregMulti(li).head()
    val ols0 = MlOps.linregMulti(li, 0L).head()
    assert(ols.toSeq == ols0.toSeq)
    val ridge = MlOps.linregMulti(li, MlOps.RidgeLambda).head()
    def norm2(r: org.apache.spark.sql.Row) = {
      val (b1, b2) = (r.getDouble(14), r.getDouble(15))
      b1 * b1 + b2 * b2
    }
    // the penalized-coefficient norm is monotone non-increasing in
    // lambda (standard ridge property), and the fit must actually move
    assert(norm2(ridge) <= norm2(ols))
    assert(ridge.getString(9) != ols.getString(9)) // det changed
  }

  test("knnClassify votes the majority label, ties to the smaller label") {
    // holdout=2 -> even ids are queries, odd ids train. Query 0 along
    // +x: nearest odd vectors are 1,3 (label 7) and 5 (label 9) -> 7
    // wins 2-1 with k=3. Query 2 along +y: neighbors 7,9 (label 9) and
    // 1 (label 7)... build so a 1-1 k=2 tie breaks to the SMALLER label.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 7),
      (2L, Array(0.0f, 1.0f), 9),
      (1L, Array(0.9f, 0.1f), 7), // cos~1 to q0
      (3L, Array(0.8f, 0.2f), 7),
      (5L, Array(0.7f, 0.3f), 9),
      (7L, Array(0.1f, 0.9f), 9), // cos~1 to q2
      (9L, Array(0.2f, 0.8f), 8)
    ).toDF("vec_id", "embedding", "label")
    val out = MlOps.knnClassify(emb, k = 3, holdout = 2)
      .select("query_id", "true_label", "pred_label", "n_votes", "correct")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // q0 true=7: top-3 = ids 1,3 (7) + 5 (9) -> pred 7, correct
    assert(out(0) == ((0L, 7L, 7L, 2L, 1L)))
    // q2 true=9: top-3 = ids 7 (9), 9 (8), 5 (9) -> pred 9 with 2 votes
    assert(out(1) == ((2L, 9L, 9L, 2L, 1L)))
  }

  test("knnClassify vote tie breaks to the smaller label") {
    // k=2: query 0 sees one label-5 and one label-3 neighbor at the top
    // -> 1-1 tie, pred must be 3 (smaller), marking the query wrong
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 5),
      (1L, Array(0.99f, 0.01f), 5),
      (3L, Array(0.98f, 0.02f), 3),
      (5L, Array(-1.0f, 0.0f), 5)
    ).toDF("vec_id", "embedding", "label")
    val out = MlOps.knnClassify(emb, k = 2, holdout = 2)
      .select("query_id", "pred_label", "n_votes", "correct")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 3L, 1L, 0L)))
  }

  test("ml_knn_classify on the fixture: one row per held-out id, correct flag consistent") {
    val out = MlOps.knnQuery(spark, sfDir)
      .select("query_id", "true_label", "pred_label", "correct")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.map(_._1).distinct.length == out.length)
    assert(out.forall(r => r._1 % MlOps.KnnHoldout == 0))
    assert(out.forall(r => (r._4 == 1L) == (r._2 == r._3)))
  }
}
