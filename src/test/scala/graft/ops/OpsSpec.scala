package graft.ops

import graft.SparkSpec

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("table stats: counts, NDVs, and typed bounds agree with direct queries") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val out = graft.queries.OpsQueries.tableStats(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val n = li.count()
    assert(out.keySet == graft.queries.OpsQueries.StatCols.toSet)
    assert(out.values.forall(_.getLong(1) == n), "n_rows on every row")
    assert(out.values.forall(_.getLong(2) == 0L), "no nulls in testdata")
    val rf = out("l_returnflag")
    assert(rf.getLong(3) == li.select("l_returnflag").distinct().count())
    assert(rf.getString(7) == "A" && rf.getString(8) == "R",
      "typed (not lexicographic-after-cast) min/max")
    // tiny-NDV column: the raw estimator is biased high by design; the
    // linear-counting column is the one that recovers the true NDV
    assert(rf.getLong(5) == rf.getLong(3),
      s"ndv_lc ${rf.getLong(5)} should recover exact ${rf.getLong(3)}")
    val ok = out("l_orderkey")
    assert(ok.getLong(3) == li.select("l_orderkey").distinct().count())
    // high-NDV column: the HLL estimate must sit within 3 sigma of exact,
    // and the LC correction is the identity out of the small range
    assert(math.abs(ok.getLong(4) - ok.getLong(3)).toDouble / ok.getLong(3)
      <= 3 * 1.04 / math.sqrt(Sketches.HllBuckets),
      s"hll ${ok.getLong(4)} vs exact ${ok.getLong(3)}")
    assert(ok.getLong(5) == ok.getLong(4), "LC is identity at high NDV")
  }

  test("LSH ANN achieves high recall@5 vs brute force on the embeddings table") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = Similarity.queryVectors(spark, sfDir)
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(spark, emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@5 = $recall (approx found ${approx.size})")
  }

  test("IVF ANN achieves high recall@5 vs brute force") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = Similarity.queryVectors(spark, sfDir)
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(spark, emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@5 = $recall")
    // determinism: same seed, same result
    val again = Similarity.ivfTopK(spark, emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf == again)
  }

  test("brute-force ANN ranks are dense per query and exclude self") {
    val out = Similarity.annBruteForce(spark, sfDir)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    val byQuery = out.groupBy(_._1)
    assert(byQuery.size == 10)
    byQuery.foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to 5), s"ranks for $q")
      assert(!rows.exists(_._2 == q), "self excluded")
    }
  }

  test("centroid assignment: members map to themselves, plan broadcasts") {
    val out = Similarity.annCentroidAssign(spark, sfDir)
    val rows = out.select("vec_id", "centroid_id", "dist2")
      .as[(Long, Long, Double)].collect()
    // each centroid vector is its own nearest centroid at distance 0
    (0L until Similarity.NumCentroids.toLong).foreach { c =>
      val self = rows.find(_._1 == c).get
      assert(self._2 == c && self._3 == 0.0, s"centroid $c: $self")
    }
    // total assignment: every corpus vector appears exactly once
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.length == graft.Tables.embeddings(spark, sfDir).count())
    // scale shape: the corpus is never shuffled for the join — the
    // centroids arrive broadcast
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), s"no broadcast in:\n$plan")
  }

  test("IVF ANN returns empty (not a crash) on an empty corpus") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.Tables.embeddings(spark, sfDir).schema)
    val out = Similarity.ivfTopK(spark, empty, empty, 5)
    assert(out.count() == 0)
  }

  test("language-ID separates real-language prose") {
    assert(TextAnalysis.classifyLanguage(
      "the cat sat on the mat and then went to the market with them") == "en")
    assert(TextAnalysis.classifyLanguage(
      "el gato estaba sentado en la alfombra y luego fue al mercado") == "es")
    assert(TextAnalysis.classifyLanguage(
      "le chat etait assis sur le tapis et il est alle au marche avec") == "fr")
    assert(TextAnalysis.classifyLanguage(
      "die katze sass auf der matte und ging dann mit ihnen zum markt") == "de")
    assert(TextAnalysis.classifyLanguage("") == "und")
  }

  test("fingerprint is stable under edits away from the minimum window") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // same doc with a tail edit — min-window fingerprint usually unchanged
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota CHANGED"),
      (3L, "totally different words everywhere nothing shared at all here now"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(spark, docs)
      .as[(Long, String)].collect().toMap
    assert(fps(1L) != fps(3L))
    assert(fps.values.toSet.size >= 2)
    // determinism
    val again = TextAnalysis.fingerprint(spark, docs).as[(Long, String)].collect().toMap
    assert(fps == again)
    // short docs hash whole-text; same content → same fingerprint
    val short = Seq((7L, "one two"), (8L, "one two")).toDF("doc_id", "text")
    val sfp = TextAnalysis.fingerprint(spark, short).as[(Long, String)].collect().toMap
    assert(sfp(7L) == sfp(8L))
  }

  test("token stats handle empty and whitespace-only text") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "one two,three"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.tokenStats(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(1L)._1 == 0L)
    assert(rows(2L)._1 == 0L)
    assert(rows(3L)._1 == 2L) // "one" and "two,three"
    assert(rows(3L)._2 == 5L) // one, two, ",", thre, e (4-char BPE chunks)
  }

  test("PQ encoding matches a local brute-force quantizer") {
    // dim 16, M=8 subspaces of 2 dims, codebook = vec_ids 0..15
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map(i => i -> Array.fill(16)(rnd.nextFloat()))
    val docs = vecs.toDF("vec_id", "embedding")
    val out = Similarity.pqEncode(docs)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val anchors = vecs.take(16).map { case (i, v) => i -> v.map(_.toDouble) }
    vecs.foreach { case (id, vf) =>
      val v = vf.map(_.toDouble)
      var err = 0.0
      val codes = (0 until 8).map { s =>
        val best = anchors.minBy { case (code, av) =>
          val d = (2 * s until 2 * s + 2).map(j => (v(j) - av(j)) * (v(j) - av(j))).sum
          (d, code)
        }
        err += (2 * s until 2 * s + 2)
          .map(j => (v(j) - best._2(j)) * (v(j) - best._2(j))).sum
        best._1
      }
      assert(out(id)._1 == codes.mkString(","), s"codes differ for vec $id")
      assert(math.abs(out(id)._2 - err) < 1e-4, s"recon_err differs for vec $id")
    }
    // codebook members quantize to themselves losslessly
    (0L until 16L).foreach { i =>
      assert(out(i)._1 == Array.fill(8)(i).mkString(","))
      assert(out(i)._2 == 0.0)
    }
  }

  test("BPE pair counts weight distinct words by corpus frequency") {
    // "abab" x3, "ba" x2, "x" x1 (single char -> no pairs)
    val docs = Seq((1L, "abab abab ba"), (2L, "abab ba x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpePairs(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // abab contributes ab x2, ba x1 per occurrence (3 occurrences);
    // ba contributes ba x1 per occurrence (2 occurrences)
    assert(out(("a", "b")) == 6L)
    assert(out(("b", "a")) == 3L + 2L)
    assert(out.size == 2) // "x" yields nothing
  }

  test("unigram LM scoring matches a hand computation") {
    // corpus: tokens a(x3), b(x2), c(x1) -> n=6
    val docs = Seq((1L, "a a b"), (2L, "a b c")).toDF("doc_id", "text")
    val rows = TextAnalysis.unigramLogProb(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def lp(c: Int) = math.log(c / 6.0)
    val exp1 = (2 * lp(3) + lp(2)) / 3
    val exp2 = (lp(3) + lp(2) + lp(1)) / 3
    assert(rows(1L)._1 == 3L)
    assert(math.abs(rows(1L)._2 - exp1) < 1e-4)
    assert(math.abs(rows(2L)._2 - exp2) < 1e-4)
    // fluent doc (common tokens only) scores above the rare-token doc
    assert(rows(1L)._2 > rows(2L)._2)
  }

  test("multimodal decode extracts header metadata and real byte features") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      assert(f.width >= 16 && f.width < 64)
      assert(f.height >= 16 && f.height < 48)
      assert(f.mean_byte_x100 >= 0 && f.mean_byte_x100 <= 25500)
      assert(f.byte_entropy >= 0 && f.byte_entropy <= 8.0)
    }
    // deterministic payloads → deterministic features
    val again = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sfDir)).collect()
    assert(feats.map(_.mean_byte_x100).toSeq == again.map(_.mean_byte_x100).toSeq)
    // corrupt payload → dropped, not crashed
    assert(Multimodal.StubCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("frame sampling slices every Nth fixed-size frame") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val frames = Multimodal.sampleFrames(media, frameSize = 64, stride = 4)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) % 4 == 0, "only every 4th frame kept")
      assert(r.getAs[Array[Byte]](2).length == 64)
    }
  }
}
