package graft.ops

import graft.SparkSpec

/** Validates the dedup family on a synthetic corpus with planted exact
  * and near duplicates (the sfN documents tables have no exact dups, so
  * the interesting paths need fixtures).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // 30 base docs of 100 "words" drawn from a seeded vocabulary, plus:
  //  - doc 100 = exact copy of doc 0
  //  - doc 101 = doc 1 with one word changed (jaccard ~0.94)
  //  - doc 102 = doc 2 with three words changed (jaccard ~0.83)
  //  - doc 103 = fresh unrelated doc
  private lazy val corpus = {
    val rnd = new scala.util.Random(1234)
    val vocab = Array.tabulate(500)(i => s"w$i")
    def doc(): Array[String] = Array.fill(100)(vocab(rnd.nextInt(vocab.length)))
    val base = Array.tabulate(30)(i => (i.toLong, doc()))
    def edit(words: Array[String], edits: Int): Array[String] = {
      val w = words.clone()
      (0 until edits).foreach(k => w(5 + 7 * k) = s"edited$k")
      w
    }
    val extra = Seq(
      (100L, base(0)._2.clone()),
      (101L, edit(base(1)._2, 1)),
      (102L, edit(base(2)._2, 3)),
      (103L, doc()))
    (base.toSeq ++ extra).map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts, keeps min doc_id") {
    val out = Dedup.exactDocs(corpus)
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(out(0L) == 2L) // doc 0 + its copy 100
    assert(!out.contains(100L))
    assert(out(1L) == 1L)
    assert(out.size == corpus.count() - 1)
  }

  test("exact ngram jaccard finds exactly the planted near-dup pairs") {
    val pairs = Dedup.ngramJaccardDocs(corpus)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 100L)), "exact copy pair")
    assert(pairs.contains((1L, 101L)), "1-edit pair")
    assert(pairs.contains((2L, 102L)), "3-edit pair")
    assert(pairs.size == 3, s"no false positives, got $pairs")
  }

  test("soft dedup keeps every copy at ~one copy's total mass per cluster") {
    val rows = Dedup.softDedupDocs(corpus)
      .as[(Long, String, Long, Long)].collect()
    assert(rows.length == corpus.count())
    rows.groupBy(_._2).foreach { case (h, rs) =>
      val n = rs.head._3
      assert(rs.length == n, s"$h: window count disagrees with cluster size")
      val mass = rs.map(_._4).sum
      // 1e6 div n truncates: cluster mass is one copy's worth, minus at
      // most n-1 fixed-point units
      assert(mass <= 1000000L && mass >= 1000000L - (n - 1), s"$h: $mass")
    }
    // the planted exact pair (docs 0 and 100) shares a cluster of 2
    val pair = rows.filter(r => r._1 == 0L || r._1 == 100L)
    assert(pair.map(_._2).distinct.length == 1 && pair.forall(_._3 == 2L))
  }

  test("prefix-filtered join is lossless vs the plain inverted-index join") {
    val plain = Dedup.ngramJaccardDocs(corpus)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    val prefix = Dedup.prefixJaccardDocs(corpus)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    assert(prefix == plain)
  }

  test("minhash error report: estimates track exact jaccard on planted pairs") {
    val rows = Dedup.minhashErrorDocs(corpus)
      .select("doc_a", "doc_b", "n_match", "est_pct", "jaccard")
      .as[(Long, Long, Long, Long, Double)].collect()
    // pair set is exactly the exact-Jaccard pair set (report adds columns)
    val exact = Dedup.prefixJaccardDocs(corpus)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(rows.map(r => (r._1, r._2)).toSet == exact)
    rows.foreach { case (a, b, nMatch, est, j) =>
      assert(nMatch >= 0 && nMatch <= Dedup.MinhashErrK)
      assert(est == nMatch * 100 / Dedup.MinhashErrK)
      // K=32 components on a >= 0.9-jaccard pair: estimator stays in the
      // right half (deterministic given the fixture and md5 family)
      if (j >= 0.9) assert(est >= 50, s"($a,$b) j=$j est=$est")
    }
    assert(rows.nonEmpty)
  }

  test("minhash LSH output equals the exact ground truth") {
    val exact = Dedup.ngramJaccardDocs(corpus)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    val lsh = Dedup.minhashLshDocs(corpus)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    assert(lsh == exact)
  }

  test("cluster canonicalization elects min doc_id per near-dup cluster") {
    val clusters = Dedup.clustersFromPairs(spark, Dedup.ngramJaccardDocs(corpus))
      .as[(Long, Long)].collect().toMap
    assert(clusters == Map(
      0L -> 0L, 100L -> 0L, 1L -> 1L, 101L -> 1L, 2L -> 2L, 102L -> 2L))
  }

  test("simhash finds the exact copy and near-dups, nothing unrelated") {
    val pairs = Dedup.simhashDocs(spark, corpus)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect()
    val byPair = pairs.map(p => ((p._1, p._2), p._3)).toMap
    assert(byPair((0L, 100L)) == 0, "identical docs → identical fingerprints")
    assert(byPair.keySet.forall(p =>
      Set((0L, 100L), (1L, 101L), (2L, 102L)).contains(p)),
      s"unexpected pairs: ${byPair.keySet}")
  }

  test("oversized LSH buckets fall back to hub pairs, not silence") {
    // 70 identical docs (> MaxBucket = 64) + noise: every band bucket for
    // the duplicated text exceeds the cap, so pairwise expansion is off —
    // but hub pairs must still connect every copy, and clustering must
    // recover the full group
    val copies = (0L until 70L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val noise = (100L until 110L).map(i =>
      (i, s"unique$i text totally different from others number$i end$i tail$i"))
    val docs = (copies ++ noise).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshDocs(docs)
    val found = pairs.select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(found.length >= 69, s"hub pairs missing: ${found.length}")
    assert(found.forall { case (a, b) => a < 70 && b < 70 })
    val clusters = Dedup.clustersFromPairs(spark, pairs)
      .as[(Long, Long)].collect().toMap
    assert((0L until 70L).forall(i => clusters.get(i).contains(0L)),
      "hub pairs did not connect all copies into one cluster")
  }

  test("span dedup finds cross-doc K-token spans, skips short docs") {
    import org.apache.spark.sql.functions.col
    val k = Dedup.SpanTokens
    val shared = (1 to k).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"a b c $shared x y"),
      (2L, s"p q $shared"),
      (3L, s"$shared z $shared"),    // span twice in one doc
      (4L, "too short"),             // < K tokens: no spans at all
      (5L, "u1 u2 u3 u4 u5 u6 u7 u8 u9") // unique spans only
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(docs)
    val rows = out.collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3)))
    val hit = rows.find(_._1 == shared)
    assert(hit.contains((shared, 3L, 4L, 1L))) // 3 docs, 4 occurrences, min doc 1
    // every reported span really is multi-doc
    assert(rows.forall(_._2 >= 2))
    // unique-doc spans don't leak through
    assert(!rows.exists(_._1.startsWith("u1")))
  }

  test("CDC chunks reassemble to the doc and survive a prefix edit") {
    import org.apache.spark.sql.functions.col
    val text = (1 to 400).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "inserted prefix " + text))
      .toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(docs)
      .orderBy(col("doc_id"), col("chunk_idx"))
      .collect().map(r => (r.getLong(0), r.getString(2)))
    val a = chunks.filter(_._1 == 1L).map(_._2)
    val b = chunks.filter(_._1 == 2L).map(_._2)
    // lossless: chunks concatenate back to the exact original text
    assert(a.mkString(" ") == text)
    assert(b.mkString(" ") == "inserted prefix " + text)
    // content-defined: ~400/16 chunks, not one giant chunk
    assert(a.length > 10, s"expected ~25 chunks, got ${a.length}")
    // the CDC property: a prefix insertion changes ONLY the first chunk —
    // every boundary after it is a function of local content alone
    assert(b.head == "inserted prefix " + a.head)
    assert(b.tail.sameElements(a.tail))
    // and the dedup view reports exactly those shared chunks
    val dup = Dedup.contentDefinedChunks(docs).collect()
    assert(dup.length == a.tail.length)
    assert(dup.forall(_.getLong(1) == 2L)) // n_docs
  }

  test("incremental dedup reports only new-vs-old pairs") {
    import org.apache.spark.sql.functions.col
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (5L, base),                 // new (id % 5 == 0)
      (10L, base + " tail1"),     // new — near-dup of 5 and of 3
      (3L, base + " tail2"),      // old — near-dup of both new docs
      (7L, base + " tail3"),      // old — near-dup of old 3 (must NOT pair)
      (11L, (1 to 30).map(i => s"z$i").mkString(" ")) // old, unrelated
    ).toDF("doc_id", "text")
    val pairs = Dedup.incrementalPairs(docs, col("doc_id") % 5 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every reported pair is (new, old)
    assert(pairs.forall { case (n, o) => n % 5 == 0 && o % 5 != 0 })
    // the planted new-old near-dups are found
    assert(pairs.contains((5L, 3L)) && pairs.contains((10L, 3L)))
    assert(pairs.contains((5L, 7L)) && pairs.contains((10L, 7L)))
    // old-old (3,7) and new-new (5,10) pairs are excluded by construction
    assert(!pairs.exists { case (a, b) => a % 5 != 0 || b % 5 == 0 })
  }

  test("collocation PMI matches a hand computation on a fixed corpus") {
    // corpus: "a b" x5 and "a c" x5 in one doc each, plus filler that
    // keeps every bigram's count below the min threshold except (a,b)/(a,c)
    val docs = Seq(
      (1L, Seq.fill(5)("a b").mkString(" ")),
      (2L, Seq.fill(5)("a c").mkString(" "))
    ).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, minCount = 5)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // unigrams: a=10, b=5, c=5, n=20; bigrams total nb=18
    // (a,b): c12=5 -> pmi = ln((5/18)/((10/20)*(5/20)))
    val exp = math.log((5.0 / 18.0) / ((10.0 / 20.0) * (5.0 / 20.0)))
    assert(out.contains(("a", "b")))
    assert(out(("a", "b"))._1 == 5L)
    assert(math.abs(out(("a", "b"))._2 - exp) < 1e-6)
    // (b,a) occurs 4 times (within doc 1) — below minCount, excluded
    assert(!out.contains(("b", "a")))
  }

  test("span scrub merges overlapping duplicated windows into maximal " +
      "islands and reports exact per-source token arithmetic") {
    // K = 8. shared (10 toks) duplicates A<->B: its three 8-windows
    // overlap into ONE island of 10; shared2 (exactly 8) duplicates
    // A<->D: one window, one island. C is untouched.
    val shared = (1 to 10).map(i => s"s$i")
    val shared2 = (1 to 8).map(i => s"t$i")
    val docA = ((1 to 4).map(i => s"a$i") ++ shared ++
      (5 to 10).map(i => s"a$i") ++ shared2).mkString(" ") // 28 toks
    val docB = (shared ++ (1 to 12).map(i => s"b$i")).mkString(" ") // 22
    val docC = (1 to 15).map(i => s"c$i").mkString(" ") // 15, clean
    val docD = (shared2 ++ (1 to 7).map(i => s"d$i")).mkString(" ") // 15
    val docs = Seq(
      (1L, "x", docA), (2L, "x", docB),
      (3L, "y", docC), (4L, "y", docD)).toDF("doc_id", "source", "text")
    val out = Dedup.spanScrub(docs)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // x: A has islands [5..14] + [21..28] (2 spans, 18 toks), B one
    // island of 10 → hit 2, spans 3, dup 28, clean (28+22)-28 = 22
    assert(out("x") == ((2L, 3L, 28L, 22L)))
    // y: only D's one 8-token island → clean (15+15)-8 = 22
    assert(out("y") == ((1L, 1L, 8L, 22L)))
  }

  test("embedding cosine is exact (agrees with a local computation)") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    import org.apache.spark.sql.functions._
    val out = vecs.as("a").join(vecs.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        round(Dedup.cosine(
          transform(col("a.embedding"), _.cast("double")),
          transform(col("b.embedding"), _.cast("double"))), 6).as("cos"))
      .as[(Long, Long, Double)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    assert(out((0L, 2L)) == 0.0)
    assert(out((0L, 3L)) == -1.0)
    val expected01 = 0.9 / math.sqrt(0.9 * 0.9 + 0.1 * 0.1)
    assert(math.abs(out((0L, 1L)) - expected01) < 1e-4)
  }
}
