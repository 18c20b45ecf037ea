package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Dedup

/** Driver registrations for the dedup family. The sketch-based variants
  * (minhash, simhash) verify candidates exactly, so minhash shares the
  * exact-Jaccard oracle (recall loss at the planted-pair separation is
  * < 1e-7 — see Dedup scaladoc); simhash has no SQL-expressible oracle.
  * Cluster canonicalization is oracled with a recursive-CTE transitive
  * closure over the same pair definition.
  */
object DedupQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_minhash_error" -> (Dedup.minhashError _),
    "dedup_clusters" -> (Dedup.dedupClusters _),
    "dedup_canonical" -> (Dedup.dedupCanonical _),
    "dedup_exact" -> (Dedup.exact _),
    "dedup_soft" -> (Dedup.softDedup _),
    "dedup_ngram_jaccard" -> (Dedup.ngramJaccard _),
    "dedup_prefix_join" -> (Dedup.prefixJaccard _),
    "dedup_minhash" -> (Dedup.minhashLsh _),
    "dedup_simhash" -> (Dedup.simhash _),
    "dedup_embedding" -> (Dedup.embeddingNearDup _),
    "dedup_span" -> (Dedup.spanQuery _),
    "dedup_span_scrub" -> (Dedup.spanScrubQuery _),
    "dedup_cdc" -> (Dedup.cdcQuery _),
    "dedup_incremental" -> (Dedup.incrementalQuery _),
    // syndicated-content detection at FINGERPRINT granularity: docs
    // sharing a winnowing fingerprint (near-dup chains, edit-tolerant)
    // grouped with their source spread — n_sources > 1 is syndication,
    // n_sources = 1 a within-crawl dup; keeper = lowest doc id. The
    // corpus has no byte-exact dups, so the fingerprint key is what
    // makes cross-source duplication visible at all.
    "dedup_cross_source" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions._
      val docs = graft.Tables.documents(s, d)
      graft.ops.TextAnalysis.fingerprint(s, docs)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("fingerprint"))
        .agg(countDistinct(col("source")).as("n_sources"),
          count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("keeper"))
        .filter(col("n_docs") > 1)
    }),
    // semantic dedup at cluster granularity: embedding near-dup pairs →
    // GraphX connected components (the same canonicalization the
    // minhash clusters use, composed over the OTHER pair source — at
    // scale this is how an embedding-dedup stage emits keep/drop lists)
    "dedup_semantic_clusters" -> ((s: SparkSession, d: String) =>
      Dedup.clustersFromPairs(s, Dedup.embeddingNearDup(s, d)
        .select(org.apache.spark.sql.functions.col("vec_a").as("doc_a"),
          org.apache.spark.sql.functions.col("vec_b").as("doc_b"))))
  )

  /** Shared CTE prefix producing the exact-Jaccard near-dup pairs; the
    * pair predicate is parameterized so the incremental (new-vs-old)
    * variant provably shares the same shingle/score definitions.
    */
  private def pairCtesWith(pairPred: String) =
    "WITH RECURSIVE " + pairCteBodyOver("documents", pairPred)

  /** The same CTE chain as a WITH-list BODY over an arbitrary table/CTE
    * (no `WITH RECURSIVE` prefix), so composed oracles — the curation
    * pipeline runs the pair chain over its GATED corpus CTE — provably
    * share the shingle/score definitions with the standalone gates.
    */
  private[graft] def pairCteBodyOver(table: String, pairPred: String) =
    s"""toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
      |         generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM $table
      |), sh AS (
      |  SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
      |  FROM toks a
      |  JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      |  JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
      |), ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
      |sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
      |raw_pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
      |  FROM ds a JOIN ds b ON a.shingle = b.shingle AND ($pairPred)
      |  GROUP BY 1, 2),
      |jpairs AS (
      |  SELECT doc_a, doc_b,
      |    round(common::DOUBLE / (sa.n + sb.n - common), 4) AS jaccard
      |  FROM raw_pairs
      |  JOIN sizes sa ON sa.doc_id = doc_a
      |  JOIN sizes sb ON sb.doc_id = doc_b
      |  WHERE common::DOUBLE / (sa.n + sb.n - common) >= 0.8)""".stripMargin

  private val pairCtes = pairCtesWith("a.doc_id < b.doc_id")

  private val jaccardOracle =
    pairCtes + "\nSELECT doc_a, doc_b, jaccard FROM jpairs"

  private val incrementalOracle =
    pairCtesWith("a.doc_id % 5 = 0 AND b.doc_id % 5 != 0") +
      "\nSELECT doc_a AS new_doc, doc_b AS old_doc, jaccard FROM jpairs"

  /** Connected components as a transitive closure (clusters are tiny, so
    * the recursion depth is small): label = min reachable id. `edges` is
    * MATERIALIZED: under WITH RECURSIVE, DuckDB inlines non-materialized
    * CTEs into the recursive term, re-running the whole shingle self-join
    * chain once per fixpoint iteration — infeasible at sf1 (48 GB+ of
    * spill for a 100-edge closure). Materializing computes the pair chain
    * exactly once; the recursion itself is O(edges · diameter).
    */
  private val clustersOracle =
    pairCtes +
      """,
        |edges AS MATERIALIZED (
        |  SELECT doc_a AS u, doc_b AS v FROM jpairs
        |  UNION ALL
        |  SELECT doc_b, doc_a FROM jpairs),
        |reach(a, b) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u)
        |SELECT a AS doc_id, least(a, min(b)) AS canonical
        |FROM reach GROUP BY a""".stripMargin

  /** Semantic ground truth for simhash: recompute every doc's 64-bit
    * md5-vote fingerprint bitwise in SQL and emit ALL pairs at hamming
    * <= 3 — the blocked+verified Spark plan must equal this exactly
    * (pigeonhole: a <=3-bit difference always shares one of the four
    * 16-bit blocks, so blocking loses nothing).
    */
  private val simhashOracle: String = {
    // one sum(CASE ...) vote per bit, computed straight off the md5 hex
    // string: bit b lives in the hex char at position 16 - b/4 (char 1 is
    // the most significant nibble of the parsed 64-bit value, matching
    // Long.parseUnsignedLong) at in-nibble shift b%4. The earlier form
    // unnested 64 rows per shingle and then joined fingerprint bits on
    // bit POSITION alone — an all-pairs product over every doc pair per
    // bit (~10^13 rows at sf1). This form is one grouped aggregation pass
    // (64 aggregates, no row explosion) plus the same mathematically
    // lossless 4x16-bit pigeonhole the scaladoc already proves: a <=3-bit
    // difference cannot change all four blocks, so block-equality
    // candidates + the exact bit_count(xor) filter lose nothing.
    val fpTerms = (0 until 64).map { b =>
      val p = 16 - b / 4
      val sh = b % 4
      val pow = BigInt(2).pow(b) // decimal literal: DuckDB's << overflows at 63
      s"""CASE WHEN sum(CASE WHEN (((strpos('0123456789abcdef',
         |      substr(hx, $p, 1)) - 1) >> $sh) & 1) = 1
         |    THEN 1 ELSE -1 END) > 0
         |  THEN $pow::UBIGINT ELSE 0::UBIGINT END""".stripMargin
    }.mkString(" +\n")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
       |         generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM documents
       |), sh AS (
       |  SELECT DISTINCT a.doc_id,
       |    a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
       |  FROM toks a
       |  JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |  JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
       |), hx AS (
       |  SELECT doc_id, substr(md5(shingle), 1, 16) AS hx FROM sh
       |), fpt AS (
       |  SELECT doc_id,
       |$fpTerms
       |  AS fp FROM hx GROUP BY doc_id
       |), blk AS (
       |  SELECT doc_id, fp, g.g, ((fp >> (g.g * 16)) & 65535::UBIGINT) AS k
       |  FROM fpt CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS g) g
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.fp AS fa, b.fp AS fb
       |  FROM blk a JOIN blk b
       |    ON a.g = b.g AND a.k = b.k AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, bit_count(xor(fa, fb))::INT AS hamming
       |FROM cand WHERE bit_count(xor(fa, fb)) <= 3""".stripMargin
  }

  /** The md5-minhash estimator replayed component by component on top of
    * the exact-pair CTEs. Built by plain concatenation — the h48 fold and
    * the component-hash input both contain `||` concats that an outer
    * stripMargin would mangle.
    */
  private val minhashErrorOracle: String = {
    val k = Dedup.MinhashErrK
    val h = graft.ops.Sketches.sqlH48("(comp.i::VARCHAR || '|' || ds.shingle)")
    pairCtes + ",\n" +
      s"comp AS (SELECT unnest(generate_series(0, ${k - 1})) AS i),\n" +
      "msig AS (\n" +
      s"  SELECT ds.doc_id, comp.i, min($h) AS mh\n" +
      "  FROM ds CROSS JOIN comp GROUP BY 1, 2)\n" +
      "SELECT j.doc_a, j.doc_b,\n" +
      "  sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END)::BIGINT AS n_match,\n" +
      s"  ((sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END)::BIGINT * 100) // $k)\n" +
      "    ::BIGINT AS est_pct,\n" +
      "  j.jaccard\n" +
      "FROM jpairs j\n" +
      "JOIN msig a ON a.doc_id = j.doc_a\n" +
      "JOIN msig b ON b.doc_id = j.doc_b AND b.i = a.i\n" +
      "GROUP BY 1, 2, 5"
  }

  val oracles: Map[String, String] = Map(
    "dedup_minhash_error" -> minhashErrorOracle,
    // K-token sliding windows via list slicing; range(1, len-K+2) is
    // empty for docs shorter than K tokens, matching sliding().withPartial(false)
    "dedup_span" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |s AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(toks) - ${Dedup.SpanTokens - 2}),
         |      i -> array_to_string(toks[i:i + ${Dedup.SpanTokens - 1}], ' ')))
         |      AS span
         |  FROM t)
         |SELECT span, count(DISTINCT doc_id)::BIGINT AS n_docs,
         |  count(*)::BIGINT AS n_occurrences, min(doc_id) AS min_doc
         |FROM s GROUP BY span HAVING count(DISTINCT doc_id) >= 2""".stripMargin,
    // the scrub replayed relationally: position-tagged windows (the
    // parallel unnest aligns span and start), cross-doc duplicates,
    // per-position coverage (DISTINCT collapses overlapping windows),
    // gaps-and-islands to maximal spans, per-source rollup
    "dedup_span_scrub" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, string_split(text, ' ') AS toks
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, source,
         |    unnest(list_transform(range(1, len(toks) - ${Dedup.SpanTokens - 2}),
         |      i -> array_to_string(toks[i:i + ${Dedup.SpanTokens - 1}], ' ')))
         |      AS span,
         |    unnest(range(1, len(toks) - ${Dedup.SpanTokens - 2})) AS p
         |  FROM t),
         |dup AS (
         |  SELECT span FROM s GROUP BY span
         |  HAVING count(DISTINCT doc_id) >= 2),
         |cov AS (
         |  SELECT DISTINCT doc_id, pos FROM (
         |    SELECT doc_id,
         |      unnest(range(p, p + ${Dedup.SpanTokens})) AS pos
         |    FROM s WHERE span IN (SELECT span FROM dup))),
         |isl AS (
         |  SELECT doc_id, pos,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
         |      AS grp
         |  FROM cov),
         |perdoc AS (
         |  SELECT doc_id, sum(len)::BIGINT AS dup_toks,
         |    count(*)::BIGINT AS n_spans
         |  FROM (SELECT doc_id, grp, count(*) AS len
         |        FROM isl GROUP BY 1, 2)
         |  GROUP BY doc_id)
         |SELECT source,
         |  sum(CASE WHEN dup_toks IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |    AS n_docs_hit,
         |  sum(coalesce(n_spans, 0))::BIGINT AS n_spans,
         |  sum(coalesce(dup_toks, 0))::BIGINT AS dup_tokens,
         |  (sum(len(toks)) - sum(coalesce(dup_toks, 0)))::BIGINT
         |    AS clean_tokens
         |FROM t LEFT JOIN perdoc USING (doc_id)
         |GROUP BY source""".stripMargin,
    // Content-defined chunking replayed relationally: boundary flag per
    // token (md5 first nibble = '0'), chunk index = running boundary
    // count over PRECEDING tokens, chunk text reassembled in token order.
    "dedup_cdc" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents
        |), marked AS (
        |  SELECT doc_id, pos, tok,
        |    CASE WHEN substr(md5(tok), 1, 1) = '0' THEN 1 ELSE 0 END AS b
        |  FROM toks
        |), chunked AS (
        |  SELECT doc_id, pos, tok,
        |    COALESCE(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ci
        |  FROM marked
        |), chunks AS (
        |  SELECT doc_id, ci, string_agg(tok, ' ' ORDER BY pos) AS chunk
        |  FROM chunked GROUP BY doc_id, ci)
        |SELECT chunk, count(DISTINCT doc_id)::BIGINT AS n_docs,
        |  count(*)::BIGINT AS n_occurrences, min(doc_id) AS min_doc
        |FROM chunks GROUP BY chunk
        |HAVING count(DISTINCT doc_id) >= 2""".stripMargin,
    "dedup_simhash" -> simhashOracle,
    "dedup_clusters" -> clustersOracle,
    // the cluster CTEs plus the keep-longest election and byte audit
    "dedup_canonical" ->
      (pairCtes +
        """,
          |edges AS MATERIALIZED (
          |  SELECT doc_a AS u, doc_b AS v FROM jpairs
          |  UNION ALL
          |  SELECT doc_b, doc_a FROM jpairs),
          |reach(a, b) AS (
          |  SELECT u, v FROM edges
          |  UNION
          |  SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u),
          |cc AS (
          |  SELECT a AS doc_id, least(a, min(b)) AS canonical
          |  FROM reach GROUP BY a),
          |sized AS (
          |  SELECT c.canonical, c.doc_id, d.n_chars,
          |    row_number() OVER (PARTITION BY c.canonical
          |                       ORDER BY d.n_chars DESC, c.doc_id) AS rn
          |  FROM cc c JOIN documents d USING (doc_id))
          |SELECT canonical AS cluster, count(*) AS n_docs,
          |  max(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc,
          |  (sum(n_chars) - max(CASE WHEN rn = 1 THEN n_chars END))::BIGINT
          |    AS bytes_dropped
          |FROM sized GROUP BY canonical""".stripMargin),
    // same count-over-content-hash window, same integer weight
    "dedup_soft" ->
      """SELECT doc_id, md5(text) AS text_md5,
        |  count(*) OVER (PARTITION BY md5(text))::BIGINT AS n_copies,
        |  1000000 // count(*) OVER (PARTITION BY md5(text)) AS weight_fp
        |FROM documents""".stripMargin,
    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, md5(text) AS text_md5,
        |  count(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,
    "dedup_ngram_jaccard" -> jaccardOracle,
    "dedup_incremental" -> incrementalOracle,
    "dedup_prefix_join" -> jaccardOracle, // lossless: prefix filter is exact
    "dedup_minhash" -> jaccardOracle,
    "dedup_embedding" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[],
        |    b.embedding::DOUBLE[]), 6) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
        |  b.embedding::DOUBLE[]), 6) >= 0.45""".stripMargin,
    // fingerprint oracle wrapped by concatenation (it contains || concats
    // a stripMargin interpolation would mangle)
    "dedup_cross_source" -> (
      "WITH fp AS (SELECT doc_id, fingerprint FROM (" +
        graft.queries.OpsQueries.oracles("text_fingerprint") + "))\n" +
        """SELECT f.fingerprint,
          |  count(DISTINCT d.source)::BIGINT AS n_sources,
          |  count(*) AS n_docs,
          |  min(d.doc_id) AS keeper
          |FROM fp f JOIN documents d USING (doc_id)
          |GROUP BY 1 HAVING count(*) > 1""".stripMargin),
    // same transitive-closure oracle pattern as dedup_clusters, over the
    // embedding pair source
    "dedup_semantic_clusters" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
        |    b.embedding::DOUBLE[]), 6) >= 0.45),
        |edges AS MATERIALIZED (
        |  SELECT doc_a AS u, doc_b AS v FROM pairs
        |  UNION ALL
        |  SELECT doc_b, doc_a FROM pairs),
        |reach(a, b) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u)
        |SELECT a AS doc_id, least(a, min(b)) AS canonical
        |FROM reach GROUP BY a""".stripMargin
  )
}
