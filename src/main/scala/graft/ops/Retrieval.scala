package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Lexical retrieval scoring and hybrid rank fusion — the search half a
  * training-data engine needs next to its ANN index ([[Similarity]]):
  * contamination checks, known-item lookup and RAG-style corpus probes
  * are all "score this query against 100 TB of documents" problems.
  *
  * Shapes at scale:
  *  - BM25 never materializes a vocabulary or a doc-term matrix: one
  *    tokenize pass feeds three combinable aggregations (term
  *    frequencies, doc lengths, corpus totals), the standing query set
  *    is broadcast against the term-frequency table (posting-list join —
  *    candidates are bounded by the document frequency of the query
  *    terms, never the corpus), and the only corpus-sized shuffle is the
  *    doc-length attach on `doc_id`.
  *  - Scores are summed as 1e-4 fixed-point BIGINTs, so the aggregation
  *    is order-independent (float summation order differs between
  *    engines and between partition counts) and the rank order is
  *    cross-engine stable — same recipe as [[TextAnalysis.tfIdf]].
  *  - RRF fusion is rank-arithmetic only (integer division on ranks), so
  *    the fused ranking is exactly reproducible no matter which engine
  *    produced the arm scores.
  */
object Retrieval {
  /** Standing query set: `doc_id < QueryDocs` (the [[Similarity]] ANN
    * family uses the same ids as its query vectors, which is what makes
    * hybrid fusion line up without a mapping table).
    */
  val QueryDocs = 10

  /** Each query is the first `QueryTerms` tokens of its query doc. */
  val QueryTerms = 4

  /** Lexical hits kept per query. */
  val TopK = 10

  /** RRF dampening constant (the k in 1/(k+rank), Cormack et al.). */
  val RrfK = 60

  /** Fused hits kept per query. */
  val FuseK = 5

  /** Okapi BM25 (k1 = 1.2, b = 0.75) top-`k` docs per query.
    *
    * Output: (query_id, doc_id, n_terms, score_fp, rank) where score_fp
    * is the BM25 score in 1e-4 fixed point (per-term contributions
    * rounded to 4 decimals BEFORE summing — see class doc) and n_terms
    * counts the query terms the doc matched.
    */
  def bm25TopK(docs: DataFrame, k: Int = TopK): DataFrame = {
    val toks = OpUtil.spread(docs)
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("term"))
      .filter(length(col("term")) > 0)
    // ONE tokenize+shuffle builds tf; doc lengths and corpus totals are
    // rollups OF tf (sum of a doc's term counts = its token count), so
    // the corpus is tokenized once, not three times. tf is cached for
    // its three consumers (df stats, candidates, rollups).
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")).cache()
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    // corpus stats as ONE broadcast row — avgdl is derived from the two
    // exact BIGINTs by a single double division, identically on both
    // engines (avg() would sum doubles in engine-dependent order)
    val stats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(dl.agg(sum(col("dl")).as("total_tokens")))
    bm25Core(tf, dl, stats, queryTermsOf(docs), k)
  }

  /** The standing query set's (query_id, term) pairs — first
    * [[QueryTerms]] tokens of each doc below [[QueryDocs]]. Shared by
    * the from-scratch scorer and the maintained-index search
    * ([[Bm25Index.searchBm25Index]]), which reads them from the LIVE
    * corpus (delta-small: a pruned read of [[QueryDocs]] docs).
    */
  private[ops] def queryTermsOf(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") < QueryDocs)
      .select(col("doc_id").as("query_id"),
        explode(slice(split(col("text"), " ", -1), 1, QueryTerms)).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()

  /** The scoring core over MATERIALIZED statistics — (doc_id, term,
    * tf), (doc_id, dl) and the one-row (n_docs, total_tokens) frame —
    * shared verbatim by [[bm25TopK]] (which derives them from the raw
    * corpus in one tokenize pass) and [[Bm25Index]] (which maintains
    * them AS snapshot tables from the corpus change feed), so the
    * maintained-index search is expression-for-expression the gated
    * scorer.
    */
  private[ops] def bm25Core(tf: DataFrame, dl: DataFrame,
      stats: DataFrame, qterms: DataFrame, k: Int): DataFrame = {
    // df restricted to the query terms BEFORE the aggregation (r15):
    // the per-term count is unchanged by dropping non-query terms'
    // rows, so the broadcast semi-filter moves ahead of the groupBy
    // and the shuffle carries O(query-term postings), not the full
    // vocabulary's — the former shape aggregated every (doc, term)
    // row just to keep ~|queries|·QueryTerms of the results
    val dfq = tf.join(broadcast(qterms.select("term").distinct()), "term")
      .groupBy("term").agg(count(lit(1)).as("df"))
    val cand = tf
      .join(broadcast(qterms), "term")
      .join(broadcast(dfq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
    val avgdl = col("total_tokens").cast("double") / col("n_docs")
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val denom = col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / avgdl))
    val contrib = idf * (col("tf") * 2.2) / denom
    val scored = cand
      .select(col("query_id"), col("doc_id"),
        round(contrib * 10000).cast("long").as("contrib_fp"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("contrib_fp").as("score_fp"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_fp").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "n_terms", "score_fp", "rank")
  }

  def bm25Query(s: SparkSession, dir: String): DataFrame =
    bm25TopK(Tables.documents(s, dir))

  /** Hybrid retrieval: reciprocal-rank fusion of the lexical arm
    * ([[bm25TopK]]) and the vector arm ([[Similarity.bruteForceTopK]]
    * over the same query ids). rrf_fp = sum over arms of
    * 1000000 div (RrfK + rank) — rank-only integer arithmetic, so the
    * fusion is engine-exact regardless of how either arm scored.
    * Absent-arm ranks surface as 0 (a doc found by only one arm simply
    * contributes one term).
    */
  def hybridRrf(s: SparkSession, dir: String): DataFrame =
    hybridFusion(s, dir,
      Similarity.bruteForceTopK(
        Tables.embeddings(s, dir), Similarity.queryVectors(s, dir),
        Similarity.DefaultK))

  /** The PRODUCTION fusion: same RRF arithmetic, but the vector arm is
    * the composed IVF+PQ index ([[Similarity.ivfPqTopK]] — coarse cells
    * + ADC codes) instead of the exact linear scan. At 100 TB the exact
    * arm reads every embedding per query; this arm reads 4-bit codes
    * for the probed fraction of the corpus only. Rank fusion is
    * index-agnostic (integer arithmetic on ranks), so swapping arms
    * changes NO fusion code — and because the IVFPQ arm is itself
    * hash-checked (`ann_ivfpq`), the fused ranking hash-checks
    * end-to-end too.
    */
  def hybridIvfPq(s: SparkSession, dir: String): DataFrame =
    hybridFusion(s, dir, Similarity.annIvfPq(s, dir))

  /** The lexical arm both fusions share: BM25 top-k reduced to
    * (query_id, doc_id, lex_rank) — at most QueryDocs × TopK rows.
    */
  private def lexArm(s: SparkSession, dir: String): DataFrame =
    bm25TopK(Tables.documents(s, dir))
      .select(col("query_id"), col("doc_id"), col("rank").as("lex_rank"))

  /** Shared fusion body: any vector arm with (query_id, neighbor_id,
    * rank) fuses with the BM25 arm by reciprocal-rank arithmetic.
    */
  private def hybridFusion(s: SparkSession, dir: String,
      vecArm: => DataFrame): DataFrame =
    hybridFusionOf(lexArm(s, dir), vecArm)

  private def hybridFusionOf(lex: DataFrame,
      vecArm: => DataFrame): DataFrame = {
    val vec = vecArm
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("vec_rank"))
    val armFp = (rank: Column) =>
      when(rank.isNull, 0L)
        .otherwise(floor(lit(1000000) / (lit(RrfK) + rank)).cast("long"))
    val fused = lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_fp", armFp(col("lex_rank")) + armFp(col("vec_rank")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_fp").desc, col("doc_id"))
    fused
      .select(col("query_id"), col("doc_id"),
        coalesce(col("lex_rank"), lit(0)).cast("long").as("lex_rank"),
        coalesce(col("vec_rank"), lit(0)).cast("long").as("vec_rank"),
        col("rrf_fp"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= FuseK)
  }

  /** Recall of the production fusion against the exact-exact fusion —
    * the hybrid twin of the ann_recall_* family: how much of the
    * (BM25 + exact cosine) fused top-[[FuseK]] does the
    * (BM25 + IVFPQ) fusion retain, per query. Same LEFT JOIN counting
    * shape as every other recall report.
    */
  def recallHybrid(s: SparkSession, dir: String): DataFrame = {
    // ONE lexical arm for both fusions (r16): exact and approx each
    // embedded their own full bm25TopK subtree — the whole corpus
    // tokenize + postings aggregation ran twice per recall report. The
    // arm's output is ≤ QueryDocs × TopK rows; cache it and both
    // fusions read the same computed ranks (released by the suite's
    // per-query cache hygiene).
    val lex = lexArm(s, dir).cache()
    val exact = hybridFusionOf(lex,
        Similarity.bruteForceTopK(
          Tables.embeddings(s, dir), Similarity.queryVectors(s, dir),
          Similarity.DefaultK))
      .select("query_id", "doc_id")
    val approx = hybridFusionOf(lex, Similarity.annIvfPq(s, dir))
      .select(col("query_id"), col("doc_id"), lit(1L).as("hit"))
    exact.join(approx, Seq("query_id", "doc_id"), "left_outer")
      .groupBy("query_id")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"),
        count(lit(1)).as("k"))
      .select(col("query_id"), col("n_hits"),
        expr("n_hits * 100 div k").as("recall_x100"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bm25" -> (bm25Query _),
    "ann_hybrid_rrf" -> (hybridRrf _),
    "ann_hybrid_ivfpq" -> (hybridIvfPq _),
    "ann_recall_hybrid" -> (recallHybrid _))

  /** The BM25 replay: same tokenization, same fixed-point contribution
    * rounding, same (score_fp DESC, doc_id) rank — as a reusable CTE
    * body so the hybrid oracle can embed it.
    */
  private[graft] val bm25Oracle: String =
    s"""WITH tk AS (
       |  SELECT doc_id, term FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |    FROM documents)
       |  WHERE length(term) > 0),
       |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tk GROUP BY 1, 2),
       |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tk GROUP BY 1),
       |st AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       |              (SELECT count(*) FROM tk)::BIGINT AS total_tokens),
       |q AS (
       |  SELECT DISTINCT query_id, term FROM (
       |    SELECT doc_id AS query_id,
       |      unnest(string_split(text, ' ')[1:$QueryTerms]) AS term
       |    FROM documents WHERE doc_id < $QueryDocs)
       |  WHERE length(term) > 0),
       |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
       |cand AS (
       |  SELECT q.query_id, tf.doc_id, tf.tf, df.df, dl.dl
       |  FROM q JOIN tf USING (term) JOIN df USING (term)
       |  JOIN dl ON dl.doc_id = tf.doc_id),
       |sc AS (
       |  SELECT query_id, doc_id, count(*)::BIGINT AS n_terms,
       |    sum(round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
       |      * (tf * 2.2)
       |      / (tf + 1.2 * (0.25 + 0.75 * (dl / (total_tokens::DOUBLE / n_docs))))
       |      * 10000)::BIGINT)::BIGINT AS score_fp
       |  FROM cand CROSS JOIN st GROUP BY 1, 2),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY score_fp DESC, doc_id) AS rank FROM sc)
       |SELECT query_id, doc_id, n_terms, score_fp, rank
       |FROM r WHERE rank <= $TopK""".stripMargin

  private[graft] def rrfOracle(bruteforce: String): String =
    s"""WITH lex AS (
       |  SELECT query_id, doc_id, rank AS lex_rank FROM ($bm25Oracle)),
       |vec AS (
       |  SELECT query_id, neighbor_id AS doc_id, rank AS vec_rank
       |  FROM ($bruteforce)),
       |f AS (
       |  SELECT coalesce(l.query_id, v.query_id) AS query_id,
       |    coalesce(l.doc_id, v.doc_id) AS doc_id,
       |    coalesce(l.lex_rank, 0)::BIGINT AS lex_rank,
       |    coalesce(v.vec_rank, 0)::BIGINT AS vec_rank,
       |    ((CASE WHEN l.lex_rank IS NULL THEN 0
       |        ELSE 1000000 // ($RrfK + l.lex_rank) END)
       |     + (CASE WHEN v.vec_rank IS NULL THEN 0
       |        ELSE 1000000 // ($RrfK + v.vec_rank) END))::BIGINT AS rrf_fp
       |  FROM lex l FULL OUTER JOIN vec v
       |    ON l.query_id = v.query_id AND l.doc_id = v.doc_id),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY rrf_fp DESC, doc_id) AS rank FROM f)
       |SELECT query_id, doc_id, lex_rank, vec_rank, rrf_fp, rank
       |FROM r WHERE rank <= $FuseK""".stripMargin
}
