package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import org.apache.spark.sql.functions._

import graft.ops.{AnnIndex, Audio, Multimodal, Similarity, Sketches, TextAnalysis}

/** Driver registrations for similarity search, text analysis, and
  * multimodal plumbing. Everything here carries a DuckDB oracle except
  * the approximate ANN variants (lsh/ivf) and the iterative-float
  * clustering workloads (cmeans/gmm), which register rows-only checks
  * plus spec-level recall/determinism tests.
  */
object OpsQueries {

  /** The ONE recall@k report all approximate indexes share: exact top-k
    * LEFT JOIN index top-k, hits conditional-counted per query — the
    * same join + count shape as the SQL oracle (one pass over exact, no
    * semi/outer recombination to diverge from it).
    */
  private def recallReport(index: (SparkSession, String) => DataFrame)(
      s: SparkSession, d: String): DataFrame = {
    val exact = Similarity.annBruteForce(s, d)
      .select(col("query_id"), col("neighbor_id"))
    val approx = index(s, d)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left_outer")
      .groupBy("query_id")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"),
        count(lit(1)).as("k"))
      .select(col("query_id"), col("n_hits"),
        expr("n_hits * 100 div k").as("recall_x100"))
  }

  /** Columns profiled by [[tableStats]] — integer keys and low-NDV flags
    * (DOUBLE/TIMESTAMP columns are excluded on purpose: their min/max
    * string forms are not engine-stable).
    */
  val StatCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_returnflag", "l_linestatus")

  /** ANALYZE-style table statistics — the stats-collection pass a
    * cost-based planner runs before choosing join orders at scale: per
    * column, row/null counts, exact NDV, the HLL NDV estimate (the
    * shared [[Sketches.hllRegisters]] kernel — at 100 TB the sketch IS
    * the collected stat and the exact column is the error reference),
    * and min/max rendered to strings after the typed aggregate. Two
    * passes over the table (one wide aggregate row + one register
    * build), everything else is per-column-cardinality work.
    */
  def tableStats(s: SparkSession, d: String): DataFrame = {
    val li = graft.Tables.lineitem(s, d)
    // one narrow pass for count/min/max — deliberately NO countDistinct
    // here: five distinct aggregates in one agg would plan as a 5x
    // Expand of the table through the shuffle; exact NDV comes from the
    // distinct-value table below instead
    val aggs = StatCols.flatMap(c => Seq(
      count(col(c)).as(s"cnt_$c"),
      min(col(c)).cast("string").as(s"min_$c"),
      max(col(c)).cast("string").as(s"max_$c")))
    val wide = li.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val longRows = wide
      .select(col("n_rows"), explode(array(StatCols.map(c =>
        struct(lit(c).as("col_name"), col(s"cnt_$c").as("cnt"),
          col(s"min_$c").as("min_s"), col(s"max_$c").as("max_s"))): _*))
        .as("st"))
      .select(col("st.col_name").as("source"), col("n_rows"),
        (col("n_rows") - col("st.cnt")).as("n_null"),
        col("st.min_s"), col("st.max_s"))
    // distinct (column, value) pairs: NDV-bounded, and both the exact
    // count and the HLL registers fold it (registers are duplicate-
    // insensitive, so distinct-first changes nothing but the work)
    val dvals = StatCols.map(c => li.select(lit(c).as("source"),
        col(c).cast("string").as("tok")).filter(col("tok").isNotNull))
      .reduce(_ unionByName _)
      .distinct()
      .cache()
    val exact = dvals.groupBy("source").agg(count(lit(1)).as("n_exact"))
    Sketches.hllFinalize(Sketches.hllRegisters(dvals), exact)
      .join(longRows, "source")
      .select(col("source").as("col_name"), col("n_rows"), col("n_null"),
        col("n_exact").as("ndv"), col("hll_est"),
        // the LC-corrected estimate matters most exactly here: ANALYZE
        // columns like l_returnflag (NDV 3) sit deep in the small-range
        // regime where the raw estimator is biased high by design
        col("hll_lc").as("ndv_lc"), col("err_pct"),
        col("min_s"), col("max_s"))
  }

  /** Distributed k-means over the embeddings (the reference paper's
    * benchmark family is C-means/GMM clustering — paper Table 3, see
    * BASELINE.md; this is the Spark-native equivalent workload). Output:
    * cluster cardinalities. Seeded, but float summation order can flip
    * boundary points, so it registers as a rows-only check.
    */
  def cmeansClusters(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val data = graft.Tables.embeddings(s, dir)
      .select(col("vec_id"),
        array_to_vector(transform(col("embedding"), _.cast("double"))).as("features"))
    val model = new KMeans().setK(10).setSeed(42L).setMaxIter(20)
      .setFeaturesCol("features").fit(data)
    model.transform(data)
      .groupBy(col("prediction"))
      .agg(count(lit(1)).as("n_points"))
      .select(col("prediction").as("cluster"), col("n_points"))
  }

  /** GEMV (the paper's kernel benchmark, Table 3 / §V): y = A·x with A =
    * the embeddings matrix (row-distributed) and x a broadcast vector
    * (here: embedding 0). One codegen'd dot per row, no shuffle — the
    * exact distributed-GEMV layout, oracle-checked via DuckDB
    * list_dot_product.
    */
  def gemv(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorOps.vec_dot
    val emb = graft.Tables.embeddings(s, dir)
    val x = broadcast(emb.filter(col("vec_id") === 0)
      .select(transform(col("embedding"), _.cast("double")).as("x")))
    graft.ops.OpUtil.spread(emb)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("a"))
      .crossJoin(x)
      .select(col("vec_id"), round(vec_dot(col("a"), col("x")), 6).as("y"))
  }

  /** Gaussian mixture (the paper's GMM workload): the engine's own
    * diagonal-covariance EM over the leading 16 embedding dims; output =
    * soft-cluster cardinalities by max-responsibility. Iterative float
    * EM → rows-only check, like cmeans ([[Similarity.gmmFixedPoint]] is
    * the oracle-checked integer twin).
    *
    * Engine-owned rather than the ML library's full-covariance fit: the
    * sf1 pass caught that fit hanging INSIDE pure-Java LAPACK — a
    * mixture component collapsing to near-zero weight hands `dsyev` a
    * degenerate 16x16 covariance whose `dlascl` rescaling loop spins on
    * denormals, pinning one executor core indefinitely (and which
    * trajectory EM takes depends on the file layout, because the
    * library's init samples by partition). This EM has no
    * eigendecomposition to hang: diagonal covariance with a ridge floor
    * (`varFloor`) keeps every per-dim variance positive by
    * construction, responsibilities normalize through log-sum-exp, and
    * init is the first K vectors by id — layout-independent.
    *
    * Shape at scale (same as [[Similarity.gmmFixedPoint]]): per
    * iteration one broadcast K x dim parameter join, combinable
    * per-(point, cluster) log-likelihood and per-(cluster, dim)
    * sufficient-stat aggregations, and ONE contract-bounded driver
    * collect of the K x dim x 3 sufficient statistics — the identical
    * collect every distributed EM (including the ML library's) performs
    * per iteration. The driver loops only over iteration indices.
    */
  def gmmClusters(s: SparkSession, dir: String): DataFrame = {
    val K = 4
    val dims = 16
    val iters = 10
    val varFloor = 1e-4 // ridge: no component variance may collapse below
    val el = graft.Tables.embeddings(s, dir)
      .select(col("vec_id"), posexplode(slice(col("embedding"), 1, dims))
        .as(Seq("i", "v")))
      .select(col("vec_id"), col("i"), col("v").cast("double").as("v"))
      .cache()
    val n = el.select(count_distinct(col("vec_id"))).first().getLong(0)
    // params(c)(i) = (mu, var); weights(c); init: first K vectors as
    // means (deterministic in ids, not in file layout), unit variance,
    // uniform weights
    var params: Array[Array[(Double, Double)]] = el
      .filter(col("vec_id") < K).collect()
      .groupBy(_.getLong(0)).toArray.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(r => (r.getDouble(2), 1.0)))
    var weights = Array.fill(K)(1.0 / K)
    import s.implicits._
    def centsFrame(): DataFrame =
      (for { c <- 0 until K; i <- 0 until dims } yield
        (c, i, params(c)(i)._1, params(c)(i)._2, weights(c)))
        .toDF("c", "i", "mu", "va", "w")
    def logLik(cents: DataFrame): DataFrame =
      el.join(broadcast(cents), "i")
        .groupBy(col("vec_id"), col("c"))
        .agg((sum(lit(-0.5) * (log(lit(2 * math.Pi) * col("va"))
          + (col("v") - col("mu")) * (col("v") - col("mu")) / col("va")))
          + first(log(col("w")))).as("ll"))
    for (_ <- 1 to iters) {
      // E-step: log p(x|c) + log w_c per (point, cluster), then
      // log-sum-exp normalize per point into responsibilities
      val ll = logLik(centsFrame())
      val mx = ll.groupBy("vec_id").agg(max(col("ll")).as("mx"))
      val resp = ll.join(mx, "vec_id")
        .select(col("vec_id"), col("c"), exp(col("ll") - col("mx")).as("r"))
      val dn = resp.groupBy("vec_id").agg(sum(col("r")).as("dn"))
      val rn = resp.join(dn, "vec_id")
        .select(col("vec_id"), col("c"), (col("r") / col("dn")).as("rn"))
      // M-step sufficient stats: the ONE driver collect, K x dims rows
      val stats = el.join(rn, "vec_id")
        .groupBy(col("c"), col("i"))
        .agg(sum(col("rn")).as("sr"), sum(col("rn") * col("v")).as("s1"),
          sum(col("rn") * col("v") * col("v")).as("s2"))
        .collect()
      params = stats.groupBy(_.getInt(0)).toArray.sortBy(_._1).map(_._2
        .sortBy(_.getInt(1)).map { r =>
          val (sr, s1, s2) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
          val mu = s1 / math.max(sr, 1e-12)
          (mu, math.max(s2 / math.max(sr, 1e-12) - mu * mu, varFloor))
        })
      weights = stats.filter(_.getInt(1) == 0).sortBy(_.getInt(0))
        .map(r => math.max(r.getDouble(2) / n, 1e-12))
    }
    // final hard assignment from the fitted params
    logLik(centsFrame())
      .groupBy("vec_id")
      .agg(max(struct(col("ll"), (-col("c")).as("nc"))).as("best"))
      .select(col("vec_id"), (-col("best.nc")).as("cluster"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_points"))
      .select(col("cluster"), col("n_points"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gemv" -> (gemv _),
    "gmm_clusters" -> (gmmClusters _),
    "cmeans_clusters" -> (cmeansClusters _),
    "ann_bruteforce" -> (Similarity.annBruteForce _),
    "ann_range_search" -> (Similarity.annRangeSearch _),
    "ann_ivf" -> (Similarity.annIvf _),
    "ann_lsh" -> (Similarity.annLsh _),
    "ann_centroid_assign" -> (Similarity.annCentroidAssign _),
    "ann_pq_encode" -> (Similarity.annPqEncode _),
    "ann_pq_search" -> (Similarity.annPqSearch _),
    "ann_pq_refine" -> (Similarity.annPqRefine _),
    "ann_srp_lsh" -> (Similarity.annSrpLsh _),
    "ann_ivf_fixed" -> (Similarity.annIvfFixed _),
    "ann_ivfpq" -> (Similarity.annIvfPq _),
    "cmeans_fixed_point" -> (Similarity.cmeansFixedPointQuery _),
    "ml_pca_power" -> (Similarity.pcaPowerQuery _),
    "gmm_fixed_point" -> (Similarity.gmmFixedPointQuery _),
    // index QA in-engine: recall@k of each approximate index (SRP, IVF,
    // PQ/ADC) against the exact top-k, per query — both sides are
    // themselves oracle-replayed, so even the RECALL REPORTS are
    // hash-checked
    "ann_recall_srp" -> (recallReport(Similarity.annSrpLsh) _),
    "ann_recall_ivf" -> (recallReport(Similarity.annIvfFixed) _),
    "ann_recall_pq" -> (recallReport(Similarity.annPqSearch) _),
    "ann_recall_ivfpq" -> (recallReport(Similarity.annIvfPq) _),
    "ann_sq8" -> (Similarity.annSq8 _),
    "ann_recall_sq8" -> (recallReport(Similarity.annSq8) _),
    "ann_sq8_maintained" -> (AnnIndex.annSq8Maintained _),
    "stats_table" -> (tableStats _),
    "text_corpus_stats" -> (TextAnalysis.corpusStatsQuery _),
    "text_token_stats" -> (TextAnalysis.tokenStatsQuery _),
    "text_quality" -> (TextAnalysis.qualityQuery _),
    "text_langid" -> (TextAnalysis.langIdQuery _),
    "text_fingerprint" -> (TextAnalysis.fingerprintQuery _),
    "multimodal_features" -> (Multimodal.featuresQuery _),
    // the PRODUCTION-format twin: payloads re-encoded as real PNGs on
    // executors, decoded by the javax.imageio codec, verified by the
    // SAME LCG-replay oracle (PNG lossless + gray tripling invisible
    // to mean/entropy — see Multimodal.pngFeaturesQuery scaladoc)
    "multimodal_png_features" -> (Multimodal.pngFeaturesQuery _),
    "multimodal_meta" -> ((s: SparkSession, d: String) =>
      Multimodal.metaQuery(s, d)),
    "multimodal_framestats" -> (Multimodal.frameStatsQuery _),
    // resize-stub plumbing on the gate path: decoded dims clamped to a
    // 32px box (the metadata half of a real resize; pixel transform is
    // the stubbed codec's job)
    "multimodal_resize" -> ((s: SparkSession, d: String) =>
      Multimodal.resizeStub(
        Multimodal.extractFeatures(Multimodal.mediaTable(s, d)), 32)),
    // audio: real RIFF/WAVE container encode → chunk-walking WavCodec
    // decode → all-integer sample stats, gated by the LCG replayed with
    // a 16-bit signed read (Audio.audioFeaturesOracle)
    "multimodal_audio_features" -> (Audio.audioFeaturesQuery _)
  )

  /** The LCG-replay feature oracle, shared VERBATIM by
    * `multimodal_features` (stub codec on raw synthetic payloads) and
    * `multimodal_png_features` (ImageIoCodec on real PNG re-encodes):
    * the PNG round trip is lossless and its gray→RGB tripling cancels
    * out of every feature, so one SQL replay gates both codecs.
    */
  private val LcgFeaturesOracle: String =
    """WITH RECURSIVE gen(doc_id, i, n, state) AS (
      |  SELECT doc_id, 0::BIGINT,
      |    ((16 + doc_id % 48) * (16 + doc_id % 32))::BIGINT,
      |    ((doc_id::HUGEINT * 6364136223846793005 + 1442695040888963407)
      |      % 18446744073709551616 + 18446744073709551616)
      |      % 18446744073709551616
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, i + 1, n,
      |    (state * 6364136223846793005 + 1442695040888963407)
      |      % 18446744073709551616
      |  FROM gen WHERE i < n
      |), bytes AS (
      |  SELECT doc_id, n, (state // 72057594037927936)::BIGINT AS b
      |  FROM gen WHERE i >= 1
      |), hist AS (
      |  SELECT doc_id, n, b, count(*)::DOUBLE AS c
      |  FROM bytes GROUP BY 1, 2, 3
      |), feat AS (
      |  SELECT doc_id,
      |    (200 * sum(b * c)::BIGINT + n) // (2 * n) AS mean_byte_x100,
      |    round(-sum((c / n) * log2(c / n)), 4) AS byte_entropy
      |  FROM hist GROUP BY doc_id, n)
      |SELECT d.doc_id AS media_id,
      |  CASE WHEN d.doc_id % 3 = 0 THEN 'image' ELSE 'audio' END
      |    AS modality,
      |  (16 + d.doc_id % 48)::INT AS width,
      |  (16 + d.doc_id % 32)::INT AS height,
      |  f.mean_byte_x100, f.byte_entropy
      |FROM documents d JOIN feat f ON f.doc_id = d.doc_id""".stripMargin

  /** Shared ADC oracle prefix: PQ-encode the corpus (same CTEs as the
    * ann_pq_encode oracle), build the per-query subspace LUT with the
    * identical list_sum accumulation, and sum ADC in subspace order —
    * ends at the `adc(query_id, neighbor_id, adc_raw)` CTE, which
    * ann_pq_search ranks directly and ann_pq_refine shortlists then
    * exact-re-ranks.
    */
  private val pqAdcCtes: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |    len(embedding) AS d, len(embedding) // ${Similarity.PqSubspaces} AS sd
       |  FROM embeddings),
       |a AS (SELECT vec_id AS code, v AS av FROM e
       |      WHERE vec_id < ${Similarity.PqCodebookSize}),
       |g AS (SELECT unnest(generate_series(0, ${Similarity.PqSubspaces - 1}))
       |        AS s),
       |sub AS (
       |  SELECT e.vec_id, a.code, g.s,
       |    list_sum(list_transform(
       |      range(g.s * e.sd + 1,
       |        (CASE WHEN g.s = ${Similarity.PqSubspaces - 1}
       |              THEN e.d ELSE (g.s + 1) * e.sd END) + 1),
       |      i -> (e.v[i] - a.av[i]) * (e.v[i] - a.av[i]))) AS d2
       |  FROM e CROSS JOIN a CROSS JOIN g),
       |r AS (
       |  SELECT vec_id, s, code, d2,
       |    row_number() OVER (PARTITION BY vec_id, s
       |      ORDER BY d2, code) AS rn
       |  FROM sub),
       |b AS (SELECT vec_id, s, code FROM r WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, v AS qv, d, sd FROM e
       |      WHERE vec_id < 10),
       |lut AS (
       |  SELECT q.query_id, a.code, g.s,
       |    list_sum(list_transform(
       |      range(g.s * q.sd + 1,
       |        (CASE WHEN g.s = ${Similarity.PqSubspaces - 1}
       |              THEN q.d ELSE (g.s + 1) * q.sd END) + 1),
       |      i -> (q.qv[i] - a.av[i]) * (q.qv[i] - a.av[i]))) AS d2
       |  FROM q CROSS JOIN a CROSS JOIN g),
       |adc AS (
       |  SELECT lut.query_id, b.vec_id AS neighbor_id,
       |    list_sum(list(lut.d2 ORDER BY b.s)) AS adc_raw
       |  FROM b JOIN lut ON lut.s = b.s AND lut.code = b.code
       |  WHERE b.vec_id != lut.query_id
       |  GROUP BY 1, 2)""".stripMargin

  /** One fixed-point Lloyd iteration as SQL: argmin assignment (integer
    * d2, ties to lower cluster) then integer-division centroid means.
    */
  private def fpIterSql(centsIn: String, aOut: String, cOut: String): String =
    s"""$aOut AS (
       |  SELECT vec_id, c FROM (
       |    SELECT vec_id, c,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
       |    FROM (
       |      SELECT elq.vec_id, k.c,
       |        sum((elq.q - k.cq) * (elq.q - k.cq))::BIGINT AS d2
       |      FROM elq JOIN $centsIn k USING (i) GROUP BY 1, 2))
       |  WHERE rn = 1),
       |$cOut AS (
       |  SELECT a.c, elq.i, sum(elq.q) // count(*) AS cq
       |  FROM elq JOIN $aOut a USING (vec_id) GROUP BY 1, 2)""".stripMargin

  /** One fixed-point soft-EM iteration as SQL: Student-t kernel
    * responsibilities normalized per point (integer div, window sum over
    * the K clusters), then responsibility-weighted integer centroid
    * means — the unrolled-CTE replay of [[Similarity.gmmFixedPoint]].
    */
  private def gmmIterSql(centsIn: String, rOut: String, cOut: String): String =
    s"""$rOut AS (
       |  SELECT vec_id, c,
       |    r_raw * ${Similarity.GmmRespScale} // greatest(dn, 1) AS rn
       |  FROM (
       |    SELECT vec_id, c, r_raw,
       |      sum(r_raw) OVER (PARTITION BY vec_id) AS dn
       |    FROM (
       |      SELECT vec_id, c, ${Similarity.GmmKernelNum} // (1 + d2) AS r_raw
       |      FROM (
       |        SELECT elq.vec_id, k.c,
       |          sum((elq.q - k.cq) * (elq.q - k.cq))::BIGINT AS d2
       |        FROM elq JOIN $centsIn k USING (i) GROUP BY 1, 2)))),
       |$cOut AS (
       |  SELECT r.c, elq.i,
       |    sum(r.rn * elq.q) // greatest(sum(r.rn), 1) AS cq
       |  FROM elq JOIN $rOut r USING (vec_id) GROUP BY 1, 2)""".stripMargin

  private val srpLshOracle: String =
    s"""WITH dims AS (
         |  SELECT unnest(generate_series(0,
         |    (SELECT max(len(embedding)) - 1 FROM embeddings))) AS i),
         |pl AS (
         |  SELECT t.t, b.b, dims.i,
         |    CASE WHEN (strpos('0123456789abcdef',
         |        substr(md5(t.t::VARCHAR || '|' || b.b::VARCHAR || '|'
         |          || dims.i::VARCHAR), 1, 1)) - 1) % 2 = 1
         |      THEN 1.0 ELSE -1.0 END AS sg
         |  FROM (SELECT unnest(generate_series(0, ${Similarity.SrpTables - 1}))
         |          AS t) t
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${Similarity.SrpBits - 1}))
         |          AS b) b
         |  CROSS JOIN dims),
         |-- hyperplanes as ordered DOUBLE[] (|tables|*|bits| rows, tiny):
         |-- each dot product is then ONE sequential list fold per
         |-- (vector, hyperplane) row — same index order as the engine's
         |-- fold, and no element-level join/aggregation. The exploded
         |-- element form (unnest + join on i + per-group aggregation)
         |-- buffered ~19M groups at sf1 and OOM'd DuckDB.
         |plv AS (
         |  SELECT t, b, list(sg ORDER BY i) AS sgv FROM pl GROUP BY t, b),
         |dots AS (
         |  SELECT e.vec_id, plv.t, plv.b,
         |    list_dot_product(e.embedding::DOUBLE[], plv.sgv) AS dt
         |  FROM embeddings e CROSS JOIN plv),
         |sigs AS (
         |  SELECT vec_id, t,
         |    sum(CASE WHEN dt >= 0 THEN 1 << b ELSE 0 END)::BIGINT AS sig
         |  FROM dots GROUP BY 1, 2),
         |bk AS (
         |  SELECT vec_id, t * 4294967296 + sig AS bucket FROM sigs),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM bk q JOIN bk c ON q.bucket = c.bucket
         |  WHERE q.vec_id < 10 AND c.vec_id != q.vec_id),
         |ex AS (
         |  SELECT cand.query_id, cand.neighbor_id,
         |    list_cosine_similarity(qe.embedding::DOUBLE[],
         |      ne.embedding::DOUBLE[]) AS cos_raw
         |  FROM cand
         |  JOIN embeddings qe ON qe.vec_id = cand.query_id
         |  JOIN embeddings ne ON ne.vec_id = cand.neighbor_id),
         |rr AS (
         |  SELECT query_id, neighbor_id, round(cos_raw, 6) AS cos,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY round(cos_raw, 6) DESC, neighbor_id) AS rank
         |  FROM ex)
         |SELECT query_id, neighbor_id, cos, rank
         |FROM rr WHERE rank <= ${Similarity.DefaultK}""".stripMargin

  // the full inverted-file path: centroid argmin, nprobe probe cells,
  // candidate join on cell, exact cosine re-rank (shared by the index
  // query and its recall report)
  private val ivfFixedOracle: String =
    s"""WITH c AS (
       |  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv
       |  FROM embeddings WHERE vec_id < ${Similarity.NumCentroids}),
       |sc AS (
       |  SELECT e.vec_id, c.centroid_id,
       |    list_sum(list_transform(range(1, len(cv) + 1),
       |      i -> (e.embedding[i]::DOUBLE - cv[i]) *
       |           (e.embedding[i]::DOUBLE - cv[i]))) AS d2
       |  FROM embeddings e CROSS JOIN c),
       |rk AS (
       |  SELECT vec_id, centroid_id, d2,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY d2, centroid_id) AS rn
       |  FROM sc),
       |asn AS (SELECT vec_id AS neighbor_id, centroid_id AS cell
       |        FROM rk WHERE rn = 1),
       |probe AS (
       |  SELECT vec_id AS query_id, centroid_id AS cell
       |  FROM rk WHERE vec_id < 10 AND rn <= ${Similarity.IvfFixedProbe}),
       |cand AS (
       |  SELECT probe.query_id, asn.neighbor_id
       |  FROM asn JOIN probe ON asn.cell = probe.cell
       |  WHERE asn.neighbor_id != probe.query_id),
       |ex AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    list_cosine_similarity(qe.embedding::DOUBLE[],
       |      ne.embedding::DOUBLE[]) AS cos_raw
       |  FROM cand
       |  JOIN embeddings qe ON qe.vec_id = cand.query_id
       |  JOIN embeddings ne ON ne.vec_id = cand.neighbor_id),
       |rr AS (
       |  SELECT query_id, neighbor_id, cos_raw,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY round(cos_raw, 6) DESC, neighbor_id) AS rank
       |  FROM ex)
       |SELECT query_id, neighbor_id, round(cos_raw, 6) AS cos, rank
       |FROM rr WHERE rank <= ${Similarity.DefaultK}""".stripMargin

  private val pqSearchOracle: String = pqAdcCtes +
    s""",
       |rk AS (
       |  SELECT query_id, neighbor_id, adc_raw,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_raw, neighbor_id) AS rank
       |  FROM adc)
       |SELECT query_id, neighbor_id, round(adc_raw, 6) AS adc, rank
       |FROM rk WHERE rank <= ${Similarity.DefaultK}""".stripMargin

  // the composed FAISS-style index path: PQ codes + per-query LUT
  // (pqAdcCtes prefix) extended with the coarse-cell CTEs, ADC computed
  // ONLY over cell-candidate pairs
  private val ivfPqOracle: String = pqAdcCtes.stripSuffix(")").stripSuffix(
    s"""adc AS (
       |  SELECT lut.query_id, b.vec_id AS neighbor_id,
       |    list_sum(list(lut.d2 ORDER BY b.s)) AS adc_raw
       |  FROM b JOIN lut ON lut.s = b.s AND lut.code = b.code
       |  WHERE b.vec_id != lut.query_id
       |  GROUP BY 1, 2""".stripMargin) +
    s"""cc AS (SELECT vec_id AS centroid_id, v AS cv FROM e
       |      WHERE vec_id < ${Similarity.NumCentroids}),
       |sc AS (
       |  SELECT e.vec_id, cc.centroid_id,
       |    list_sum(list_transform(range(1, len(cv) + 1),
       |      i -> (e.v[i] - cv[i]) * (e.v[i] - cv[i]))) AS d2
       |  FROM e CROSS JOIN cc),
       |crk AS (
       |  SELECT vec_id, centroid_id, d2,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY d2, centroid_id) AS rn
       |  FROM sc),
       |asn AS (SELECT vec_id AS neighbor_id, centroid_id AS cell
       |        FROM crk WHERE rn = 1),
       |probe AS (
       |  SELECT vec_id AS query_id, centroid_id AS cell
       |  FROM crk WHERE vec_id < 10 AND rn <= ${Similarity.IvfFixedProbe}),
       |cand AS (
       |  SELECT probe.query_id, asn.neighbor_id
       |  FROM asn JOIN probe ON asn.cell = probe.cell
       |  WHERE asn.neighbor_id != probe.query_id),
       |adc AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    list_sum(list(lut.d2 ORDER BY b.s)) AS adc_raw
       |  FROM cand
       |  JOIN b ON b.vec_id = cand.neighbor_id
       |  JOIN lut ON lut.query_id = cand.query_id
       |    AND lut.s = b.s AND lut.code = b.code
       |  GROUP BY 1, 2),
       |prk AS (
       |  SELECT query_id, neighbor_id, adc_raw,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_raw, neighbor_id) AS rank
       |  FROM adc)
       |SELECT query_id, neighbor_id, round(adc_raw, 6) AS adc, rank
       |FROM prk WHERE rank <= ${Similarity.DefaultK}""".stripMargin

  /** SQ8 replayed: per-dimension corpus [min, max] → byte codes →
    * midpoint dequantization → ordered-list L2 against the float
    * query; ranks on the ROUND-6 distance then neighbor_id, the same
    * tie algebra the Spark side uses.
    */
  private val sq8Oracle: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v, len(embedding) AS d
       |  FROM embeddings),
       |x AS (SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS i
       |      FROM e),
       |st AS (SELECT i, min(x) AS mn, max(x) AS mx FROM x GROUP BY 1),
       |arrs AS (SELECT list(mn ORDER BY i) AS mns,
       |  list(mx - mn ORDER BY i) AS rngs,
       |  list((mx - mn) / 256.0 ORDER BY i) AS scs FROM st),
       |deq AS (
       |  SELECT e.vec_id, list_transform(range(1, e.d + 1), i ->
       |    arrs.mns[i] + (CAST(CASE WHEN arrs.rngs[i] <= 0 THEN 0
       |      ELSE least(255, greatest(0,
       |        floor((e.v[i] - arrs.mns[i]) / arrs.rngs[i] * 255)))
       |      END AS INT) + 0.5) * arrs.scs[i]) AS dq
       |  FROM e, arrs),
       |q AS (SELECT vec_id AS query_id, v AS qv, d FROM e
       |      WHERE vec_id < 10),
       |scored AS (
       |  SELECT q.query_id, deq.vec_id AS neighbor_id,
       |    round(list_sum(list_transform(range(1, q.d + 1),
       |      i -> (q.qv[i] - deq.dq[i]) * (q.qv[i] - deq.dq[i]))), 6)
       |      AS adc
       |  FROM q JOIN deq ON deq.vec_id != q.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, adc,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc, neighbor_id) AS rn
       |  FROM scored)
       |SELECT query_id, neighbor_id, adc, rn AS rank
       |FROM ranked WHERE rn <= ${Similarity.DefaultK}""".stripMargin

  private val bruteforceOracle: String =
    """WITH q AS (
        |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        |  FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT query_id, e.vec_id AS neighbor_id,
        |    list_cosine_similarity(qv, e.embedding::DOUBLE[]) AS cos_raw
        |  FROM q JOIN embeddings e ON e.vec_id != query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, round(cos_raw, 6) AS cos,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY round(cos_raw, 6) DESC, neighbor_id) AS rn
        |  FROM scored)
        |SELECT query_id, neighbor_id, cos, rn AS rank
        |FROM ranked WHERE rn <= 5""".stripMargin

  val oracles: Map[String, String] = Map(
    "cmeans_fixed_point" ->
      (s"""WITH el AS (
          |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
          |    unnest(embedding)::DOUBLE AS v
          |  FROM embeddings),
          |elq AS (
          |  SELECT vec_id, i, floor(v * ${Similarity.FpScale})::BIGINT AS q
          |  FROM el),
          |c0 AS (SELECT vec_id AS c, i, q AS cq FROM elq
          |       WHERE vec_id < ${Similarity.FpK}),
          |""".stripMargin
        + (1 to Similarity.FpIters)
          .map(k => fpIterSql(s"c${k - 1}", s"a$k", s"c$k")).mkString(",\n") +
        s"""
           |SELECT n.cluster, n.n_points, m.centroid_mass FROM
           |  (SELECT c AS cluster, count(*) AS n_points
           |   FROM a${Similarity.FpIters} GROUP BY 1) n
           |JOIN
           |  (SELECT c AS cluster, sum(cq)::BIGINT AS centroid_mass
           |   FROM c${Similarity.FpIters} GROUP BY 1) m
           |USING (cluster)""".stripMargin),
    // the soft-EM unrolled: same elq quantization as cmeans, GmmIters
    // kernel/normalize/weighted-mean rounds, hard argmax only at the end
    "gmm_fixed_point" ->
      (s"""WITH el AS (
          |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
          |    unnest(embedding)::DOUBLE AS v
          |  FROM embeddings),
          |elq AS (
          |  SELECT vec_id, i, floor(v * ${Similarity.FpScale})::BIGINT AS q
          |  FROM el),
          |g0 AS (SELECT vec_id AS c, i, q AS cq FROM elq
          |       WHERE vec_id < ${Similarity.FpK}),
          |""".stripMargin
        + (1 to Similarity.FpIters)
          .map(k => gmmIterSql(s"g${k - 1}", s"r$k", s"g$k")).mkString(",\n") +
        s""",
           |hard AS (
           |  SELECT vec_id, c FROM (
           |    SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY rn DESC, c) AS rk
           |    FROM r${Similarity.FpIters})
           |  WHERE rk = 1)
           |SELECT n.cluster, n.n_points, rm.resp_mass, m.centroid_mass FROM
           |  (SELECT c AS cluster, count(*)::BIGINT AS n_points
           |   FROM hard GROUP BY 1) n
           |JOIN
           |  (SELECT c AS cluster, sum(rn)::BIGINT AS resp_mass
           |   FROM r${Similarity.FpIters} GROUP BY 1) rm
           |USING (cluster)
           |JOIN
           |  (SELECT c AS cluster, sum(cq)::BIGINT AS centroid_mass
           |   FROM g${Similarity.FpIters} GROUP BY 1) m
           |USING (cluster)""".stripMargin),
    "text_langid" -> TextAnalysis.langIdOracleSql,
    // the stub codec's LCG payload is recomputed bit-exactly in SQL:
    // HUGEINT arithmetic emulates unsigned-64 wraparound, a recursive CTE
    // walks the generator, and mean/entropy come off the byte histogram.
    // The SAME oracle verifies the PNG twin verbatim: the compressed
    // round trip (PNG encode → ImageIO decode) is lossless and its gray
    // tripling cancels out of every feature (Multimodal.pngFeaturesQuery)
    "multimodal_png_features" -> LcgFeaturesOracle,
    "multimodal_features" -> LcgFeaturesOracle,
    "multimodal_audio_features" -> Audio.audioFeaturesOracle,
    "multimodal_resize" ->
      """SELECT doc_id AS media_id,
        |  least((16 + doc_id % 48)::INT, 32) AS width,
        |  least((16 + doc_id % 32)::INT, 32) AS height
        |FROM documents""".stripMargin,
    // same LCG replay as multimodal_features; byte index i-1 maps to
    // frame (i-1) div FrameSize, complete frames only, every
    // FrameStride-th kept — integer stats, exact both sides
    "multimodal_framestats" ->
      s"""WITH RECURSIVE gen(doc_id, i, n, state) AS (
         |  SELECT doc_id, 0::BIGINT,
         |    ((16 + doc_id % 48) * (16 + doc_id % 32))::BIGINT,
         |    ((doc_id::HUGEINT * 6364136223846793005 + 1442695040888963407)
         |      % 18446744073709551616 + 18446744073709551616)
         |      % 18446744073709551616
         |  FROM documents
         |  UNION ALL
         |  SELECT doc_id, i + 1, n,
         |    (state * 6364136223846793005 + 1442695040888963407)
         |      % 18446744073709551616
         |  FROM gen WHERE i < n
         |), bytes AS (
         |  SELECT doc_id, i, n, (state // 72057594037927936)::BIGINT AS b
         |  FROM gen WHERE i >= 1
         |), fr AS (
         |  SELECT doc_id, (i - 1) // ${Multimodal.FrameSize} AS f, b, n
         |  FROM bytes)
         |SELECT doc_id AS media_id, f::INT AS frame_idx,
         |  sum(b)::BIGINT AS frame_sum, min(b)::INT AS frame_min,
         |  max(b)::INT AS frame_max
         |FROM fr
         |WHERE f < n // ${Multimodal.FrameSize}
         |  AND f % ${Multimodal.FrameStride} = 0
         |GROUP BY 1, 2""".stripMargin,
    "gemv" ->
      """SELECT e.vec_id,
        |  round(list_dot_product(e.embedding::DOUBLE[],
        |    x.embedding::DOUBLE[]), 6) AS y
        |FROM embeddings e
        |CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) x""".stripMargin,
    "text_fingerprint" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents
        |), w AS (
        |  SELECT a.doc_id,
        |    min(md5(a.tok || ' ' || b.tok || ' ' || c.tok || ' ' ||
        |            d.tok || ' ' || e.tok)) AS fp
        |  FROM toks a
        |  JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |  JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
        |  JOIN toks d ON a.doc_id = d.doc_id AND d.pos = a.pos + 3
        |  JOIN toks e ON a.doc_id = e.doc_id AND e.pos = a.pos + 4
        |  GROUP BY a.doc_id)
        |SELECT d.doc_id, coalesce(w.fp, md5(d.text)) AS fingerprint
        |FROM documents d LEFT JOIN w ON d.doc_id = w.doc_id""".stripMargin,
    // the decoded header dims are deterministic in media_id, so the SQL
    // oracle re-derives them arithmetically — this hash-checks the whole
    // binary envelope + decode-header path (pixel stats stay rows-only)
    "multimodal_meta" ->
      """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image' ELSE 'audio' END
        |    AS modality,
        |  count(*) AS n_items,
        |  sum(16 + doc_id % 48)::BIGINT AS sum_width,
        |  sum(16 + doc_id % 32)::BIGINT AS sum_height,
        |  sum(8 + (16 + doc_id % 48) * (16 + doc_id % 32))::BIGINT
        |    AS sum_bytes
        |FROM documents GROUP BY 1""".stripMargin,
    // list_sum/list_transform reproduce the codegen'd left-to-right
    // (a-b)^2 accumulation; argmin via rank on the raw double, ties by
    // centroid id, distance rounded to 6 on both sides
    "ann_centroid_assign" ->
      s"""WITH c AS (
         |  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv
         |  FROM embeddings WHERE vec_id < ${Similarity.NumCentroids}),
         |s AS (
         |  SELECT e.vec_id, c.centroid_id,
         |    list_sum(list_transform(range(1, len(cv) + 1),
         |      i -> (e.embedding[i]::DOUBLE - cv[i]) *
         |           (e.embedding[i]::DOUBLE - cv[i]))) AS d2
         |  FROM embeddings e CROSS JOIN c),
         |r AS (
         |  SELECT vec_id, centroid_id, d2,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d2, centroid_id) AS rn
         |  FROM s)
         |SELECT vec_id, centroid_id, round(d2, 6) AS dist2
         |FROM r WHERE rn = 1""".stripMargin,
    // per-subspace sqdist replayed with the same left-to-right list_sum
    // as the centroid oracle; argmin ties broken by code id on both
    // sides; recon_err summed in subspace order (list ORDER BY s)
    "ann_pq_encode" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |    len(embedding) AS d, len(embedding) // ${Similarity.PqSubspaces} AS sd
         |  FROM embeddings),
         |a AS (SELECT vec_id AS code, v AS av FROM e
         |      WHERE vec_id < ${Similarity.PqCodebookSize}),
         |sub AS (
         |  SELECT e.vec_id, a.code, g.s,
         |    list_sum(list_transform(
         |      range(g.s * e.sd + 1,
         |        (CASE WHEN g.s = ${Similarity.PqSubspaces - 1}
         |              THEN e.d ELSE (g.s + 1) * e.sd END) + 1),
         |      i -> (e.v[i] - a.av[i]) * (e.v[i] - a.av[i]))) AS d2
         |  FROM e CROSS JOIN a CROSS JOIN
         |    (SELECT unnest(generate_series(0, ${Similarity.PqSubspaces - 1}))
         |       AS s) g),
         |r AS (
         |  SELECT vec_id, s, code, d2,
         |    row_number() OVER (PARTITION BY vec_id, s
         |      ORDER BY d2, code) AS rn
         |  FROM sub),
         |b AS (SELECT vec_id, s, code, d2 FROM r WHERE rn = 1)
         |SELECT vec_id,
         |  array_to_string(list(code ORDER BY s), ',') AS codes,
         |  round(list_sum(list(d2 ORDER BY s)), 6) AS recon_err
         |FROM b GROUP BY vec_id""".stripMargin,
    // full ADC replay: encode CTEs as in ann_pq_encode, then the query
    // LUT with the same per-subspace list_sum accumulation, ADC summed
    // in subspace order (list ORDER BY s), argmin ties by neighbor id
    "ann_pq_search" -> pqSearchOracle,
    // per-dimension byte quantization replayed end to end: stats →
    // codes → midpoint dequantization → ordered L2 → round-6 rank
    "ann_sq8" -> sq8Oracle,
    // the incrementally-MAINTAINED index: codebook from the ORIGINAL
    // corpus (frozen at build), quantization of the FINAL corpus
    // (replace %10==3 doubled, insert %10==7 shifted +10M, delete the
    // (100, 200] band), same ADC ranks — the oracle IS the rebuild the
    // maintenance must equal; audits are protocol constants
    "ann_sq8_maintained" ->
      s"""WITH base AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v, len(embedding) AS d
         |  FROM embeddings),
         |x AS (SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS i
         |      FROM base),
         |st AS (SELECT i, min(x) AS mn, max(x) AS mx FROM x GROUP BY 1),
         |arrs AS (SELECT list(mn ORDER BY i) AS mns,
         |  list(mx - mn ORDER BY i) AS rngs,
         |  list((mx - mn) / 256.0 ORDER BY i) AS scs FROM st),
         |merged AS (
         |  SELECT vec_id,
         |    CASE WHEN vec_id % 10 = 3
         |      THEN list_transform(v, x -> x * 2) ELSE v END AS v, d
         |  FROM base
         |  UNION ALL
         |  SELECT vec_id + 10000000, v, d FROM base WHERE vec_id % 10 = 7),
         |fc AS (SELECT * FROM merged
         |       WHERE NOT (vec_id > 100 AND vec_id <= 200)),
         |deq AS (
         |  SELECT fc.vec_id, list_transform(range(1, fc.d + 1), i ->
         |    arrs.mns[i] + (CAST(CASE WHEN arrs.rngs[i] <= 0 THEN 0
         |      ELSE least(255, greatest(0,
         |        floor((fc.v[i] - arrs.mns[i]) / arrs.rngs[i] * 255)))
         |      END AS INT) + 0.5) * arrs.scs[i]) AS dq
         |  FROM fc, arrs),
         |q AS (SELECT vec_id AS query_id, v AS qv, d FROM base
         |      WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.query_id, deq.vec_id AS neighbor_id,
         |    round(list_sum(list_transform(range(1, q.d + 1),
         |      i -> (q.qv[i] - deq.dq[i]) * (q.qv[i] - deq.dq[i]))), 6)
         |      AS adc
         |  FROM q JOIN deq ON deq.vec_id != q.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, adc,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY adc, neighbor_id) AS rn
         |  FROM scored)
         |SELECT query_id, neighbor_id, adc, rn AS rank,
         |  1::BIGINT AS index_matches_rebuild,
         |  (SELECT count(*) FROM fc)::BIGINT AS n_index_rows
         |FROM ranked WHERE rn <= ${Similarity.DefaultK}""".stripMargin,
    "ann_recall_sq8" -> (
      "WITH ex AS (SELECT query_id, neighbor_id FROM (" +
        bruteforceOracle + ")),\n" +
        "pq AS (SELECT query_id, neighbor_id FROM (" + sq8Oracle +
        "))\n" +
        """SELECT ex.query_id,
          |  sum(CASE WHEN pq.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
          |    ::BIGINT AS n_hits,
          |  ((sum(CASE WHEN pq.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
          |    ::BIGINT * 100) // count(*))::BIGINT AS recall_x100
          |FROM ex LEFT JOIN pq
          |  ON pq.query_id = ex.query_id
          |  AND pq.neighbor_id = ex.neighbor_id
          |GROUP BY ex.query_id""".stripMargin),
    // exact top-k LEFT JOIN pq top-k, hit-counted per query — both
    // sides are the already-verified oracles above wrapped as subqueries
    "ann_recall_pq" -> (
      "WITH ex AS (SELECT query_id, neighbor_id FROM (" +
        bruteforceOracle + ")),\n" +
        "pq AS (SELECT query_id, neighbor_id FROM (" + pqSearchOracle +
        "))\n" +
        """SELECT ex.query_id,
          |  sum(CASE WHEN pq.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
          |    ::BIGINT AS n_hits,
          |  ((sum(CASE WHEN pq.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
          |    ::BIGINT * 100) // count(*))::BIGINT AS recall_x100
          |FROM ex LEFT JOIN pq
          |  ON pq.query_id = ex.query_id
          |  AND pq.neighbor_id = ex.neighbor_id
          |GROUP BY ex.query_id""".stripMargin),
    "ann_recall_ivfpq" -> (
      "WITH ex AS (SELECT query_id, neighbor_id FROM (" +
        bruteforceOracle + ")),\n" +
        "pq AS (SELECT query_id, neighbor_id FROM (" + ivfPqOracle +
        "))\n" +
        """SELECT ex.query_id,
          |  sum(CASE WHEN pq.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
          |    ::BIGINT AS n_hits,
          |  ((sum(CASE WHEN pq.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
          |    ::BIGINT * 100) // count(*))::BIGINT AS recall_x100
          |FROM ex LEFT JOIN pq
          |  ON pq.query_id = ex.query_id
          |  AND pq.neighbor_id = ex.neighbor_id
          |GROUP BY ex.query_id""".stripMargin),
    // stage 1 = the same ADC CTEs shortlisting top-RefineShortlist;
    // stage 2 re-ranks only those by exact cosine (list_cosine_similarity
    // vs the Spark unit-dot, the proven ann_bruteforce equivalence)
    "ann_pq_refine" -> (pqAdcCtes +
      s""",
         |sl AS (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY adc_raw, neighbor_id) AS arank
         |  FROM adc),
         |ex AS (
         |  SELECT sl.query_id, sl.neighbor_id,
         |    list_cosine_similarity(qe.embedding::DOUBLE[],
         |      ne.embedding::DOUBLE[]) AS cos_raw
         |  FROM sl
         |  JOIN embeddings qe ON qe.vec_id = sl.query_id
         |  JOIN embeddings ne ON ne.vec_id = sl.neighbor_id
         |  WHERE sl.arank <= ${Similarity.RefineShortlist}),
         |rr AS (
         |  SELECT query_id, neighbor_id, cos_raw,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY round(cos_raw, 6) DESC, neighbor_id) AS rank
         |  FROM ex)
         |SELECT query_id, neighbor_id, round(cos_raw, 6) AS cos, rank
         |FROM rr WHERE rank <= ${Similarity.DefaultK}""".stripMargin),
    // the full inverted-file path replayed: centroid argmin (the
    // centroid-assign oracle pattern), nprobe-nearest probe cells,
    // candidate join on cell, exact cosine re-rank
    "ann_ivf_fixed" -> ivfFixedOracle,
    "ann_ivfpq" -> ivfPqOracle,
    // recall@k of the IVF index — same LEFT JOIN counting shape as the
    // SRP recall report, over the replayed IVF and exact subqueries
    "ann_recall_ivf" -> (
      "WITH ex AS (SELECT query_id, neighbor_id FROM (" +
        bruteforceOracle + ")),\n" +
        "ivf AS (SELECT query_id, neighbor_id FROM (" + ivfFixedOracle +
        "))\n" +
        """SELECT ex.query_id,
          |  sum(CASE WHEN ivf.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
          |    ::BIGINT AS n_hits,
          |  ((sum(CASE WHEN ivf.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
          |    ::BIGINT * 100) // count(*))::BIGINT AS recall_x100
          |FROM ex LEFT JOIN ivf
          |  ON ivf.query_id = ex.query_id
          |  AND ivf.neighbor_id = ex.neighbor_id
          |GROUP BY ex.query_id""".stripMargin),
    // the WHOLE approximate index replayed: md5-parity plane signs,
    // left-to-right signature dots on raw vectors (sign is
    // norm-invariant), bucket-collision candidates, exact cosine re-rank
    // (the proven bruteforce equivalence)
    "ann_srp_lsh" -> srpLshOracle,
    // recall@k of the replayed index against the replayed exact answer —
    // the report itself is pure integer counting over the two
    // subqueries. Concatenated (NOT stripMargin-interpolated: the outer
    // stripMargin would mangle the inner oracles' || concats)
    "ann_recall_srp" -> (
      "WITH ex AS (SELECT query_id, neighbor_id FROM (" +
        bruteforceOracle + ")),\n" +
        "srp AS (SELECT query_id, neighbor_id FROM (" + srpLshOracle + "))\n" +
        """SELECT ex.query_id,
          |  sum(CASE WHEN srp.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
          |    ::BIGINT AS n_hits,
          |  ((sum(CASE WHEN srp.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
          |    ::BIGINT * 100) // count(*))::BIGINT AS recall_x100
          |FROM ex LEFT JOIN srp
          |  ON srp.query_id = ex.query_id
          |  AND srp.neighbor_id = ex.neighbor_id
          |GROUP BY ex.query_id""".stripMargin),
    "ann_bruteforce" -> bruteforceOracle,
    // the power method replayed: per-iteration Xv (descaled), X'y,
    // then the integer renormalization by max|z| div 1e6 + 1
    "ml_pca_power" -> {
      val iters = (1 to Similarity.PcaIters).map { r =>
        s"""y$r AS (
           |  SELECT elq.vec_id,
           |    (sum(elq.q * v.vq) // ${Similarity.FpScale})::BIGINT AS yd
           |  FROM elq JOIN v${r - 1} v USING (i) GROUP BY 1),
           |z$r AS MATERIALIZED (
           |  SELECT elq.i, sum(elq.q * y.yd)::BIGINT AS z
           |  FROM elq JOIN y$r y USING (vec_id) GROUP BY 1),
           |m$r AS (
           |  SELECT (max(abs(z)) // ${Similarity.PcaScale} + 1)::BIGINT
           |    AS d
           |  FROM z$r),
           |v$r AS (
           |  SELECT z.i, (z.z // m.d)::BIGINT AS vq
           |  FROM z$r z CROSS JOIN m$r m)""".stripMargin
      }.mkString(",\n")
      s"""WITH el AS (
         |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         |    unnest(embedding)::DOUBLE AS v
         |  FROM embeddings),
         |elq AS MATERIALIZED (
         |  SELECT vec_id, i, floor(v * ${Similarity.FpScale})::BIGINT AS q
         |  FROM el),
         |v0 AS (SELECT DISTINCT i, ${Similarity.PcaScale}::BIGINT AS vq
         |  FROM elq),
         |$iters
         |SELECT i, vq FROM v${Similarity.PcaIters}""".stripMargin
    },
    // the radius variant of the proven bruteforce replay: threshold on
    // the round-6 cosine instead of a rank cut
    "ann_range_search" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id < 10),
         |scored AS (
         |  SELECT query_id, e.vec_id AS neighbor_id,
         |    round(list_cosine_similarity(qv, e.embedding::DOUBLE[]), 6)
         |      AS cos
         |  FROM q JOIN embeddings e ON e.vec_id != query_id),
         |hits AS (SELECT * FROM scored
         |  WHERE cos >= ${graft.ops.Similarity.RangeTau})
         |SELECT query_id, neighbor_id, cos,
         |  row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id) AS rank
         |FROM hits""".stripMargin,
    // per-column base stats UNION'd + the shared HLL register replay
    // over the stringified column values
    "stats_table" -> {
      val base = StatCols.map(c =>
        s"""SELECT '$c' AS source, count(*)::BIGINT AS n_rows,
           |  (count(*) - count($c))::BIGINT AS n_null,
           |  count(DISTINCT $c)::BIGINT AS n_exact,
           |  min($c)::VARCHAR AS min_s, max($c)::VARCHAR AS max_s
           |FROM lineitem""".stripMargin).mkString("\nUNION ALL\n")
      val valUnion = StatCols.map(c =>
        s"SELECT '$c' AS source, $c::VARCHAR AS tok FROM lineitem " +
          s"WHERE $c IS NOT NULL").mkString("\nUNION ALL\n")
      s"""WITH v AS (
         |$valUnion),
         |d AS (SELECT source, ${graft.ops.Sketches.sqlH48("tok")} AS h
         |      FROM v),
         |""".stripMargin + graft.ops.Sketches.sqlHllEstCtes +
        s""",
           |base AS (
           |$base)
           |SELECT base.source AS col_name, base.n_rows, base.n_null,
           |  base.n_exact AS ndv, est.hll_est,
           |  ${graft.ops.Sketches.sqlHllLc("est")} AS ndv_lc,
           |  abs(est.hll_est - base.n_exact) * 100 // base.n_exact
           |    AS err_pct,
           |  base.min_s, base.max_s
           |FROM base JOIN est ON base.source = est.source""".stripMargin
    },
    "text_corpus_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  sum(length(text))::BIGINT AS sum_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY lang, source""".stripMargin,
    "text_token_stats" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z0-9]{1,4}')) +
        |    len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS bpe_tokens,
        |  length(text) AS n_chars
        |FROM documents""".stripMargin,
    "text_quality" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    length(text)::BIGINT AS n_chars,
        |    (CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END)::BIGINT AS n_tokens,
        |    len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))::BIGINT AS n_punct,
        |    len(regexp_extract_all(text,
        |      '(?i)\b(the|a|an|of|and|or|to|in|is|it|that|this|for|on|with|as|at|by|be)\b'))::BIGINT AS n_stop
        |  FROM documents)
        |SELECT doc_id, (
        |  (CASE WHEN n_chars BETWEEN 200 AND 5000 THEN 3
        |        WHEN n_chars >= 100 THEN 2
        |        WHEN n_chars >= 20 THEN 1 ELSE 0 END) +
        |  (CASE WHEN n_tokens = 0 THEN 0
        |        WHEN n_chars >= n_tokens * 3 AND n_chars < n_tokens * 9 THEN 3
        |        WHEN n_chars >= n_tokens * 2 THEN 1 ELSE 0 END) +
        |  (CASE WHEN n_punct * 10 <= n_chars THEN 3
        |        WHEN n_punct * 4 <= n_chars THEN 1 ELSE 0 END) +
        |  (CASE WHEN n_stop * 5 >= n_tokens THEN 3
        |        WHEN n_stop * 20 >= n_tokens THEN 1 ELSE 0 END)
        |  )::INT AS quality_points
        |FROM base""".stripMargin
  )

  /** Retrieval-family oracles live here because the hybrid fusion
    * replay embeds [[bruteforceOracle]] (its vector arm) verbatim —
    * the same reuse the recall reports rely on.
    */
  val retrievalOracles: Map[String, String] = Map(
    "text_bm25" -> graft.ops.Retrieval.bm25Oracle,
    "ann_hybrid_rrf" -> graft.ops.Retrieval.rrfOracle(bruteforceOracle),
    // the production fusion: identical RRF arithmetic, the IVFPQ arm's
    // already-verified replay swapped in for the exact scan
    "ann_hybrid_ivfpq" -> graft.ops.Retrieval.rrfOracle(ivfPqOracle),
    // exact-exact fusion LEFT JOIN production fusion, hit-counted per
    // query — the hybrid member of the recall-report family
    "ann_recall_hybrid" -> (
      "WITH exf AS (SELECT query_id, doc_id FROM (" +
        graft.ops.Retrieval.rrfOracle(bruteforceOracle) + ")),\n" +
        "apf AS (SELECT query_id, doc_id FROM (" +
        graft.ops.Retrieval.rrfOracle(ivfPqOracle) + "))\n" +
        """SELECT exf.query_id,
          |  sum(CASE WHEN apf.doc_id IS NOT NULL THEN 1 ELSE 0 END)
          |    ::BIGINT AS n_hits,
          |  ((sum(CASE WHEN apf.doc_id IS NOT NULL THEN 1 ELSE 0 END)
          |    ::BIGINT * 100) // count(*))::BIGINT AS recall_x100
          |FROM exf LEFT JOIN apf
          |  ON apf.query_id = exf.query_id AND apf.doc_id = exf.doc_id
          |GROUP BY exf.query_id""".stripMargin))
}
