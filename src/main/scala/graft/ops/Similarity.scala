package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Approximate-nearest-neighbor search over an embedding column
  * (north star, SURVEY.md §2.5).
  *
  *  - [[bruteForceTopK]] is the exact baseline: broadcast the (small)
  *    query set against the corpus, rank per query. One scan of the
  *    corpus, no corpus-side shuffle — at 100 TB this is the right
  *    *exact* plan as long as the query set stays broadcastable.
  *  - [[lshTopK]] is the scale path: L independent random-hyperplane
  *    tables of b sign bits each; a vector lands in one bucket per table
  *    and a query scores only the union of its L buckets. Cost per query
  *    drops from O(corpus) to O(candidates); recall is
  *    1 - (1 - p^b)^L with p = 1 - θ/π, tuned by (b, L) — the classic
  *    space-for-recall trade (the index is L entries per vector).
  *
  * Hyperplanes are derived from a fixed seed so results are deterministic
  * across runs and partitionings.
  */
object Similarity {

  val DefaultK = 5
  val SignatureBits = 6
  val NumTables = 16

  import graft.functions.VectorOps.{vec_dot, vec_unit}

  /** Unit-normalized double vector — cosine then reduces to a codegen'd
    * dot product per candidate pair.
    */
  private def asUnit(c: Column): Column = vec_unit(transform(c, _.cast("double")))

  /** Exact top-k neighbors for each query vector (query_id != neighbor). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = OpUtil.spread(corpus)
      .select(col("vec_id").as("neighbor_id"), asUnit(col("embedding")).as("cv"))
    val q = queries.select(col("vec_id").as("query_id"), asUnit(col("embedding")).as("qv"))
    // rank on the ROUND-6 cosine (the cross-engine-stable value), id
    // tiebreak: raw doubles differ in the last bits between engines and
    // a near-tie at the rank-k boundary would flip set membership
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(vec_dot(col("qv"), col("cv")), 6).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Deterministic random hyperplanes: dim doubles per bit, from a seeded
    * generator (tiny: bits x dim).
    */
  def hyperplanes(bits: Int, dim: Int, seed: Long = 0x9e3779b9L): Array[Array[Double]] = {
    val rnd = new java.util.SplittableRandom(seed)
    Array.fill(bits, dim)(rnd.nextGaussian())
  }

  /** Sign-bit signature of a vector under the hyperplane family. */
  def signatureOf(v: Array[Double], planes: Array[Array[Double]]): Int = {
    var sig = 0
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      var dot = 0.0
      var i = 0
      while (i < v.length && i < p.length) { dot += v(i) * p(i); i += 1 }
      if (dot >= 0) sig |= 1 << b
      b += 1
    }
    sig
  }

  /** LSH-bucketed ANN: L hyperplane tables, bucket key = (table, sig);
    * candidates = bucket collisions in any table, then exact-rank within
    * the candidate set.
    */
  def lshTopK(s: SparkSession, corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = SignatureBits, tables: Int = NumTables): DataFrame = {
    import s.implicits._
    val dimOpt = corpus.select(size(col("embedding"))).as[Int]
      .limit(1).collect().headOption
    if (dimOpt.isEmpty) {
      // empty corpus → empty result, same contract as ivfTopK
      import org.apache.spark.sql.types._
      return s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("query_id", LongType), StructField("neighbor_id", LongType),
          StructField("cos", DoubleType), StructField("rank", IntegerType))))
    }
    val dim = dimOpt.get
    val planes = s.sparkContext.broadcast(
      Array.tabulate(tables)(t => hyperplanes(bits, dim, 0x9e3779b9L + 0x61c88647L * t)))

    val bucketsUdf = udf { (v: Seq[Double]) =>
      val arr = v.toArray
      planes.value.indices.map(t =>
        (t.toLong << 32) | (signatureOf(arr, planes.value(t)) & 0xffffffffL))
    }

    val c = OpUtil.spread(corpus)
      .select(col("vec_id").as("neighbor_id"), asUnit(col("embedding")).as("cv"))
      .select(col("neighbor_id"), col("cv"),
        explode(bucketsUdf(col("cv"))).as("bucket"))
    val q = queries.select(col("vec_id").as("query_id"),
      asUnit(col("embedding")).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(bucketsUdf(col("qv"))).as("bucket"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(vec_dot(col("qv"), col("cv")), 6).as("cos"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Lloyd k-means over an in-memory sample — the coarse-quantizer
    * trainer. Deterministic: init = first k sample vectors, ties to the
    * lower cell. The quantizer only ever sees a bounded sample (centroids
    * must be broadcastable anyway), so training is a driver-local loop —
    * no per-iteration Spark jobs.
    */
  def lloyd(sample: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "lloyd: empty training sample")
    val dim = sample.head.length
    // a sample smaller than k trains that many cells (never index past it)
    var centroids = sample.take(k).map(_.clone)
    val kEff = centroids.length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kEff)(new Array[Double](dim))
      val counts = new Array[Long](kEff)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < kEff) {
          val ctr = centroids(c)
          var d = 0.0; var j = 0
          while (j < dim) { val t = v(j) - ctr(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        val su = sums(best)
        var j = 0
        while (j < dim) { su(j) += v(j); j += 1 }
      }
      centroids = Array.tabulate(kEff) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }
      it += 1
    }
    centroids
  }

  /** IVF (inverted-file) ANN: a coarse k-means quantizer partitions the
    * corpus into cells; each query scores only its `nprobe` nearest
    * cells. The classic big-index layout: centroids are tiny and
    * broadcastable, cell assignment is one map pass, and the candidate
    * set per query is corpus/cells * nprobe.
    */
  def ivfTopK(s: SparkSession, corpus: DataFrame, queries: DataFrame, k: Int,
      cells: Int = 16, nprobe: Int = 4): DataFrame = {
    import s.implicits._

    val c = OpUtil.spread(corpus)
      .select(col("vec_id").as("neighbor_id"), asUnit(col("embedding")).as("cv"))
    // train the coarse quantizer on a bounded, deterministic sample — at
    // corpus scale the quantizer never needs (or fits) the full data
    val trainSample = c.orderBy(col("neighbor_id")).limit(4096)
      .select(col("cv")).as[Seq[Double]].collect().map(_.toArray)
    if (trainSample.isEmpty) {
      // empty corpus → empty result (not a quantizer crash)
      import org.apache.spark.sql.types._
      return s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("query_id", LongType), StructField("neighbor_id", LongType),
          StructField("cos", DoubleType), StructField("rank", IntegerType))))
    }
    val centroids = s.sparkContext.broadcast(lloyd(trainSample, cells, iters = 5))

    def nearestCells(n: Int) = udf { (v: Seq[Double]) =>
      val arr = v.toArray
      centroids.value.zipWithIndex.map { case (ctr, i) =>
        var d = 0.0
        var j = 0
        while (j < arr.length && j < ctr.length) {
          val diff = arr(j) - ctr(j); d += diff * diff; j += 1
        }
        (d, i)
      }.sortBy(_._1).take(n).map(_._2).toSeq
    }

    val assigned = c.withColumn("cell", nearestCells(1)(col("cv"))(0))
    val probed = queries
      .select(col("vec_id").as("query_id"), asUnit(col("embedding")).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(nearestCells(nprobe)(col("qv"))).as("cell"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_raw").desc, col("neighbor_id"))
    assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        vec_dot(col("qv"), col("cv")).as("cos_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_raw"), 6).as("cos"), col("rank"))
  }

  def annIvf(s: SparkSession, dir: String): DataFrame =
    ivfTopK(s, Tables.embeddings(s, dir), queryVectors(s, dir), DefaultK)

  /** First N vec_ids serve as the standing query set for the driver
    * registrations (deterministic, oracle-friendly).
    */
  def queryVectors(s: SparkSession, dir: String, n: Int = 10): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") < n)

  def annBruteForce(s: SparkSession, dir: String): DataFrame =
    bruteForceTopK(Tables.embeddings(s, dir), queryVectors(s, dir), DefaultK)

  val RangeTau = 0.3

  /** RADIUS search — the other half of the similarity-search API next
    * to top-k: every corpus vector with round-6 cosine >= tau of each
    * query ("all near-duplicates of these seeds", the retrieval shape
    * behind semantic dedup sweeps and blocklist expansion). Same
    * broadcast-query / corpus-streams plan as [[bruteForceTopK]] — one
    * codegen'd dot per (row, query), NO corpus shuffle, output bounded
    * by the match count rather than k. Rank rides along (cos desc, id)
    * for a deterministic presentation order.
    */
  def rangeSearch(corpus: DataFrame, queries: DataFrame,
      tau: Double = RangeTau): DataFrame = {
    val c = OpUtil.spread(corpus)
      .select(col("vec_id").as("neighbor_id"), asUnit(col("embedding")).as("cv"))
    val q = queries.select(col("vec_id").as("query_id"),
      asUnit(col("embedding")).as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(vec_dot(col("qv"), col("cv")), 6).as("cos"))
      .filter(col("cos") >= tau)
      .withColumn("rank", row_number().over(w))
  }

  def annRangeSearch(s: SparkSession, dir: String): DataFrame =
    rangeSearch(Tables.embeddings(s, dir), queryVectors(s, dir))

  def annLsh(s: SparkSession, dir: String): DataFrame =
    lshTopK(s, Tables.embeddings(s, dir), queryVectors(s, dir), DefaultK)

  /** Nearest-centroid assignment — the partitioning primitive inside IVF
    * (and one Lloyd iteration of k-means): every vector goes to its
    * closest of `NumCentroids` fixed centroid vectors by squared L2.
    * With deterministic centroids (the lowest vec_ids) this step, unlike
    * the iterative clusterings, IS oracle-checkable — so the bucketing
    * arithmetic the approximate indexes rely on gets a cross-engine
    * hash check. Shape at scale: centroids broadcast, one codegen'd
    * distance loop per (row, centroid), argmin as a combinable
    * min-of-struct aggregation — no shuffle of the corpus at all.
    */
  val NumCentroids = 8

  def centroidAssign(corpus: DataFrame): DataFrame = {
    import graft.functions.VectorOps.vec_sqdist
    val emb = corpus.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    val cents = broadcast(emb.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv")))
    OpUtil.spread(emb)
      .crossJoin(cents)
      .select(col("vec_id"), col("centroid_id"),
        vec_sqdist(col("v"), col("cv")).as("d2"))
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("centroid_id"))).as("best"))
      .select(col("vec_id"), col("best.centroid_id").as("centroid_id"),
        round(col("best.d2"), 6).as("dist2"))
  }

  def annCentroidAssign(s: SparkSession, dir: String): DataFrame =
    centroidAssign(Tables.embeddings(s, dir))

  /** Product-quantization encoding — the compression step that makes
    * billion-vector ANN indexes fit in memory: split each vector into
    * [[PqSubspaces]] subvectors, quantize each against a per-subspace
    * codebook, store only the code ids (here 8 x 4 bits = 4 bytes per
    * vector instead of 256 bytes of floats). Codebooks are the
    * subvectors of the [[PqCodebookSize]] lowest-id vectors —
    * deterministic data-sampled anchors, so unlike a k-means-trained
    * codebook the whole encode is oracle-checkable; the iterative
    * trainer exists separately as [[lloyd]]. Shape at scale: the
    * codebook is broadcast, each row meets K anchor rows with M
    * codegen'd distance loops, and the per-subspace argmin is the same
    * combinable min-of-struct as [[centroidAssign]] — one aggregation,
    * no corpus shuffle. The reconstruction error (sum of per-subspace
    * quantization errors) is the quality metric an index builder
    * monitors.
    */
  val PqSubspaces = 8
  val PqCodebookSize = 16

  /** Hard cap on a [[pqSearch]] query batch. The per-query LUT is
    * collected to the driver and broadcast (queries × M × K doubles), so
    * the batch must stay driver-sized; 4096 queries × 8 × 16 doubles is
    * ~4 MB of LUT — ample for an online top-k service shape, tiny for
    * the driver. Larger batches are a different workload (a join, not a
    * search) and must be split by the caller; the guard makes the
    * "tiny by contract" collect fail loudly instead of OOMing quietly.
    */
  val PqMaxQueryBatch = 4096

  /** Per-vector PQ quantization, wide form: one struct column b{s} =
    * (d{s}, code) per subspace — the shared core of [[pqEncode]] and
    * [[pqSearch]]. Input must carry (vec_id, v: array<double>).
    */
  private def pqCodesWide(emb: DataFrame): DataFrame = {
    import graft.functions.VectorOps.vec_sqdist
    val m = PqSubspaces
    val anchors = broadcast(emb.filter(col("vec_id") < PqCodebookSize)
      .select(col("vec_id").as("code"), col("v").as("av")))
    // subspace s covers [s*sd, (s+1)*sd) with the remainder folded into
    // the last subspace, so every dimension is quantized exactly once
    val dists = (0 until m).map { s =>
      val start = col("sd") * s + 1
      val len = if (s == m - 1) size(col("v")) - col("sd") * (m - 1) else col("sd")
      vec_sqdist(slice(col("v"), start, len), slice(col("av"), start, len)).as(s"d$s")
    }
    val scored = OpUtil.spread(emb)
      .withColumn("sd", expr(s"size(v) div $m"))
      .crossJoin(anchors)
      .select(col("vec_id") +: col("code") +: dists: _*)
    val aggs = (0 until m).map(s => min(struct(col(s"d$s"), col("code"))).as(s"b$s"))
    scored.groupBy("vec_id").agg(aggs.head, aggs.tail: _*)
  }

  def pqEncode(corpus: DataFrame): DataFrame = {
    val m = PqSubspaces
    val emb = corpus.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    pqCodesWide(emb)
      .select(col("vec_id"),
        concat_ws(",", (0 until m).map(s => col(s"b$s.code")): _*).as("codes"),
        round((0 until m).map(s => col(s"b$s.d$s")).reduce(_ + _), 6)
          .as("recon_err"))
  }

  def annPqEncode(s: SparkSession, dir: String): DataFrame =
    pqEncode(Tables.embeddings(s, dir))

  /** PQ asymmetric-distance search (ADC — Jégou et al. 2011): the corpus
    * exists only as 4-bit-per-subspace codes; each query precomputes a
    * tiny lookup table of per-subspace distances to every codebook
    * anchor, and scoring a corpus vector is M table lookups + adds —
    * no float vector is ever touched at scan time. This is THE
    * billion-scale ANN layout: the LUT is queries x M x K doubles
    * (broadcast), the codes are bytes, and the scan is one codegen-able
    * pass + a per-query top-k. The LUT distance arithmetic replays
    * vec_sqdist's left-to-right accumulation exactly, and ADC sums
    * subspaces in order, so the whole index path is hash-checkable
    * against a DuckDB replay of encode + LUT + rank.
    */
  /** The ADC scorer shared by [[pqSearch]] and [[ivfPqTopK]]: builds the
    * per-query LUT driver-side (anchors and queries are tiny by contract
    * — the codebook must broadcast for ANY PQ index; accumulation order
    * matches vec_sqdist's sequential (a-b)² adds over the subspace
    * slice) and returns the (query_id, codes) → distance UDF.
    */
  private def pqAdcScorer(s: SparkSession, emb: DataFrame,
      queries: DataFrame): org.apache.spark.sql.expressions.UserDefinedFunction = {
    import s.implicits._
    val m = PqSubspaces
    val anchors = emb.filter(col("vec_id") < PqCodebookSize)
      .orderBy(col("vec_id")).select(col("vec_id"), col("v"))
      .as[(Long, Seq[Double])].collect().map(_._2.toArray)
    // take(cap+1), not collect(): bounds driver memory even when the
    // contract is violated, and one extra row is enough to detect it
    val qVecs = queries.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Seq[Double])].take(PqMaxQueryBatch + 1)
    require(qVecs.length <= PqMaxQueryBatch,
      s"pqSearch: query batch exceeds PqMaxQueryBatch=$PqMaxQueryBatch — " +
        "the per-query LUT is driver-collected and broadcast; split the batch")
    val lut: Map[Long, Array[Array[Double]]] = qVecs.map { case (qid, qv) =>
      val q = qv.toArray
      val dim = q.length
      val sd = dim / m
      qid -> Array.tabulate(m) { sub =>
        val start = sub * sd
        val end = if (sub == m - 1) dim else (sub + 1) * sd
        anchors.map { av =>
          var d = 0.0
          var i = start
          while (i < end && i < av.length) {
            val t = q(i) - av(i); d += t * t; i += 1
          }
          d
        }
      }
    }.toMap
    val lutB = s.sparkContext.broadcast(lut)
    udf { (qid: Long, cs: Seq[Int]) =>
      val t = lutB.value(qid)
      var sum = 0.0
      var i = 0
      while (i < cs.length) { sum += t(i)(cs(i)); i += 1 }
      sum
    }
  }

  def pqSearch(s: SparkSession, corpus: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    import s.implicits._
    val m = PqSubspaces
    val emb = corpus.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    val codes = pqCodesWide(emb)
      .select(col("vec_id").as("neighbor_id"),
        array((0 until m).map(i => col(s"b$i.code").cast("int")): _*).as("codes"))
    val adc = pqAdcScorer(s, emb, queries)
    val qIds = queries.select(col("vec_id").as("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_raw"), col("neighbor_id"))
    codes.crossJoin(broadcast(qIds))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_raw", adc(col("query_id"), col("codes")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("adc_raw"), 6).as("adc"), col("rank"))
  }

  def annPqSearch(s: SparkSession, dir: String): DataFrame =
    pqSearch(s, Tables.embeddings(s, dir), queryVectors(s, dir), DefaultK)

  /** Two-stage retrieval: ADC shortlists [[RefineShortlist]] candidates
    * from the codes-only index, then ONLY those rows fetch their float
    * vectors for an exact cosine re-rank — the standard
    * recall-vs-memory production layout (quantized first pass, exact
    * second pass over a vanishing fraction of the corpus). The shortlist
    * is broadcast back against the corpus scan, so stage two reads
    * corpus-side vectors for shortlist rows only — no corpus shuffle in
    * either stage.
    */
  val RefineShortlist = 20

  def pqSearchRefined(s: SparkSession, corpus: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val shortlist = pqSearch(s, corpus, queries, RefineShortlist)
      .select(col("query_id"), col("neighbor_id"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      asUnit(col("embedding")).as("cv"))
    val q = queries.select(col("vec_id").as("query_id"),
      asUnit(col("embedding")).as("qv"))
    // round-6 rank with id tiebreak: cross-engine-stable (see ivfFixed)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cos_raw"), 6).desc, col("neighbor_id"))
    c.join(broadcast(shortlist), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        vec_dot(col("qv"), col("cv")).as("cos_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_raw"), 6).as("cos"), col("rank"))
  }

  def annPqRefine(s: SparkSession, dir: String): DataFrame =
    pqSearchRefined(s, Tables.embeddings(s, dir), queryVectors(s, dir), DefaultK)

  /** Sign-random-projection LSH with md5-DERIVED Rademacher (+1/-1)
    * hyperplanes: plane entry (t, b, i) is +1 iff the first md5 nibble
    * of "t|b|i" is odd. Same index structure and recall math as
    * [[lshTopK]] (sign-bit signatures, L tables, bucket-collision
    * candidates, exact re-rank), but because the planes derive from the
    * shared md5 hash family instead of seeded Gaussians, the ENTIRE
    * approximate index — plane construction, signatures, bucketing,
    * candidate join, re-rank — replays in SQL and is hash-checked
    * cross-engine; the Gaussian variant stays a rows-only check.
    * Signature dots accumulate left-to-right over dimensions on both
    * sides, and run on the RAW vectors — the sign is norm-invariant, so
    * skipping the unit division keeps the float arithmetic identical to
    * the SQL replay (a divide-then-sum could flip a near-zero sign).
    */
  val SrpTables = 16
  val SrpBits = 6

  /** +1/-1 from the first md5 hex nibble's parity of "t|b|i". */
  /** Scalar quantization (SQ8, faiss's `SQ8` / Milvus `SQ8` layout):
    * each dimension is uniformly quantized to one byte against the
    * corpus's per-dimension [min, max] — a 4x/8x memory cut that, at
    * 100 TB, is the difference between an index that fits the fleet's
    * RAM and one that doesn't. Search is ASYMMETRIC: the query stays
    * float, each corpus vector is scored against its dequantized form
    * `mn_i + (code_i + 0.5) * (mx_i - mn_i)/256` — one multiply-add per
    * dimension off a byte, no float vector read at scan time. The
    * per-dimension stats are a DIMS-sized frame collected once
    * (broadcast as literals — the SQ codebook, tiny by construction,
    * same contract as the PQ anchors); scoring is a sequential
    * zip_with/aggregate fold so the oracle's ordered `list_sum` replays
    * it exactly, and ranks order by the ROUND-6 distance then
    * neighbor_id so ties are engine-stable. Complements [[pqSearch]]:
    * SQ8 preserves per-dimension resolution (better recall, more
    * memory); PQ compresses subspaces (less memory, coarser). The
    * recall report (`ann_recall_sq8`) is hash-gated like every index
    * family's.
    */
  def sq8TopK(s: SparkSession, corpus: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    import s.implicits._
    val emb = corpus.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    val stats = emb.select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("i").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("i").as[(Int, Double, Double)].collect()
    val mnA = array(stats.map(t => lit(t._2)).toIndexedSeq: _*)
    val rngA = array(stats.map(t => lit(t._3 - t._2)).toIndexedSeq: _*)
    val scA = array(stats.map(t => lit((t._3 - t._2) / 256.0))
      .toIndexedSeq: _*)
    val codes = emb
      .withColumn("codes", transform(col("v"), (x, i) => {
        val mn = element_at(mnA, i + 1)
        val rng = element_at(rngA, i + 1)
        when(rng <= 0, lit(0)).otherwise(
          least(lit(255), greatest(lit(0),
            floor((x - mn) / rng * 255).cast("int"))))
      }))
      // the dequantized view, derived from codes + the broadcast stats
      // (the float vector column is NOT read past encode)
      .withColumn("deq", transform(col("codes"), (c, i) =>
        element_at(mnA, i + 1) +
          (c.cast("double") + lit(0.5)) * element_at(scA, i + 1)))
      .select(col("vec_id").as("neighbor_id"), col("deq"))
    val q = queries.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc"), col("neighbor_id"))
    codes.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", round(aggregate(
        zip_with(col("qv"), col("deq"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("adc"), col("rank"))
  }

  def annSq8(s: SparkSession, dir: String): DataFrame =
    sq8TopK(s, Tables.embeddings(s, dir), queryVectors(s, dir), DefaultK)

  def srpSign(t: Int, b: Int, i: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$t|$b|$i".getBytes("UTF-8"))
    if (((h(0) >> 4) & 1) == 1) 1 else -1
  }

  def srpLshTopK(s: SparkSession, corpus: DataFrame, queries: DataFrame,
      k: Int, bits: Int = SrpBits, tables: Int = SrpTables): DataFrame = {
    import s.implicits._
    // plane arrays sized from the PROBED max embedding width (as the
    // oracle sizes them from max(len(embedding))) — a fixed 256 would
    // index out of bounds on wider embeddings. One column-pruned agg
    // scan; at corpus scale read the width from table metadata instead.
    // max over an empty corpus is one NULL row, not zero rows — probe
    // through Row, not an Int encoder (which throws on the null)
    val dim = corpus.select(max(size(col("embedding")))).collect()
      .headOption.collect { case r if !r.isNullAt(0) => r.getInt(0) }
      .filter(_ > 0).getOrElse(0)
    if (dim == 0) {
      import org.apache.spark.sql.types._
      return s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("query_id", LongType), StructField("neighbor_id", LongType),
          StructField("cos", DoubleType), StructField("rank", IntegerType))))
    }
    val planes = s.sparkContext.broadcast(
      Array.tabulate(tables, bits) { (t, b) =>
        Array.tabulate(dim)(i => srpSign(t, b, i))
      })
    val bucketsUdf = udf { (v: Seq[Double]) =>
      val arr = v.toArray
      (0 until tables).map { t =>
        var sig = 0
        var b = 0
        while (b < bits) {
          val p = planes.value(t)(b)
          var dot = 0.0
          var i = 0
          val n = math.min(arr.length, p.length)
          while (i < n) { dot += arr(i) * p(i); i += 1 }
          if (dot >= 0) sig |= 1 << b
          b += 1
        }
        (t.toLong << 32) | (sig & 0xffffffffL)
      }
    }
    val rawV = transform(col("embedding"), _.cast("double"))
    val c = OpUtil.spread(corpus)
      .select(col("vec_id").as("neighbor_id"), asUnit(col("embedding")).as("cv"),
        explode(bucketsUdf(rawV)).as("bucket"))
    val q = queries
      .select(col("vec_id").as("query_id"), asUnit(col("embedding")).as("qv"),
        explode(bucketsUdf(rawV)).as("bucket"))
    // round-6 rank key + id tiebreak: cross-engine-stable (see
    // bruteForceTopK) — raw-double ties at the rank-k boundary were the
    // one intermittent hash flake in round 4's recall report
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(vec_dot(col("qv"), col("cv")), 6).as("cos"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  def annSrpLsh(s: SparkSession, dir: String): DataFrame =
    srpLshTopK(s, Tables.embeddings(s, dir), queryVectors(s, dir), DefaultK)

  /** IVF-PQ — the two layouts composed the way a production index
    * (FAISS IVFPQ) actually ships: the coarse quantizer restricts each
    * query to its [[IvfFixedProbe]] nearest cells, and WITHIN those
    * cells candidates are scored by PQ asymmetric distance (codes + the
    * broadcast per-query LUT) — the corpus is touched only as 4-bit
    * codes, and only the probed fraction of it. Both stages are the
    * deterministic variants (`fixedCells` + the md5-free fixed
    * codebook), so the full composed path hash-checks against a DuckDB
    * replay of assign → probe → candidate → ADC → rank.
    *
    * Scale shape: cells and codes are each ONE broadcast-join pass over
    * the corpus (no shuffle but the per-cell groupings); per query the
    * scan cost is corpus/cells × nprobe code lookups — the
    * billion-scale layout's cost model, here with every stage exact.
    */
  def ivfPqTopK(s: SparkSession, corpus: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val m = PqSubspaces
    val emb = corpus.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    val qemb = queries.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    val assigned = fixedCells(emb, OpUtil.spread(emb), "neighbor_id", 1)
    val probed = fixedCells(emb, qemb, "query_id", IvfFixedProbe)
    val codes = pqCodesWide(emb)
      .select(col("vec_id").as("neighbor_id"),
        array((0 until m).map(i => col(s"b$i.code").cast("int")): _*)
          .as("codes"))
    val adc = pqAdcScorer(s, emb, queries)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_raw"), col("neighbor_id"))
    assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(codes, "neighbor_id")
      .withColumn("adc_raw", adc(col("query_id"), col("codes")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("adc_raw"), 6).as("adc"), col("rank"))
  }

  def annIvfPq(s: SparkSession, dir: String): DataFrame =
    ivfPqTopK(s, Tables.embeddings(s, dir), queryVectors(s, dir), DefaultK)

  /** IVF over DETERMINISTIC cells: the coarse quantizer is the
    * [[centroidAssign]] primitive (fixed lowest-id centroid vectors, not
    * k-means-trained), queries probe their [[IvfFixedProbe]] nearest
    * cells, candidates re-rank exactly — the same index layout as
    * [[ivfTopK]] but with every stage a deterministic function of the
    * data, so the full inverted-file path (assign → probe → candidate →
    * re-rank) is hash-checked in SQL; the Lloyd-trained variant stays
    * rows-only. Same scale shape: centroids broadcast, one argmin pass
    * over the corpus, candidate set = corpus/cells x nprobe per query.
    */
  val IvfFixedProbe = 2

  /** Deterministic coarse-cell assignment shared by [[ivfFixedTopK]] and
    * [[ivfPqTopK]]: argmin (keep=1) or top-`keep` nearest of the fixed
    * lowest-id centroids, ties to the lower centroid id.
    */
  private def fixedCells(emb: DataFrame, df: DataFrame, idCol: String,
      keep: Int): DataFrame = {
    import graft.functions.VectorOps.vec_sqdist
    val cents = broadcast(emb.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv")))
    val scored = df.crossJoin(cents)
      .select(col("vec_id").as(idCol), col("centroid_id"),
        vec_sqdist(col("v"), col("cv")).as("d2"))
    if (keep == 1)
      scored.groupBy(idCol)
        .agg(min(struct(col("d2"), col("centroid_id"))).as("best"))
        .select(col(idCol), col("best.centroid_id").as("cell"))
    else {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("d2"), col("centroid_id"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= keep)
        .select(col(idCol), col("centroid_id").as("cell"))
    }
  }

  def ivfFixedTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val emb = corpus.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    def cellsOf(df: DataFrame, idCol: String, keep: Int): DataFrame =
      fixedCells(emb, df, idCol, keep)
    val assigned = cellsOf(OpUtil.spread(emb), "neighbor_id", 1)
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        asUnit(col("embedding")).as("cv")), "neighbor_id")
    val probed = cellsOf(queries.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v")),
        "query_id", IvfFixedProbe)
      .join(queries.select(col("vec_id").as("query_id"),
        asUnit(col("embedding")).as("qv")), "query_id")
    // rank on the ROUND-6 cosine (the cross-engine-stable value) with id
    // tiebreak — raw-double ulp drift at the rank-k boundary was round
    // 4's one intermittent hash flake on the srp path
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cos_raw"), 6).desc, col("neighbor_id"))
    assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        vec_dot(col("qv"), col("cv")).as("cos_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_raw"), 6).as("cos"), col("rank"))
  }

  def annIvfFixed(s: SparkSession, dir: String): DataFrame =
    ivfFixedTopK(Tables.embeddings(s, dir), queryVectors(s, dir), DefaultK)

  /** Lloyd's k-means in INTEGER FIXED POINT — the paper's own C-means
    * benchmark family (BASELINE.md Table 3), made exactly reproducible:
    * coordinates quantize to floor(v*1000) integers, distances are
    * integer squared-L2, new centroids are integer-division means, and
    * ties break to the lower cluster id. Two full Lloyd iterations then
    * a final assignment — every number along the way is a BIGINT, so
    * the whole ITERATIVE clustering hash-checks cross-engine (the
    * float MLlib k-means/GMM stay rows-only; this is their
    * deterministic twin, like srp-lsh/ivf-fixed are for the ANN pair).
    * Shape at scale: data lives in long (vec, dim, q) form; each
    * iteration is one broadcast of the K x dim centroid table, one
    * combinable per-vector argmin, and one combinable centroid mean —
    * no driver loops over data, only over the 2 iteration indices.
    */
  val FpK = 4
  val FpIters = 2
  val FpScale = 1000

  def cmeansFixedPoint(corpus: DataFrame): DataFrame = {
    val el = OpUtil.spread(corpus)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v")))
      .select(col("vec_id"), col("i"),
        floor(col("v").cast("double") * FpScale).cast("long").as("q"))
      .cache()
    var cents = el.filter(col("vec_id") < FpK)
      .select(col("vec_id").as("c"), col("i"), col("q").as("cq"))
    var assign: DataFrame = null
    for (_ <- 1 to FpIters) {
      assign = el.join(broadcast(cents), "i")
        .groupBy(col("vec_id"), col("c"))
        .agg(sum((col("q") - col("cq")) * (col("q") - col("cq"))).as("d2"))
        .groupBy("vec_id")
        .agg(min(struct(col("d2"), col("c"))).as("best"))
        .select(col("vec_id"), col("best.c").as("c"))
      cents = el.join(assign, "vec_id")
        .groupBy(col("c"), col("i"))
        .agg(expr("sum(q) div count(1)").as("cq"))
    }
    assign.groupBy("c").agg(count(lit(1)).as("n_points"))
      .join(cents.groupBy("c").agg(sum(col("cq")).as("centroid_mass")), "c")
      .select(col("c").as("cluster"), col("n_points"), col("centroid_mass"))
  }

  def cmeansFixedPointQuery(s: SparkSession, dir: String): DataFrame =
    cmeansFixedPoint(Tables.embeddings(s, dir))

  val PcaScale = 1000000L
  val PcaIters = 10

  /** Dominant principal component by POWER ITERATION in integer fixed
    * point — the dimensionality-reduction primitive (PCA top
    * eigenvector of the uncentered second-moment matrix X'X) made
    * exactly reproducible the same way the clustering twins are:
    * coordinates quantize to floor(v·1000), each iteration computes
    * y = Xv (per-row dot, descaled by 1000) then z = X'y (per-column
    * combinable sum) then renormalizes to ~1e6 fixed point by the
    * integer division z div (max|z| div 1e6 + 1) — every number a
    * BIGINT, every divide truncating, so the iterate is bit-identical
    * cross-engine (a float power method drifts in the last ulp per
    * sum). The matrix is never materialized: each iteration is two
    * combinable aggregations over the (vec, dim, q) long form plus one
    * O(1) driver max — the textbook distributed power method.
    * Overflow: |z| ≤ n·64·1e9-ish per column — int64-safe to ~1e8
    * rows. Past that the CALLER must cast the products to DECIMAL(38,0)
    * before summing (as linregMulti does): sum() over LongType stays
    * LongType and wraps silently in non-ANSI Spark — no auto promotion.
    */
  def pcaPower(corpus: DataFrame): DataFrame = {
    // Cache the long form ALREADY hash-partitioned on vec_id: every
    // iteration's y-aggregation (groupBy vec_id) and y-join (on vec_id)
    // then reuse the cached partitioning, so the ×10 iteration loop
    // re-shuffles only the 64-row per-column partials, never the corpus.
    val el = OpUtil.spread(corpus)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v")))
      .select(col("vec_id"), col("i"),
        floor(col("v").cast("double") * FpScale).cast("long").as("q"))
      .repartition(col("vec_id"))
      .cache()
    var v = el.select(col("i")).distinct()
      .select(col("i"), lit(PcaScale).as("vq"))
    for (_ <- 1 to PcaIters) {
      val y = el.join(broadcast(v), "i")
        .groupBy("vec_id")
        .agg(expr(s"sum(q * vq) div $FpScale").as("yd"))
      val z = el.join(y, "vec_id")
        .groupBy("i").agg(sum(col("q") * col("yd")).as("z"))
        .localCheckpoint(true) // consumed by the max probe AND the rescale
      val d = z.agg(max(abs(col("z")))).head().getLong(0) / PcaScale + 1L
      v = z.select(col("i"), expr(s"z div $d").as("vq"))
    }
    v
  }

  def pcaPowerQuery(s: SparkSession, dir: String): DataFrame =
    pcaPower(Tables.embeddings(s, dir))

  /** Soft-EM mixture fitting in INTEGER FIXED POINT — the deterministic
    * twin of the float MLlib `gmm_clusters` (the same role
    * [[cmeansFixedPoint]] plays for cmeans, closing the last rows-only
    * family without an oracle-checked sibling). A Gaussian
    * responsibility needs exp(), which can't cross engines
    * integer-exact, so the E-step uses the rational Student-t/Cauchy
    * kernel 1/(1+d2) — the standard heavy-tailed mixture relative
    * (t-SNE's affinity kernel) — scaled to [[GmmKernelNum]] and
    * normalized per point into [[GmmRespScale]] fixed point, every
    * divide an integer `div` in a fixed order. The M-step is the
    * responsibility-weighted integer mean. What makes this GMM-shaped
    * rather than k-means-shaped is exactly the SOFT assignment: every
    * cluster receives mass from every point, which also kills the
    * empty-cluster edge case by construction.
    *
    * Shape at scale: identical to [[cmeansFixedPoint]] — per iteration
    * one broadcast-sized K x dim centroid table, one combinable
    * per-vector kernel + per-point normalize, one combinable weighted
    * centroid sum; the driver loops only over the [[FpIters]] iteration
    * indices. Overflow: rn <= 1e6 and |q| <= FpScale x |coord|, so the
    * weighted sums stay under 2^63 up to ~1e9 points per cluster at
    * these scales.
    */
  val GmmKernelNum = 1000000000000L // 1e12 kernel numerator
  val GmmRespScale = 1000000L // 1e6 normalized-responsibility fixed point

  def gmmFixedPoint(corpus: DataFrame): DataFrame = {
    val el = OpUtil.spread(corpus)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v")))
      .select(col("vec_id"), col("i"),
        floor(col("v").cast("double") * FpScale).cast("long").as("q"))
      .cache()
    var cents = el.filter(col("vec_id") < FpK)
      .select(col("vec_id").as("c"), col("i"), col("q").as("cq"))
    var resp: DataFrame = null
    for (_ <- 1 to FpIters) {
      val rraw = el.join(broadcast(cents), "i")
        .groupBy(col("vec_id"), col("c"))
        .agg(sum((col("q") - col("cq")) * (col("q") - col("cq"))).as("d2"))
        .select(col("vec_id"), col("c"),
          expr(s"$GmmKernelNum div (1 + d2)").as("r_raw"))
      val denom = rraw.groupBy("vec_id").agg(sum(col("r_raw")).as("dn"))
      resp = rraw.join(denom, "vec_id")
        .select(col("vec_id"), col("c"),
          expr(s"r_raw * $GmmRespScale div greatest(dn, 1L)").as("rn"))
      cents = el.join(resp, "vec_id")
        .groupBy(col("c"), col("i"))
        .agg(expr("sum(rn * q) div greatest(sum(rn), 1L)").as("cq"))
    }
    // final E-step responsibilities feed three outputs; cache or the
    // two-iteration lineage re-executes per consumer
    resp = resp.cache()
    val hard = resp
      .groupBy("vec_id")
      .agg(min(struct((-col("rn")).as("nr"), col("c").as("c"))).as("best"))
      .select(col("vec_id"), col("best.c").as("c"))
    hard.groupBy("c").agg(count(lit(1)).as("n_points"))
      .join(resp.groupBy("c").agg(sum(col("rn")).as("resp_mass")), "c")
      .join(cents.groupBy("c").agg(sum(col("cq")).as("centroid_mass")), "c")
      .select(col("c").as("cluster"), col("n_points"), col("resp_mass"),
        col("centroid_mass"))
  }

  def gmmFixedPointQuery(s: SparkSession, dir: String): DataFrame =
    gmmFixedPoint(Tables.embeddings(s, dir))
}
