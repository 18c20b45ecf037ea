package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed sketches — the sub-linear summaries a 100 TB pipeline
  * leans on when exact state would not fit: KMV for distinct counts,
  * count-min for frequency estimates, and a Bloom filter as a join
  * pre-filter. The reference's combiner stage
  * (`src/PandaLib.cu:302-379`) proves combinable per-key state is the
  * core primitive; each sketch here is exactly such a state, made
  * mergeable so Spark runs it map-side partial + reduce-side final.
  *
  * Everything is keyed off md5 (the one hash family Spark and DuckDB
  * share), truncated to 48 bits so all arithmetic stays in exact BIGINT
  * range on both engines — which is what makes these *estimating*
  * structures fully hash-checkable cross-engine: the estimates are
  * deterministic functions of the data, only their ERROR vs the exact
  * answer is probabilistic.
  */
object Sketches {

  val KmvK = 32
  val CmDepth = 4
  val CmWidth = 256
  val CmTopK = 20
  val BloomBits = 16384
  val BloomHashes = 3

  /** 48-bit md5-derived hash (12 hex nibbles → BIGINT, always positive). */
  def h48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** The same 48-bit hash as a DuckDB SQL expression (per-nibble strpos
    * fold — DuckDB has no hex→int conv).
    */
  def sqlH48(e: String): String =
    s"list_reduce(list_transform(string_split(substr(md5($e), 1, 12), ''), " +
      "c -> (strpos('0123456789abcdef', c) - 1)::BIGINT), (a, b) -> a * 16 + b)"

  /** K-minimum-values state: the k smallest DISTINCT hash values seen.
    * Bounded (k longs) and order-insensitive, so it is safe as a
    * map-side partial aggregate however large the input — the classic
    * mergeable-NDV-sketch contract (Bar-Yossef et al. 2002).
    */
  class KMinValues(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty
    override def reduce(b: Seq[Long], v: Long): Seq[Long] = insert(b, v)
    override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
      b2.foldLeft(b1)(insert)
    override def finish(b: Seq[Long]): Seq[Long] = b
    override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
    private def insert(b: Seq[Long], v: Long): Seq[Long] = {
      if (b.contains(v)) b
      else if (b.size < k) (b :+ v).sorted
      else if (v >= b.last) b
      else (b.init :+ v).sorted
    }
  }

  /** Per-source distinct-token estimate via KMV: keep the [[KmvK]]
    * smallest 48-bit token hashes per source; the kth smallest estimates
    * NDV as (k-1) * 2^48 / kth (all integer, so the estimate is
    * bit-identical cross-engine). The exact distinct count rides along
    * as the error check — at real scale you would drop it and keep only
    * the sketch.
    */
  def kmvDistinct(docs: DataFrame): DataFrame = {
    val session = docs.sparkSession
    val kmv = udaf(new KMinValues(KmvK))
    session.udf.register("graft_kmv", kmv)
    val numerator = (KmvK - 1).toLong * (1L << 48)
    val d = OpUtil.spread(docs)
      .select(col("source"), explode(split(col("text"), " ", -1)).as("tok"))
      .filter(length(col("tok")) > 0)
      .distinct()
    d.select(col("source"), col("tok"), h48(col("tok")).as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_exact"), kmv(col("h")).as("mins"))
      .select(col("source"), col("n_exact"),
        size(col("mins")).cast("long").as("n_kept"),
        element_at(col("mins"), size(col("mins"))).as("kth_hash"))
      .withColumn("ndv_est",
        when(col("n_kept") < KmvK, col("n_kept"))
          .otherwise(expr(s"$numerator div kth_hash")))
  }

  /** Count-min sketch over the token stream: [[CmDepth]] hash rows x
    * [[CmWidth]] buckets of summed counters (one combinable aggregation
    * — the sketch is CmDepth*CmWidth cells regardless of corpus size),
    * then the [[CmTopK]] exact-top tokens are estimated back off the
    * sketch (min over rows) next to their true counts. cm_est >= exact
    * always; equality when no collision — the overestimate column IS the
    * sketch's error, surfaced.
    */
  def countMinTopTokens(docs: DataFrame): DataFrame = {
    val toks = OpUtil.spread(docs)
      .select(explode(split(col("text"), " ", -1)).as("tok"))
      .filter(length(col("tok")) > 0)
    val rows = array((0 until CmDepth).map(lit): _*)
    val cells = toks
      .select(col("tok"), explode(rows).as("r"))
      .select(col("r"),
        pmod(h48(concat(col("r"), lit("|"), col("tok"))), lit(CmWidth))
          .as("bucket"))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
    val top = toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok")).limit(CmTopK)
    top
      .select(col("tok"), col("exact_cnt"), explode(rows).as("r"))
      .withColumn("bucket",
        pmod(h48(concat(col("r"), lit("|"), col("tok"))), lit(CmWidth)))
      .join(broadcast(cells), Seq("r", "bucket"))
      .groupBy("tok", "exact_cnt")
      .agg(min(col("cnt")).as("cm_est"))
      .select(col("tok"), col("exact_cnt"), col("cm_est"),
        (col("cm_est") - col("exact_cnt")).as("over_err"))
  }

  /** Bloom-filter join pre-filter: build a [[BloomBits]]-bit /
    * [[BloomHashes]]-hash filter over the BUILDING-segment customer keys
    * (represented as the sorted array of set bit positions — small
    * enough to broadcast), probe every order through it, and account
    * exactly: rows passing the filter vs truly matching vs false
    * positives. This is the runtime-filter pattern that turns a 100 TB
    * fact-dim join into a scan-side drop (Spark's own InSubquery/DPP
    * runtime filters work the same way); surfacing the false-positive
    * count oracle-checks the whole bit arithmetic.
    */
  def bloomJoinStats(customer: DataFrame, orders: DataFrame): DataFrame = {
    val build = customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("key")).distinct()
      .cache() // feeds both the position build and the truth marker join
    val hashes = array((0 until BloomHashes).map(lit): _*)
    val positions = build
      .select(explode(hashes).as("j"), col("key"))
      .select(pmod(h48(concat(col("j"), lit("|"), col("key").cast("string"))),
        lit(BloomBits)).as("p"))
      .distinct()
      .cache() // three joins below each broadcast this same tiny table
    // membership = every probe position present in the set-bit table.
    // One broadcast HASH join per hash function (O(1) per lookup) — an
    // array_contains against the position array would be a linear scan
    // of all set bits per probe row, ~BloomBits/2 compares x rows x
    // hashes; measured 4s vs 0.4s at sf0.1
    def probePos(j: Int) =
      pmod(h48(concat(lit(j), lit("|"), col("o_custkey").cast("string"))),
        lit(BloomBits))
    val probed = (0 until BloomHashes).foldLeft(
      orders.select(col("o_orderpriority"), col("o_custkey"))) { (df, j) =>
      df.join(
        broadcast(positions.select(col("p").as(s"p$j"),
          lit(1).as(s"hit$j"))),
        probePos(j) === col(s"p$j"), "left_outer")
        .drop(s"p$j")
    }
    val pass = (0 until BloomHashes)
      .map(j => col(s"hit$j").isNotNull)
      .reduce(_ && _)
    probed
      .join(broadcast(build.withColumn("is_b", lit(1))),
        col("o_custkey") === col("key"), "left_outer")
      .select(col("o_orderpriority"), pass.cast("int").as("pass"),
        coalesce(col("is_b"), lit(0)).as("is_b"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("pass")).as("n_pass"),
        sum(col("is_b")).as("n_true"),
        sum(when(col("pass") === 1 && col("is_b") === 0, 1L).otherwise(0L))
          .as("n_false_pos"))
  }

  val AmsRows = 8

  /** AMS (Alon-Matias-Szegedy) second-moment sketch: F2 = sum of squared
    * token frequencies (the collision mass / self-join size — what a
    * planner wants before joining on a key, and the repetition signal of
    * a token stream). Each of [[AmsRows]] estimators keeps one integer,
    * sum(s_j(tok) * c_tok) with s_j = +/-1 from md5 parity; its square
    * is an unbiased F2 estimate, and the row-mean is the sketch output.
    * All-integer arithmetic (signs, counts, squares), so estimate and
    * error are exact cross-engine; the sign is a codegen'd column
    * expression, no UDF. One combinable aggregation per (source, row) —
    * the sketch state is AmsRows integers per source however large the
    * stream.
    */
  def amsF2(docs: DataFrame): DataFrame = {
    val counts = OpUtil.spread(docs)
      .select(col("source"), explode(split(col("text"), " ", -1)).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .cache() // exact F2 and the sketch both fold this table
    val exact = counts.groupBy("source")
      .agg(sum(col("c") * col("c")).as("f2_exact"))
    val rows = array((0 until AmsRows).map(lit): _*)
    val sign = (conv(substring(md5(concat(col("j"), lit("|"), col("tok"))), 1, 1),
      16, 10).cast("long") % 2) * 2 - 1
    val est = counts
      .select(col("source"), col("tok"), col("c"), explode(rows).as("j"))
      .groupBy("source", "j")
      .agg(sum(sign * col("c")).as("x"))
      .groupBy("source")
      .agg(expr(s"sum(x * x) div $AmsRows").as("ams_est"))
    exact.join(est, "source")
      .select(col("source"), col("f2_exact"), col("ams_est"),
        expr("abs(ams_est - f2_exact) * 100 div f2_exact").as("err_pct"))
  }

  val HllBuckets = 64 // 2^6 registers
  val HllRemBits = 42 // 48-bit hash minus the 6 bucket bits
  // alpha_64 ~ 0.709 as a rational, folded with m^2 once so both engines
  // evaluate the same single literal
  val HllAlphaM2 = 709L * HllBuckets * HllBuckets / 1000
  val HllNumerator = HllAlphaM2 * (1L << (HllRemBits + 1))

  /** HyperLogLog distinct-token estimate per source — the register-array
    * sketch every warehouse ships (`approx_count_distinct` is exactly
    * this): bucket = top 6 hash bits, register = max leading-zero run of
    * the remaining 42 bits. State is [[HllBuckets]] bytes per source no
    * matter the stream size, and max-per-register is combinable, so
    * Spark runs it map-side partial + reduce-side final like any count.
    *
    * The raw-estimate arithmetic (harmonic mean x alpha*m^2) is done
    * entirely in BIGINTs: 2^-register sums scale by 2^43 to stay
    * integral, alpha*m^2 collapses to one precomputed literal, and every
    * divide is an integer `div` in a fixed order — so like the KMV/AMS
    * sketches the estimate is bit-identical cross-engine and only its
    * ERROR vs the exact count (surfaced as err_pct) is probabilistic.
    * The leading-zero count rides on `bin()` string length, which both
    * engines define identically (unpadded, bin(0)='0'). The small-range
    * linear-counting correction needs ln(), which has no integer-exact
    * cross-engine form — but its domain here is just V in 1..m zero
    * registers, so BOTH engines index the same precomputed
    * [[HllLcTable]] literal and the corrected estimate hash-checks
    * exactly like the raw one (surfaced as `hll_lc`).
    */
  /** Register build: (source, bucket) -> max leading-zero rank. Works on
    * the RAW token stream — max is duplicate-insensitive, so no distinct
    * pass is needed (which is also what makes the same build legal as a
    * streaming aggregation with bounded sources x m state).
    */
  def hllRegisters(toks: DataFrame): DataFrame = {
    val maxRho = HllRemBits + 1
    toks
      .select(col("source"), h48(col("tok")).as("h"))
      .withColumn("bucket", expr(s"h div ${1L << HllRemBits}"))
      .withColumn("w", col("h") % (1L << HllRemBits))
      .withColumn("rho", when(col("w") === 0, lit(maxRho))
        .otherwise(lit(maxRho) - length(bin(col("w")))))
      .groupBy("source", "bucket")
      .agg(max(col("rho")).as("r"))
  }

  /** Linear-counting lookup: round(m * ln(m / V)) for V zero registers,
    * V in 1..m (a register only exists once touched, and touched
    * registers have rho >= 1, so V = m - m_used exactly). 64 literals
    * shared verbatim with the oracle SQL — the whole reason the
    * correction can be hash-checked despite the float ln inside.
    */
  val HllLcTable: IndexedSeq[Long] = (1 to HllBuckets).map(v =>
    BigDecimal(HllBuckets * math.log(HllBuckets.toDouble / v))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)

  /** Classic small-range bound: apply linear counting when the raw
    * estimate is at most 2.5m and some register is still zero.
    */
  val HllLcThreshold: Long = 5L * HllBuckets / 2

  /** DRIVER-side register finalize — the exact integer arithmetic of
    * [[hllFinalize]] over one in-memory register array (the manifest
    * NDV stats group's consumer, [[graft.sources.SnapshotTable.ndvOf]]):
    * same numerator literal, same fixed divide order, same
    * [[HllLcTable]] correction, so a driver estimate from manifest
    * registers is BIT-IDENTICAL to the query-level `hll_regs` path
    * over the same rows — what lets the NDV gate hash-check against
    * the DuckDB oracle.
    */
  def estimateFromRegs(regs: Array[Int]): Long = {
    val m = regs.length
    if (m != HllBuckets) return estimateFromRegsWide(regs)
    val maxRho = HllRemBits + 1
    val used = regs.filter(_ > 0)
    val mUsed = used.length.toLong
    val sUsed = used.map(r => 1L << (maxRho - r)).sum
    val est = HllNumerator /
      (sUsed + (HllBuckets - mUsed) * (1L << maxRho))
    if (HllBuckets - mUsed > 0 && est <= HllLcThreshold)
      HllLcTable((HllBuckets - mUsed).toInt - 1)
    else est
  }

  /** [[estimateFromRegs]] for NON-default register widths (the
    * configurable manifest-NDV knob, [[graft.sources.SnapshotTable
    * .buildNdvIndex]]'s `registers` parameter): the width is the
    * array's own length, the geometry matches [[graft.functions
    * .HllRegsAgg]] (bucket = top log2(m) of 48 hash bits), and the
    * arithmetic is the classic double-precision HLL (alpha_m harmonic
    * mean, linear counting under 2.5m) — DRIVER-side only, so unlike
    * the 64-register default it carries no cross-engine bit-equality
    * contract (none of the hash-checked gates run at other widths;
    * the error-shrink property is spec-pinned instead).
    */
  private def estimateFromRegsWide(regs: Array[Int]): Long = {
    val m = regs.length
    require(m >= 16 && Integer.bitCount(m) == 1,
      s"register array width $m is not a power of two >= 16")
    val alpha =
      if (m == 16) 0.673 else if (m == 32) 0.697 else 0.7213 / (1.0 + 1.079 / m)
    val s = regs.map(r => math.pow(2.0, -r)).sum
    val est = alpha * m * m / s
    val zeros = regs.count(_ == 0)
    if (zeros > 0 && est <= 2.5 * m)
      math.round(m * math.log(m.toDouble / zeros))
    else math.round(est)
  }

  /** Merge register arrays: slot-wise max (HLL's union). Widths must
    * agree — a group built at one register count never merges with
    * another ([[graft.sources.SnapshotTable.ndvOf]] withdraws instead).
    */
  def mergeRegs(a: Array[Int], b: Array[Int]): Array[Int] = {
    require(a.length == b.length,
      s"HLL register width mismatch: ${a.length} vs ${b.length}")
    Array.tabulate(a.length)(i => math.max(a(i), b(i)))
  }

  /** Fold a register array to a NARROWER power-of-two width — EXACT
    * under the top-bits bucket geometry ([[graft.functions.HllRegsAgg]]:
    * bucket = top log2(m) bits of the 48-bit hash, rho over the
    * remaining bits). Narrowing by d index bits moves the old bucket
    * index's LOW d bits into the rho domain, where their bit length is
    * known from the index alone, so each narrow register is the max
    * over its 2^d wide registers of:
    *
    *   - nothing for untouched registers (no hash ever landed there);
    *   - `reg + d` when the low d index bits are zero (the old
    *     suffix keeps its bit length; d high zero bits extend the
    *     rank by exactly d);
    *   - `(d + 1) - bitlen(low bits)` otherwise (the new suffix's
    *     first 1 bit sits inside the migrated index bits — the same
    *     value for EVERY hash of that register, so the stored max is
    *     irrelevant and "touched" is all that matters).
    *
    * The result is bit-identical to a native narrow build over the
    * same rows — what lets [[graft.sources.SnapshotTable.ndvOf]] keep
    * estimating through a register-width migration (files stamped at
    * mixed widths) instead of withdrawing until a full rebuild.
    */
  def downfoldRegs(regs: Array[Int], m1: Int): Array[Int] = {
    val m2 = regs.length
    require(m1 >= 16 && Integer.bitCount(m1) == 1 &&
        Integer.bitCount(m2) == 1 && m1 <= m2,
      s"downfold needs nested power-of-two widths >= 16, got $m2 -> $m1")
    if (m1 == m2) return regs
    val d = Integer.numberOfTrailingZeros(m2) -
      Integer.numberOfTrailingZeros(m1)
    val out = new Array[Int](m1)
    var j = 0
    while (j < m2) {
      val r = regs(j)
      if (r > 0) {
        val low = j & ((1 << d) - 1)
        val v =
          if (low == 0) r + d
          else (d + 1) - (32 - Integer.numberOfLeadingZeros(low))
        val i = j >>> d
        if (v > out(i)) out(i) = v
      }
      j += 1
    }
    out
  }

  /** Fold registers into the integer raw estimate (plus the
    * linear-counting-corrected `hll_lc`) and join the exact reference:
    * (source, n_exact, m_used, hll_est, hll_lc, err_pct).
    */
  def hllFinalize(reg: DataFrame, exact: DataFrame): DataFrame = {
    val maxRho = HllRemBits + 1
    hllEstimate(
      reg.groupBy("source")
        .agg(count(lit(1)).as("m_used"),
          sum(expr(s"shiftleft(cast(1 as bigint), $maxRho - r)")).as("s_used")),
      exact)
  }

  /** Shared estimate/correction/report tail over a (source, m_used,
    * s_used) frame — both register representations (row-per-touched-
    * bucket and native array) funnel through here so the constants and
    * the [[HllLcTable]] literals can't drift between paths.
    */
  private def hllEstimate(folded: DataFrame, exact: DataFrame): DataFrame = {
    val maxRho = HllRemBits + 1
    folded
      .withColumn("hll_est", expr(
        s"$HllNumerator div " +
          s"(s_used + ($HllBuckets - m_used) * ${1L << maxRho})"))
      .withColumn("hll_lc", expr(
        s"CASE WHEN $HllBuckets - m_used > 0 AND hll_est <= $HllLcThreshold" +
          s" THEN element_at(array(${HllLcTable.mkString(", ")})," +
          s" cast($HllBuckets - m_used AS int))" +
          " ELSE hll_est END").cast("long"))
      .join(exact, "source")
      .select(col("source"), col("n_exact"), col("m_used"), col("hll_est"),
        col("hll_lc"),
        expr("abs(hll_est - n_exact) * 100 div n_exact").as("err_pct"))
  }

  /** Finalize from the NATIVE register array ([[graft.functions
    * .HllRegsAgg]]): m_used/s_used fold over the 64-slot array instead
    * of grouped rows, then the shared estimate tail.
    */
  def hllFinalizeArray(reg: DataFrame, exact: DataFrame): DataFrame = {
    val maxRho = HllRemBits + 1
    hllEstimate(
      reg.select(col("source"),
        expr("size(filter(reg, r -> r > 0))").cast("long").as("m_used"),
        expr(s"aggregate(filter(reg, r -> r > 0), cast(0 as bigint), " +
          s"(a, r) -> a + shiftleft(cast(1 as bigint), $maxRho - r))")
          .as("s_used")),
      exact)
  }

  /** Shared prep for both HLL queries: the cached token stream and the
    * exact per-source NDV reference that both register paths fold.
    */
  private def hllPrep(docs: DataFrame): (DataFrame, DataFrame) = {
    val d = OpUtil.spread(docs)
      .select(col("source"), explode(split(col("text"), " ", -1)).as("tok"))
      .filter(length(col("tok")) > 0)
      .cache() // register build and the exact reference both fold this
    val exact = d.select(col("source"), col("tok")).distinct()
      .groupBy("source").agg(count(lit(1)).as("n_exact"))
    (d, exact)
  }

  def hllDistinct(docs: DataFrame): DataFrame = {
    val (d, exact) = hllPrep(docs)
    hllFinalize(hllRegisters(d), exact)
  }

  /** [[hllDistinct]] with the registers built by the native
    * [[graft.functions.HllRegsAgg]] aggregate in ONE pass: 64 bytes of
    * map-side state per (partition, source) replace the intermediate
    * (source, bucket) shuffle of the composed path. Same h48 input and
    * rho definition → identical registers → same DuckDB oracle.
    */
  def hllDistinctNative(docs: DataFrame): DataFrame = {
    val (d, exact) = hllPrep(docs)
    val reg = d.select(col("source"), h48(col("tok")).as("h"))
      .groupBy("source")
      .agg(graft.functions.HllRegsAgg.hll_regs(col("h")).as("reg"))
    hllFinalizeArray(reg, exact)
  }

  /** Cross-source overlap estimation from MERGED sketches (the theta-
    * sketch set-operation pattern): for every source pair, the union
    * KMV is the k smallest hashes of the combined streams — a legal KMV
    * again, because KMV states merge — and the intersection estimate is
    * (common-in-sample / k) x union-estimate: the sample of k smallest
    * union hashes is a uniform sample of the union, so its fraction
    * landing in BOTH sources estimates the Jaccard. This is the sketch
    * answer to "how much does source A duplicate source B" — no
    * re-scan of either source once per-source sketches exist. Exact
    * union/intersection ride along as error references. All integer.
    */
  def kmvOverlap(docs: DataFrame): DataFrame = {
    val kmv = udaf(new KMinValues(KmvK))
    val d = OpUtil.spread(docs)
      .select(col("source"), explode(split(col("text"), " ", -1)).as("tok"))
      .filter(length(col("tok")) > 0)
      .distinct()
      .select(col("source"), col("tok"), h48(col("tok")).as("h"))
      .select(col("source"), col("h")).distinct()
      .cache()
    // ONE scan builds every per-source state: k longs + exact size each.
    // Everything pairwise below runs on this S-row table of bounded
    // arrays — the token-hash table is never re-read per pair.
    val sk = d.groupBy("source")
      .agg(kmv(col("h")).as("mins"), count(lit(1)).as("n"))
    val pairs = sk.select(col("source").as("source_a"),
        col("mins").as("mins_a"), col("n").as("na"))
      .crossJoin(sk.select(col("source").as("source_b"),
        col("mins").as("mins_b"), col("n").as("nb")))
      .filter(col("source_a") < col("source_b"))
    // exact intersection reference: ONE self-equi-join on h (the
    // declared error column, droppable at real scale)
    val inter = d.select(col("source").as("source_a"), col("h"))
      .join(d.select(col("source").as("source_b"), col("h")), "h")
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("exact_inter"))
    val numerator = (KmvK - 1).toLong * (1L << 48)
    // KMV merge is lossless for the union's k minima: any of the k
    // smallest union hashes is among ITS source's k smallest, so the k
    // smallest distinct values of the two k-lists ARE the union sample —
    // and membership of a sampled hash in either source is exact via
    // that source's list (sample values never exceed either kth). The
    // estimates are therefore bit-identical to a merged-stream replay.
    pairs
      .withColumn("sample", slice(
        array_sort(array_distinct(concat(col("mins_a"), col("mins_b")))),
        1, KmvK))
      .withColumn("n_kept", size(col("sample")).cast("long"))
      .withColumn("kth", element_at(col("sample"), size(col("sample"))))
      .withColumn("union_est",
        when(col("n_kept") < KmvK, col("n_kept"))
          .otherwise(expr(s"$numerator div kth")))
      .withColumn("n_common", size(array_intersect(
        array_intersect(col("sample"), col("mins_a")), col("mins_b")))
        .cast("long"))
      .withColumn("inter_est", expr("(n_common * union_est) div n_kept"))
      .join(inter, Seq("source_a", "source_b"), "left_outer")
      .select(col("source_a"), col("source_b"),
        col("union_est"), col("inter_est"),
        (col("na") + col("nb") - coalesce(col("exact_inter"), lit(0L)))
          .as("exact_union"),
        coalesce(col("exact_inter"), lit(0L)).as("exact_inter"))
  }

  /** DDSketch-style quantile sketch over order totals (in exact cents):
    * bucket = the value with everything below its top 5 bits zeroed —
    * i.e. 16 sub-buckets per power-of-two octave, giving a <= 1/16
    * relative-error guarantee exactly like DDSketch's log-gamma buckets
    * but in pure integer arithmetic (bit-length via `bin()`, shifts —
    * the same engine-stable kernel the HLL registers use). Bucket
    * counts are one combinable aggregation, the bucket table is bounded
    * by 16 x 64 rows no matter the input, and a quantile reads off the
    * cumulative counts. The exact per-quantile values ride along as the
    * error reference (computed from a distinct-value cumulative —
    * droppable at real scale, where the sketch IS the answer); est is
    * the bucket lower bound, so est <= exact always and err_pct is the
    * sketch's one-sided error, surfaced.
    */
  val QuantileQs = Seq(50, 90, 99)

  /** Order totals in exact cents. floor BEFORE the cast: DuckDB rounds
    * double->bigint casts where Spark truncates; floor of the same IEEE
    * product is engine-proof.
    */
  def quantileCents(orders: DataFrame): DataFrame = orders
    .select(expr("cast(floor(o_totalprice * 100) AS bigint)").as("x"))
    .filter(col("x") > 0)

  /** Bucket build: value -> top-5-bit lower bound, combinable counts —
    * also legal as a streaming aggregation (bounded 16 x 64 states).
    */
  def quantileBuckets(vals: DataFrame): DataFrame = {
    val shift = "greatest(length(bin(x)) - 5, 0)"
    vals
      .select(expr(s"shiftleft(shiftright(x, $shift), $shift)").as("lb"))
      .groupBy("lb").agg(count(lit(1)).as("c"))
  }

  /** Quantile reads off the cumulative bucket counts + exact reference. */
  def quantileFinalize(buckets: DataFrame, vals: DataFrame): DataFrame = {
    val total = buckets.agg(sum(col("c")).as("n"))
    val qRows = explode(array(QuantileQs.map(lit): _*)).as("q")
    val wB = Window.orderBy(col("lb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val est = buckets
      .withColumn("cum", sum(col("c")).over(wB)) // bounded bucket table
      .crossJoin(broadcast(total))
      .select(col("lb"), col("cum"), col("n"), qRows)
      .filter(col("cum") * 100 >= col("q") * col("n"))
      .groupBy("q").agg(min(col("lb")).as("est_cents"), first(col("n")).as("n"))
    // exact-reference cumulative over DISTINCT prices. The running sum
    // needs a total order on x; the global-order window is ONE task —
    // bounded by the VALUE DOMAIN (distinct prices), never the corpus,
    // so it is the FASTER shape wherever the domain is modest (the
    // distributed form costs ~5 extra stages; measured 1.8-2x on the
    // sub-second bench entries at sf0.1). At 100 TB a wide domain can
    // still push millions of rows through that one task, so the
    // partition count is a SCALE KNOB: `graft.quantile.exact.parts`
    // (default 1 = the plain window; set O(domain/1M) in production).
    // Above 1, the classic two-pass cumsum — range-partition the
    // histogram on x, cumsum WITHIN each range, add each range's
    // offset (an O(partitions) frame, broadcast) back. Exact for ANY
    // contiguous range partitioning (equal keys share a partition and
    // pid order is range order), so both paths are row-identical —
    // SketchesSpec pins it.
    val hist = vals.groupBy("x").agg(count(lit(1)).as("c"))
    val exactParts = vals.sparkSession.conf
      .get("graft.quantile.exact.parts", "1").toInt
    val cumulative =
      if (exactParts <= 1) {
        val wX = Window.orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        hist.withColumn("cum", sum(col("c")).over(wX))
      } else {
        val ranged = hist.repartitionByRange(exactParts, col("x"))
          .withColumn("pid", spark_partition_id())
        val wIn = Window.partitionBy(col("pid")).orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val within = ranged.withColumn("cin", sum(col("c")).over(wIn))
        val wOff = Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = ranged.groupBy("pid").agg(sum(col("c")).as("ptot"))
          .withColumn("off",
            coalesce(sum(col("ptot")).over(wOff), lit(0L)))
          .select(col("pid"), col("off")) // O(partitions) rows
        within.join(broadcast(offs), "pid")
          .select(col("x"), (col("cin") + col("off")).as("cum"))
      }
    val exact = cumulative
      .crossJoin(broadcast(total))
      .select(col("x"), col("cum"), col("n"), qRows)
      .filter(col("cum") * 100 >= col("q") * col("n"))
      .groupBy("q").agg(min(col("x")).as("exact_cents"))
    est.join(exact, "q")
      .select(col("q"), col("n"), col("est_cents"), col("exact_cents"),
        expr("(exact_cents - est_cents) * 100 div exact_cents").as("err_pct"))
  }

  def quantileSketch(orders: DataFrame): DataFrame = {
    val vals = quantileCents(orders)
      .cache() // bucket build and the exact reference both fold this
    quantileFinalize(quantileBuckets(vals), vals)
  }

  /** EXACT per-type distinct users via the native bitmap aggregate
    * ([[graft.functions.BitmapDistinctAgg]]) — one pass, wordwise-OR
    * combinable state, popcount finalize. The domain bound comes from a
    * single O(1) max probe (dense driver-generated user ids; a
    * production caller passes its dictionary size instead). The DuckDB
    * oracle is plain count(DISTINCT) — the native aggregate must land
    * on the exact answer, not an estimate.
    */
  def bitmapDistinctUsers(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val maxU = ev.agg(max(col("user_id"))).head().getLong(0)
    bitmapUsersOf(ev, maxU + 1)
  }

  private[graft] def bitmapUsersOf(ev: DataFrame, domain: Long): DataFrame = {
    require(domain >= 1 && domain <= Int.MaxValue,
      s"bitmap_distinct domain $domain exceeds Int.MaxValue — the dense " +
        "bitset path only holds for id domains under 2^31; use sketch_hll " +
        "(bounded-error) for wider id spaces")
    ev.groupBy("event_type").agg(
      graft.functions.BitmapDistinctAgg
        .bitmap_distinct(col("user_id"), domain.toInt).as("n_users"))
  }

  /** The same bitmap aggregation run AS a stream (Complete mode): the
    * per-type bitset IS the streaming state, merged across micro-batches
    * by the state store — exact distinct counting over an unbounded
    * feed, the thing HLL approximates, affordable while ids stay dense
    * and bounded. Shares the batch oracle verbatim.
    */
  def bitmapDistinctUsersStream(s: SparkSession, dir: String): DataFrame = {
    val maxU = Tables.events(s, dir).agg(max(col("user_id"))).head().getLong(0)
    require(maxU + 1 <= Int.MaxValue,
      s"bitmap_distinct domain ${maxU + 1} exceeds Int.MaxValue — use the " +
        "HLL path for id spaces wider than 2^31")
    val streamed = graft.streaming.EventStreams.eventStream(s, dir)
      .groupBy("event_type").agg(
        graft.functions.BitmapDistinctAgg
          .bitmap_distinct(col("user_id"), (maxU + 1).toInt).as("n_users"))
    graft.streaming.EventStreams.runToMemorySink(s, streamed,
      org.apache.spark.sql.streaming.OutputMode.Complete)
      .localCheckpoint(true)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_bitmap_distinct" -> (bitmapDistinctUsers _),
    "stream_bitmap_distinct" -> (bitmapDistinctUsersStream _),
    "sketch_quantile" -> ((s: SparkSession, d: String) =>
      quantileSketch(Tables.orders(s, d))),
    "sketch_kmv_overlap" -> ((s: SparkSession, d: String) =>
      kmvOverlap(Tables.documents(s, d))),
    "sketch_ams_f2" -> ((s: SparkSession, d: String) =>
      amsF2(Tables.documents(s, d))),
    "sketch_kmv" -> ((s: SparkSession, d: String) =>
      kmvDistinct(Tables.documents(s, d))),
    "sketch_hll" -> ((s: SparkSession, d: String) =>
      hllDistinct(Tables.documents(s, d))),
    "sketch_hll_native" -> ((s: SparkSession, d: String) =>
      hllDistinctNative(Tables.documents(s, d))),
    "sketch_countmin" -> ((s: SparkSession, d: String) =>
      countMinTopTokens(Tables.documents(s, d))),
    "sketch_bloom_join" -> ((s: SparkSession, d: String) =>
      bloomJoinStats(Tables.customer(s, d), Tables.orders(s, d)))
  )

  private val bitmapOracle: String =
    """SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
      |FROM events GROUP BY 1""".stripMargin

  private val kmvNumerator = (KmvK - 1).toLong * (1L << 48)

  /** The reg/agg/est CTE chain over a preceding CTE `d(source, h)` —
    * the SQL replay of [[hllRegisters]]+estimate, shared by the
    * sketch_hll oracle and the table-stats oracle.
    */
  def sqlHllEstCtes: String =
    s"""reg AS (
       |  SELECT source, h // ${1L << HllRemBits} AS bucket,
       |    max(CASE WHEN h % ${1L << HllRemBits} = 0 THEN ${HllRemBits + 1}
       |        ELSE ${HllRemBits + 1} - length(bin(h % ${1L << HllRemBits}))
       |        END) AS r
       |  FROM d GROUP BY 1, 2),
       |agg AS (
       |  SELECT source, count(*)::BIGINT AS m_used,
       |    sum(1::BIGINT << (${HllRemBits + 1} - r))::BIGINT AS s_used
       |  FROM reg GROUP BY source),
       |est AS (
       |  SELECT source, m_used,
       |    $HllNumerator //
       |      (s_used + ($HllBuckets - m_used) * ${1L << (HllRemBits + 1)})
       |      AS hll_est
       |  FROM agg)""".stripMargin

  /** The `hll_lc` CASE expression over an est-CTE alias — shared by the
    * sketch_hll and stats_table oracles so the [[HllLcTable]] literals
    * can never drift between consumers.
    */
  def sqlHllLc(est: String): String =
    s"""(CASE WHEN $HllBuckets - $est.m_used > 0
       |      AND $est.hll_est <= $HllLcThreshold
       |    THEN [${HllLcTable.mkString(", ")}]
       |      [($HllBuckets - $est.m_used)::INT]
       |    ELSE $est.hll_est END)::BIGINT""".stripMargin

  /** Shared by sketch_hll and sketch_hll_native — both register paths
    * produce identical registers, so one oracle checks both.
    */
  private val hllOracle: String =
    (s"""WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |d0 AS (SELECT DISTINCT source, tok FROM toks WHERE length(tok) > 0),
        |d AS (SELECT source, ${sqlH48("tok")} AS h FROM d0),
        |""".stripMargin + sqlHllEstCtes +
      s""",
         |ex AS (
         |  SELECT source, count(*)::BIGINT AS n_exact FROM d0 GROUP BY source)
         |SELECT ex.source, ex.n_exact, est.m_used, est.hll_est,
         |  ${sqlHllLc("est")} AS hll_lc,
         |  abs(est.hll_est - ex.n_exact) * 100 // ex.n_exact AS err_pct
         |FROM ex JOIN est ON ex.source = est.source""".stripMargin)

  val oracles: Map[String, String] = Map(
    // union k-min per pair + membership flags; all-integer estimates
    "sketch_kmv_overlap" ->
      s"""WITH toks AS (
         |  SELECT source, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |d0 AS (SELECT DISTINCT source, tok FROM toks WHERE length(tok) > 0),
         |d AS (SELECT DISTINCT source, ${sqlH48("tok")} AS h FROM d0),
         |sizes AS (SELECT source, count(*)::BIGINT AS n FROM d GROUP BY 1),
         |pairs AS (
         |  SELECT a.source AS source_a, b.source AS source_b
         |  FROM (SELECT DISTINCT source FROM d) a
         |  CROSS JOIN (SELECT DISTINCT source FROM d) b
         |  WHERE a.source < b.source),
         |inter AS (
         |  SELECT x.source AS source_a, y.source AS source_b,
         |    count(*)::BIGINT AS exact_inter
         |  FROM d x JOIN d y ON x.h = y.h AND x.source < y.source
         |  GROUP BY 1, 2),
         |merged AS (
         |  SELECT DISTINCT p.source_a, p.source_b, d.h
         |  FROM pairs p JOIN d
         |    ON d.source = p.source_a OR d.source = p.source_b),
         |kept AS (
         |  SELECT source_a, source_b, h,
         |    row_number() OVER (PARTITION BY source_a, source_b
         |      ORDER BY h) AS rn
         |  FROM merged),
         |agg AS (
         |  SELECT k.source_a, k.source_b, count(*)::BIGINT AS n_kept,
         |    max(CASE WHEN k.rn = $KmvK THEN k.h END) AS kth,
         |    sum(CASE WHEN da.h IS NOT NULL AND db.h IS NOT NULL
         |      THEN 1 ELSE 0 END)::BIGINT AS n_common
         |  FROM kept k
         |  LEFT JOIN d da ON da.source = k.source_a AND da.h = k.h
         |  LEFT JOIN d db ON db.source = k.source_b AND db.h = k.h
         |  WHERE k.rn <= $KmvK
         |  GROUP BY 1, 2),
         |est AS (
         |  SELECT source_a, source_b, n_kept, n_common,
         |    CASE WHEN n_kept < $KmvK THEN n_kept
         |         ELSE $kmvNumerator // kth END AS union_est
         |  FROM agg)
         |SELECT e.source_a, e.source_b, e.union_est,
         |  (e.n_common * e.union_est) // e.n_kept AS inter_est,
         |  (sa.n + sb.n - coalesce(i.exact_inter, 0)) AS exact_union,
         |  coalesce(i.exact_inter, 0) AS exact_inter
         |FROM est e
         |JOIN sizes sa ON sa.source = e.source_a
         |JOIN sizes sb ON sb.source = e.source_b
         |LEFT JOIN inter i
         |  ON i.source_a = e.source_a AND i.source_b = e.source_b""".stripMargin,
    // first-md5-nibble parity signs, all-integer sums/squares
    "sketch_ams_f2" ->
      s"""WITH toks AS (
         |  SELECT source, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |cnt AS (
         |  SELECT source, tok, count(*)::BIGINT AS c FROM toks
         |  WHERE length(tok) > 0 GROUP BY 1, 2),
         |exact AS (
         |  SELECT source, sum(c * c)::BIGINT AS f2_exact FROM cnt GROUP BY 1),
         |x AS (
         |  SELECT cnt.source, g.j,
         |    sum(((strpos('0123456789abcdef',
         |        substr(md5(g.j::VARCHAR || '|' || cnt.tok), 1, 1)) - 1) % 2
         |        * 2 - 1) * cnt.c)::BIGINT AS x
         |  FROM cnt CROSS JOIN
         |    (SELECT unnest(generate_series(0, ${AmsRows - 1})) AS j) g
         |  GROUP BY 1, 2),
         |est AS (
         |  SELECT source, sum(x * x)::BIGINT // $AmsRows AS ams_est
         |  FROM x GROUP BY source)
         |SELECT exact.source, exact.f2_exact, est.ams_est,
         |  abs(est.ams_est - exact.f2_exact) * 100 // exact.f2_exact AS err_pct
         |FROM exact JOIN est ON exact.source = est.source""".stripMargin,
    // DISTINCT on the hash (not the token) mirrors the aggregator's
    // skip-equal-values insert; all-integer estimate arithmetic
    "sketch_kmv" ->
      s"""WITH toks AS (
         |  SELECT source, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |d AS (
         |  SELECT DISTINCT source, tok FROM toks WHERE length(tok) > 0),
         |hd AS (SELECT DISTINCT source, ${sqlH48("tok")} AS h FROM d),
         |r AS (
         |  SELECT source, h,
         |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |  FROM hd),
         |agg AS (
         |  SELECT source, count(*)::BIGINT AS n_kept, max(h) AS kth_hash
         |  FROM r WHERE rn <= $KmvK GROUP BY source),
         |ex AS (
         |  SELECT source, count(*)::BIGINT AS n_exact FROM d GROUP BY source)
         |SELECT ex.source, ex.n_exact, agg.n_kept, agg.kth_hash,
         |  CASE WHEN agg.n_kept < $KmvK THEN agg.n_kept
         |       ELSE $kmvNumerator // agg.kth_hash END AS ndv_est
         |FROM ex JOIN agg ON ex.source = agg.source""".stripMargin,
    // same integer bucket decomposition (top-5-bit truncation via bin()
    // length + shifts) and the same cumulative-count quantile reads
    "sketch_quantile" ->
      s"""WITH vals AS (
         |  SELECT x FROM (
         |    SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS x
         |    FROM orders)
         |  WHERE x > 0),
         |buckets AS (
         |  SELECT (x >> greatest(length(bin(x)) - 5, 0))
         |      << greatest(length(bin(x)) - 5, 0) AS lb,
         |    count(*)::BIGINT AS c
         |  FROM vals GROUP BY 1),
         |tot AS (SELECT sum(c)::BIGINT AS n FROM buckets),
         |qs AS (SELECT unnest([${QuantileQs.mkString(", ")}]) AS q),
         |cumb AS (
         |  SELECT lb, sum(c) OVER (ORDER BY lb
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
         |  FROM buckets),
         |est AS (
         |  SELECT qs.q, min(cumb.lb) AS est_cents
         |  FROM cumb CROSS JOIN tot CROSS JOIN qs
         |  WHERE cumb.cum * 100 >= qs.q * tot.n
         |  GROUP BY qs.q),
         |cumx AS (
         |  SELECT x, sum(c) OVER (ORDER BY x
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
         |  FROM (SELECT x, count(*)::BIGINT AS c FROM vals GROUP BY x)),
         |ex AS (
         |  SELECT qs.q, min(cumx.x) AS exact_cents
         |  FROM cumx CROSS JOIN tot CROSS JOIN qs
         |  WHERE cumx.cum * 100 >= qs.q * tot.n
         |  GROUP BY qs.q)
         |SELECT est.q, tot.n, est.est_cents, ex.exact_cents,
         |  (ex.exact_cents - est.est_cents) * 100 // ex.exact_cents AS err_pct
         |FROM est JOIN ex ON est.q = ex.q CROSS JOIN tot""".stripMargin,
    // same bucket/rho decomposition replayed on bin() string length;
    // all shifts and divides integer, same literal constants
    "sketch_hll" -> hllOracle,
    // the native-aggregate path builds IDENTICAL registers (same h48
    // input, same rho), so the same oracle checks it
    "sketch_hll_native" -> hllOracle,
    "sketch_bitmap_distinct" -> bitmapOracle,
    // stream/batch bitset equivalence: state-store merge must land on
    // the identical exact counts
    "stream_bitmap_distinct" -> bitmapOracle,
    "sketch_countmin" ->
      s"""WITH toks AS (
         |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         |tk AS (SELECT tok FROM toks WHERE length(tok) > 0),
         |cells AS (
         |  SELECT g.r, ${sqlH48("g.r::VARCHAR || '|' || tok")} % $CmWidth
         |      AS bucket,
         |    count(*)::BIGINT AS cnt
         |  FROM tk CROSS JOIN
         |    (SELECT unnest(generate_series(0, ${CmDepth - 1})) AS r) g
         |  GROUP BY 1, 2),
         |top AS (
         |  SELECT tok, count(*)::BIGINT AS exact_cnt FROM tk GROUP BY tok
         |  ORDER BY exact_cnt DESC, tok LIMIT $CmTopK),
         |probe AS (
         |  SELECT top.tok, top.exact_cnt, g.r,
         |    ${sqlH48("g.r::VARCHAR || '|' || top.tok")} % $CmWidth AS bucket
         |  FROM top CROSS JOIN
         |    (SELECT unnest(generate_series(0, ${CmDepth - 1})) AS r) g)
         |SELECT probe.tok, probe.exact_cnt, min(cells.cnt) AS cm_est,
         |  min(cells.cnt) - probe.exact_cnt AS over_err
         |FROM probe JOIN cells
         |  ON probe.r = cells.r AND probe.bucket = cells.bucket
         |GROUP BY probe.tok, probe.exact_cnt""".stripMargin,
    "sketch_bloom_join" ->
      s"""WITH build AS (
         |  SELECT DISTINCT c_custkey AS key FROM customer
         |  WHERE c_mktsegment = 'BUILDING'),
         |pos AS (
         |  SELECT DISTINCT
         |    ${sqlH48("g.j::VARCHAR || '|' || key::VARCHAR")} % $BloomBits AS p
         |  FROM build CROSS JOIN
         |    (SELECT unnest(generate_series(0, ${BloomHashes - 1})) AS j) g),
         |bloom AS (SELECT list(p) AS bl FROM pos),
         |probe AS (
         |  SELECT o.o_orderpriority,
         |    (${(0 until BloomHashes).map(j =>
                s"list_contains(bloom.bl, ${sqlH48(s"'$j|' || o.o_custkey::VARCHAR")} % $BloomBits)")
                .mkString(" AND ")})::INT AS pass,
         |    CASE WHEN b.key IS NULL THEN 0 ELSE 1 END AS is_b
         |  FROM orders o CROSS JOIN bloom
         |  LEFT JOIN build b ON o.o_custkey = b.key)
         |SELECT o_orderpriority, count(*) AS n_orders,
         |  sum(pass)::BIGINT AS n_pass, sum(is_b)::BIGINT AS n_true,
         |  sum(CASE WHEN pass = 1 AND is_b = 0 THEN 1 ELSE 0 END)::BIGINT
         |    AS n_false_pos
         |FROM probe GROUP BY o_orderpriority""".stripMargin
  )
}
