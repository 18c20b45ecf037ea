package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Model fitting as combinable aggregation — the "training" corner of a
  * data engine: quality-classifier fitting, price/size trend models and
  * calibration curves all reduce to a handful of exact sufficient
  * statistics or a short fixed loop of them, and that is precisely what
  * a 100 TB engine is good at (map-side-combinable sums, no parameter
  * server, no driver-side data).
  *
  * Both operators here are EXACT-arithmetic by construction, so unlike
  * float gradient descent they are oracle-checkable cross-engine:
  *  - [[linregExact]] solves least squares from DECIMAL(38,0) normal
  *    equations via Cramer's rule — one pass, five sums, no iteration.
  *  - [[perceptron]] trains a linear classifier with integer batch
  *    updates — the per-epoch weight delta is a SUM over misclassified
  *    rows (order-independent), so the trajectory is deterministic.
  */
object MlOps {
  private val Dec = DecimalType(38, 0)

  /** Ordinary least squares y = b0 + b1*x fitted EXACTLY in one pass:
    * the normal-equation sums (n, Sx, Sy, Sxx, Sxy) are accumulated as
    * DECIMAL(38,0) (HUGEINT on the oracle side) and the coefficients
    * come out of Cramer's rule as exact integer ratios —
    * beta1 = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2). Big integers are emitted
    * as STRINGS (exact; the driver's pandas bridge would round a 128-bit
    * value through float64) plus round-6 double ratios for readability.
    *
    * Fits unit price: x = l_quantity, y = l_extendedprice in cents.
    * Capacity: |Sxy| <= 5e8 per row => DECIMAL(38) holds the Cramer
    * products to ~sf100_000; sums alone are int64-safe only to ~sf10,
    * hence decimal from the first partial aggregate on.
    */
  /** The sufficient-statistics aggregation — works identically as a
    * batch aggregate or a streaming one (the sums are combinable, so
    * micro-batch accumulation IS the training).
    */
  private[graft] def linregSums(lineitem: DataFrame): DataFrame =
    lineitem.select(
      col("l_quantity").cast("long").as("x"),
      round(col("l_extendedprice") * 100).cast("long").as("y"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(Dec)).as("sx"),
        sum(col("y").cast(Dec)).as("sy"),
        sum((col("x") * col("x")).cast(Dec)).as("sxx"),
        sum((col("x") * col("y")).cast(Dec)).as("sxy"))

  /** Cramer finalization over a single sums row (batch and stream share
    * it, and therefore share the oracle).
    */
  private[graft] def linregFinalize(sums: DataFrame): DataFrame = {
    val n = col("n").cast(Dec)
    val det = n * col("sxx") - col("sx") * col("sx")
    val b0n = col("sxx") * col("sy") - col("sx") * col("sxy")
    val b1n = n * col("sxy") - col("sx") * col("sy")
    sums.select(
      col("n"),
      col("sx").cast("string").as("sx"),
      col("sy").cast("string").as("sy"),
      col("sxx").cast("string").as("sxx"),
      col("sxy").cast("string").as("sxy"),
      det.cast("string").as("det"),
      b0n.cast("string").as("beta0_num"),
      b1n.cast("string").as("beta1_num"),
      round(b0n.cast("double") / det.cast("double"), 6).as("beta0"),
      round(b1n.cast("double") / det.cast("double"), 6).as("beta1"))
  }

  def linregExact(lineitem: DataFrame): DataFrame =
    linregFinalize(linregSums(lineitem))

  def linregQuery(s: SparkSession, dir: String): DataFrame =
    linregExact(Tables.lineitem(s, dir))

  /** STREAMING model training: the same sufficient statistics run AS
    * the streaming aggregation (Complete mode, one refreshed totals row
    * per micro-batch — state is five numbers, O(1) forever), finalized
    * by the same Cramer code. Training a linear model on an unbounded
    * feed reduces to keeping five sums current; stream/batch share the
    * oracle verbatim, proving arrival-order independence of the fit.
    */
  def linregStream(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType)))
    val li = graft.streaming.EventStreams.tableStream(s, dir, "lineitem", schema)
    val sums = linregSums(li)
    val sink = graft.streaming.EventStreams.runToMemorySink(s, sums,
      org.apache.spark.sql.streaming.OutputMode.Complete)
    linregFinalize(sink).localCheckpoint(eager = true)
  }

  /** Multi-feature exact least squares — y = b0 + b1*x1 + b2*x2 via the
    * full 3x3 normal matrix and Cramer's rule, same exact-DECIMAL(38)
    * discipline as [[linregExact]]: ONE pass accumulates the 9 sufficient
    * statistics (all combinable), the driver-side work is zero, and the
    * coefficient numerators/determinant come out as exact integers
    * (strings across the gate). Fits price on quantity + discount.
    * Capacity: the Cramer cofactor products reach ~5e32 at sf1 and grow
    * linearly in each sum — exact to roughly sf10_000 for det, ~sf50 for
    * the numerators before DECIMAL(38) overflows (Spark nulls on decimal
    * overflow rather than wrapping, so exhaustion is loud; center the
    * features to extend range).
    */
  def linregMulti(lineitem: DataFrame, ridgeLambda: Long = 0L): DataFrame = {
    val base = lineitem.select(
      col("l_quantity").cast("long").as("x1"),
      round(col("l_discount") * 100).cast("long").as("x2"),
      round(col("l_extendedprice") * 100).cast("long").as("y"))
    val sums = base.agg(
      count(lit(1)).as("n"),
      sum(col("x1").cast(Dec)).as("sx1"),
      sum(col("x2").cast(Dec)).as("sx2"),
      sum((col("x1") * col("x1")).cast(Dec)).as("sx11"),
      sum((col("x1") * col("x2")).cast(Dec)).as("sx12"),
      sum((col("x2") * col("x2")).cast(Dec)).as("sx22"),
      sum(col("y").cast(Dec)).as("sy"),
      sum((col("x1") * col("y")).cast(Dec)).as("sx1y"),
      sum((col("x2") * col("y")).cast(Dec)).as("sx2y"))
    def det3(a: Column, b: Column, c: Column,
        d: Column, e: Column, f: Column,
        g: Column, h: Column, i: Column): Column =
      a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    val n = col("n").cast(Dec)
    val (sx1, sx2) = (col("sx1"), col("sx2"))
    val (sx11, sx12, sx22) = (col("sx11"), col("sx12"), col("sx22"))
    val (sy, sx1y, sx2y) = (col("sy"), col("sx1y"), col("sx2y"))
    // A = [[n,sx1,sx2],[sx1,sx11+l,sx12],[sx2,sx12,sx22+l]], rhs =
    // [sy,sx1y,sx2y] — l = ridgeLambda on the non-intercept diagonal
    // (standard ridge: the intercept is not penalized); l = 0 is OLS
    val lam = lit(ridgeLambda).cast(Dec)
    val (lx11, lx22) = (sx11 + lam, sx22 + lam)
    val det = det3(n, sx1, sx2, sx1, lx11, sx12, sx2, sx12, lx22)
    val b0n = det3(sy, sx1, sx2, sx1y, lx11, sx12, sx2y, sx12, lx22)
    val b1n = det3(n, sy, sx2, sx1, sx1y, sx12, sx2, sx2y, lx22)
    val b2n = det3(n, sx1, sy, sx1, lx11, sx1y, sx2, sx12, sx2y)
    sums.select(
      col("n"),
      sx1.cast("string").as("sx1"), sx2.cast("string").as("sx2"),
      sx11.cast("string").as("sx11"), sx12.cast("string").as("sx12"),
      sx22.cast("string").as("sx22"), sy.cast("string").as("sy"),
      sx1y.cast("string").as("sx1y"), sx2y.cast("string").as("sx2y"),
      det.cast("string").as("det"),
      b0n.cast("string").as("beta0_num"),
      b1n.cast("string").as("beta1_num"),
      b2n.cast("string").as("beta2_num"),
      round(b0n.cast("double") / det.cast("double"), 6).as("beta0"),
      round(b1n.cast("double") / det.cast("double"), 6).as("beta1"),
      round(b2n.cast("double") / det.cast("double"), 6).as("beta2"))
  }

  def linregMultiQuery(s: SparkSession, dir: String): DataFrame =
    linregMulti(Tables.lineitem(s, dir))

  val IrlsIters = 3
  val LogregXScale = 100000.0

  /** Logistic regression trained in-engine by IRLS (iteratively
    * reweighted least squares — Newton's method on the log-likelihood):
    * y = P(o_orderstatus = 'F') on scaled price. Each of the
    * [[IrlsIters]] fixed iterations is ONE combinable aggregation over
    * the table (five running sums: the 2x2 weighted normal matrix and
    * the score vector), the 2x2 Newton solve is driver arithmetic on
    * five doubles, and the next iteration embeds the refreshed betas
    * as literals — so training cost is `iters` codegen'd passes, no
    * shuffle beyond each aggregation's, the exact shape that scales to
    * 100 TB (the linreg family's discipline, extended to a model with
    * no closed form). Unlike the DECIMAL-exact linregs, the sigmoid
    * forces float sums; determinism comes from the betas being RATIOS
    * of same-pass sums (relative error ~1e-10 regardless of row
    * count), so the round-6 betas and round-6 MEAN log-likelihood are
    * engine-stable and the whole fit is DuckDB-replayable, iteration
    * by iteration.
    */
  def logregIrls(orders: DataFrame): DataFrame = {
    val base = orders.select(
      (col("o_totalprice") / LogregXScale).as("x"),
      when(col("o_orderstatus") === "F", 1.0).otherwise(0.0).as("y"))
    var b0 = 0.0
    var b1 = 0.0
    for (_ <- 1 to IrlsIters) {
      val z = lit(b0) + lit(b1) * col("x")
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val w = p * (lit(1.0) - p)
      val r = base.agg(
        sum(w).as("sw"),
        sum(w * col("x")).as("swx"),
        sum(w * col("x") * col("x")).as("swxx"),
        sum(col("y") - p).as("g0"),
        sum((col("y") - p) * col("x")).as("g1")).head
      val (sw, swx, swxx, g0, g1) = (r.getDouble(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val det = sw * swxx - swx * swx
      b0 += (swxx * g0 - swx * g1) / det
      b1 += (sw * g1 - swx * g0) / det
    }
    val z = lit(b0) + lit(b1) * col("x")
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    base.agg(count(lit(1)).as("n"),
        round(sum(col("y") * log(p) +
          (lit(1.0) - col("y")) * log(lit(1.0) - p)) / count(lit(1)), 6)
          .as("mean_ll"))
      .withColumn("beta0", round(lit(b0), 6))
      .withColumn("beta1", round(lit(b1), 6))
      .select("n", "beta0", "beta1", "mean_ll")
  }

  def logregQuery(s: SparkSession, dir: String): DataFrame =
    logregIrls(Tables.orders(s, dir))

  val RidgeLambda = 100000L

  /** Ridge regression, exactly: the same one-pass sufficient statistics
    * as [[linregMulti]] with λ added to the non-intercept diagonal of
    * the normal matrix before the Cramer solve — regularization costs
    * ZERO extra passes and stays exact-integer, so the shrunk
    * coefficients are oracle-checkable like the OLS ones.
    */
  def ridgeQuery(s: SparkSession, dir: String): DataFrame =
    linregMulti(Tables.lineitem(s, dir), RidgeLambda)

  /** Integer document features for the language classifier: bias, char
    * count (the table's own n_chars), non-empty token count, digit
    * count; label +1 iff lang = 'en'.
    */
  def perceptronFeatures(docs: DataFrame): DataFrame =
    docs.select(
      lit(1L).as("x0"),
      col("n_chars").cast("long").as("x1"),
      size(filter(split(col("text"), " ", -1),
        t => length(t) > 0)).cast("long").as("x2"),
      length(regexp_replace(col("text"), "[^0-9]", "")).cast("long").as("x3"),
      when(col("lang") === "en", 1L).otherwise(-1L).as("y"))

  val Epochs = 3

  /** Batch perceptron, `epochs` full passes: each epoch filters to rows
    * with margin y*(w.x) <= 0 and adds SUM(y*x) to the weights. The
    * update is one combinable aggregation over the corpus; the driver
    * holds only the 4 weights (config cardinality, same contract as the
    * clustering loops). Output: one row per epoch with the post-update
    * weights and the epoch's misclassified count.
    */
  def perceptron(docs: DataFrame, epochs: Int = Epochs): DataFrame = {
    val session = docs.sparkSession
    val f = perceptronFeatures(OpUtil.spread(docs)).cache()
    var w = Array(0L, 0L, 0L, 0L)
    val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long, Long, Long)]()
    for (epoch <- 1 to epochs) {
      val margin = col("y") *
        (lit(w(0)) * col("x0") + lit(w(1)) * col("x1")
          + lit(w(2)) * col("x2") + lit(w(3)) * col("x3"))
      val row = f.filter(margin <= 0).agg(
        coalesce(sum(col("y") * col("x0")), lit(0L)).as("d0"),
        coalesce(sum(col("y") * col("x1")), lit(0L)).as("d1"),
        coalesce(sum(col("y") * col("x2")), lit(0L)).as("d2"),
        coalesce(sum(col("y") * col("x3")), lit(0L)).as("d3"),
        count(lit(1)).as("m")).head()
      w = Array(w(0) + row.getLong(0), w(1) + row.getLong(1),
        w(2) + row.getLong(2), w(3) + row.getLong(3))
      out += ((epoch, w(0), w(1), w(2), w(3), row.getLong(4)))
    }
    f.unpersist(blocking = false)
    import session.implicits._
    out.toSeq.toDF("epoch", "w0", "w1", "w2", "w3", "n_mis")
  }

  def perceptronQuery(s: SparkSession, dir: String): DataFrame =
    perceptron(Tables.documents(s, dir))

  /** Multinomial Naive Bayes, trained AND applied in one plan: class =
    * (lang == 'en') vs rest, features = token occurrences with Laplace
    * smoothing. Training is two combinable aggregations (per-token class
    * counts, corpus totals); scoring joins each token occurrence to its
    * log-likelihood-RATIO — rounded to 1e-6 fixed point FIRST, so the
    * per-doc score is a BIGINT sum (order-independent, cross-engine
    * exact; float log-prob sums would depend on partition order). The
    * per-doc resubstitution report (score, prediction, truth) is the
    * quality-classifier shape of a curation pipeline: swap the label
    * column and the same plan trains any binary token-based gate.
    * Scale: token->stats join shuffles on token; per-doc sum shuffles on
    * doc_id — both combinable, nothing driver-side, vocab never
    * collected.
    */
  def naiveBayes(docs: DataFrame): DataFrame = {
    val toks = OpUtil.spread(docs)
      .select(col("doc_id"),
        (col("lang") === "en").cast("int").as("is_en"),
        explode(split(col("text"), " ", -1)).as("tok"))
      .filter(length(col("tok")) > 0)
    val tokCounts = toks.groupBy("tok").agg(
      sum(col("is_en")).as("cnt_en"),
      sum(lit(1) - col("is_en")).as("cnt_ot"))
    val clsStats = docs.agg(
      sum((col("lang") === "en").cast("long")).as("n_en"),
      sum((col("lang") =!= "en").cast("long")).as("n_ot"))
    val tokStats = tokCounts.agg(
      sum("cnt_en").as("tot_en"), sum("cnt_ot").as("tot_ot"),
      count(lit(1)).as("v"))
    val stats = clsStats.crossJoin(tokStats)
    val tokLlr = tokCounts.crossJoin(broadcast(stats))
      .select(col("tok"),
        round((log((col("cnt_en") + 1.0) / (col("tot_en") + col("v")))
          - log((col("cnt_ot") + 1.0) / (col("tot_ot") + col("v"))))
          * 1000000).cast("long").as("llr_fp"))
    val perDoc = toks.join(tokLlr, "tok")
      .groupBy("doc_id").agg(sum("llr_fp").as("tok_llr"))
    val prior = round(log(col("n_en").cast("double") / col("n_ot"))
      * 1000000).cast("long")
    docs.select(col("doc_id"), (col("lang") === "en").cast("int").as("is_en"))
      .join(perDoc, Seq("doc_id"), "left")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (prior + coalesce(col("tok_llr"), lit(0L))).as("llr_fp"),
        col("is_en"))
      .select(col("doc_id"), col("llr_fp"),
        (col("llr_fp") >= 0).cast("int").as("pred_en"), col("is_en"))
  }

  def naiveBayesQuery(s: SparkSession, dir: String): DataFrame =
    naiveBayes(Tables.documents(s, dir))

  /** Exact ROC-AUC of the [[naiveBayes]] scores via the Mann-Whitney
    * rank statistic, ties handled by midrank — ALL in integer
    * arithmetic: scores collapse to per-distinct-value (count, positive
    * count) groups, a running-count window gives each group its
    * [rmin, rmax] rank span, and 2U = sum over positives of
    * (rmin + rmax) - P(P+1) stays a BIGINT (midranks are half-integers,
    * so doubling clears the fraction). auc = 2U / (2 P N) emerges from
    * ONE double division, rounded to 6 — no float accumulates across
    * rows, so the classifier's headline quality metric is cross-engine
    * exact. The prefix sum over sorted distinct scores runs SHARDED
    * (monotone equal-width score ranges + a driver exclusive scan over
    * O(shards) totals — the pipe_pack pattern), so no row set funnels
    * through a single-task global sort even when scores are continuous
    * and |distinct| ~ |rows|.
    */
  val AucShards = 32

  def aucReport(scored: DataFrame, scoreCol: String, labelCol: String,
      shards: Int = AucShards): DataFrame = {
    val g = scored.groupBy(col(scoreCol).as("s")).agg(
      count(lit(1)).as("cnt"),
      sum(col(labelCol)).as("pos")).persist()
    // The running count over sorted distinct scores is a prefix sum; a
    // bare Window.orderBy would funnel EVERY distinct score through one
    // task (continuous scores make |distinct| ~ |rows|, so that's a
    // 100x cliff, not a constant). Same cure as pipe_pack: monotone
    // equal-width score shards cumsum independently, the O(shards)
    // shard totals take one driver exclusive scan, and the offsets
    // broadcast back. Serial work is O(shards), config cardinality.
    val mm = g.agg(min(col("s")).as("lo"), max(col("s")).as("hi")).head()
    val lo = if (mm.isNullAt(0)) 0L else mm.getLong(0)
    val hi = if (mm.isNullAt(1)) 0L else mm.getLong(1)
    val width = (hi - lo) / shards + 1
    val sharded = g.withColumn("shard", expr(s"(s - $lo) div $width"))
    val totals = sharded.groupBy("shard").agg(sum(col("cnt")).as("tot"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var running = 0L
    val offsetRows = totals.map { case (sh, tot) =>
      val o = running; running += tot; (sh, o)
    }.toSeq
    val session = scored.sparkSession
    import session.implicits._
    val offsets = broadcast(offsetRows.toDF("shard", "offset"))
    val wLocal = Window.partitionBy(col("shard")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = sharded
      .withColumn("local_cum", sum(col("cnt")).over(wLocal))
      .join(offsets, "shard")
      .select(col("s"), col("cnt"), col("pos"),
        (col("offset") + col("local_cum")).as("cum"))
    val tot = ranked.agg(
      sum(col("pos") * (lit(2) * col("cum") - col("cnt") + 1)).as("possum2"),
      sum("pos").as("n_pos"),
      sum(col("cnt") - col("pos")).as("n_neg"))
    tot.select(
      col("n_pos"), col("n_neg"),
      (col("possum2") - col("n_pos") * (col("n_pos") + 1)).as("auc_num"),
      (lit(2) * col("n_pos") * col("n_neg")).as("auc_den"))
      .withColumn("auc", round(col("auc_num").cast("double")
        / col("auc_den"), 6))
  }

  def aucQuery(s: SparkSession, dir: String): DataFrame =
    aucReport(naiveBayes(Tables.documents(s, dir)), "llr_fp", "is_en")

  /** Calibration (reliability) report for the [[naiveBayes]] scores:
    * predicted probability p = sigmoid(llr), binned into 10 equal-width
    * probability bins; per bin the mean predicted confidence vs the
    * observed positive rate — the diagram that says whether "0.9
    * confident" means 90% right. p is rounded to 1e-6 fixed point PER
    * DOC, after which binning (floor-div), confidence means and
    * observed rates are pure integer arithmetic — combinable, exact,
    * engine-independent. One shuffle on the 10-bin key.
    */
  def calibrationReport(scored: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val p = lit(1.0) / (lit(1.0) + exp(-(col(scoreCol).cast("double")
      / 1000000.0)))
    scored
      .select(col(labelCol).cast("long").as("y"),
        round(p * 1000000).cast("long").as("p_fp"))
      .withColumn("bin", least(expr("p_fp div 100000"), lit(9L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"),
        sum("p_fp").as("sum_pfp"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("sum_pfp div n").as("conf_fp"),
        expr("(n_pos * 1000000) div n").as("acc_fp"))
  }

  def calibrationQuery(s: SparkSession, dir: String): DataFrame =
    calibrationReport(naiveBayes(Tables.documents(s, dir)), "llr_fp", "is_en")

  val StumpShards = 32

  /** EXACT decision-stump training (the CART split search, depth 1):
    * over every candidate threshold t of a numeric feature, the
    * misclassification count of the split `feature <= t` when each side
    * predicts its majority class — err(t) = min(posL, negL) +
    * min(posR, negR) — minimized exactly, ties broken by the smallest
    * threshold. The criterion is PURE INTEGER (unlike Gini/entropy
    * whose float argmin can flip between engines in the last ulp), so
    * the chosen split is oracle-checkable bit-for-bit; the reported
    * accuracy is the one rounded division at the very end.
    *
    * Scale shape — the same hazard as [[aucReport]], cured the same
    * way: the left-side counts over sorted distinct thresholds are a
    * prefix sum, and a continuous feature makes |distinct| ~ |rows|, so
    * a bare `Window.orderBy` would funnel the whole feature set through
    * one task. Monotone equal-width threshold shards cumsum (cnt, pos)
    * independently, the O(shards) shard totals take one driver
    * exclusive scan, offsets broadcast back. The argmin is a
    * TakeOrdered(1), never a global sort. Capacity: counts are row
    * counts (int64 to 9e18 rows); err <= n.
    *
    * Feature is the price in cents (exact fixed point), label
    * l_returnflag = 'R' — the "was this line returned" stump a returns
    * triage pipeline would actually fit.
    */
  def decisionStump(labeled: DataFrame, shards: Int = StumpShards): DataFrame =
    decisionStumpW(labeled.withColumn("w", lit(1L)), shards)

  /** Weighted split search — identical sharded-prefix-sum plan with
    * cnt/pos generalized to weight sums (sum(w), sum(w*y)); the
    * unweighted stump is the w=1 special case. Integer weights keep the
    * argmin exact, which is what the boosting chain needs.
    */
  def decisionStumpW(labeled: DataFrame, shards: Int = StumpShards): DataFrame =
    decisionStumpG(labeled.groupBy(col("f")).agg(
      sum(col("w")).as("cnt"),
      sum(col("y") * col("w")).as("pos")), shards)

  /** The split search over an ALREADY-AGGREGATED (f, cnt, pos) table —
    * cnt/pos in weight units. Exposed because weight schedules that are
    * pure functions of (f, y) (every stump's prediction depends only on
    * f) let callers aggregate the corpus ONCE and re-derive the weighted
    * table per round with literal arithmetic — the boosting chain's one
    * shuffle instead of one per round.
    */
  def decisionStumpG(grouped: DataFrame, shards: Int = StumpShards): DataFrame = {
    val g = grouped.persist()
    val mm = g.agg(min(col("f")).as("lo"), max(col("f")).as("hi")).head()
    val lo = if (mm.isNullAt(0)) 0L else mm.getLong(0)
    val hi = if (mm.isNullAt(1)) 0L else mm.getLong(1)
    val width = (hi - lo) / shards + 1
    val sharded = g.withColumn("shard", expr(s"(f - $lo) div $width"))
    val totals = sharded.groupBy("shard")
      .agg(sum(col("cnt")).as("tc"), sum(col("pos")).as("tp"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    var rc = 0L
    var rp = 0L
    val offsetRows = totals.map { case (sh, tc, tp) =>
      val o = (sh, rc, rp); rc += tc; rp += tp; o
    }.toSeq
    val n = rc
    val p = rp
    val session = grouped.sparkSession
    import session.implicits._
    val offsets = broadcast(offsetRows.toDF("shard", "coff", "poff"))
    val wLocal = Window.partitionBy(col("shard")).orderBy(col("f"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sharded
      .withColumn("lc", sum(col("cnt")).over(wLocal))
      .withColumn("lp", sum(col("pos")).over(wLocal))
      .join(offsets, "shard")
      .select(col("f"),
        (col("coff") + col("lc")).as("nl"),
        (col("poff") + col("lp")).as("pl"))
      .filter(col("nl") < lit(n)) // the empty-right "split" is no split
    val scored = cum.select(col("f"), col("nl"), col("pl"),
      (lit(n) - col("nl")).as("nr"), (lit(p) - col("pl")).as("pr"))
      .withColumn("err",
        least(col("pl"), col("nl") - col("pl")) +
          least(col("pr"), col("nr") - col("pr")))
    scored.orderBy(col("err"), col("f")).limit(1)
      .select(col("f").as("threshold_fp"), col("err"),
        col("nl").as("n_left"), col("pl").as("pos_left"),
        col("nr").as("n_right"), col("pr").as("pos_right"),
        round((lit(n) - col("err")).cast("double") / lit(n.toDouble), 6)
          .as("acc"))
  }

  def stumpQuery(s: SparkSession, dir: String): DataFrame =
    decisionStump(stumpInput(s, dir))

  private def stumpInput(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      round(col("l_extendedprice") * 100).cast("long").as("f"),
      when(col("l_returnflag") === lit("R"), 1L).otherwise(0L).as("y"))

  /** Train + APPLY + evaluate in one plan: the [[decisionStump]] model
    * (one row) broadcasts against every labeled row — each side of the
    * split predicts its majority class (ties predict 0) — and the
    * confusion matrix rolls up as four integer sums, accuracy as the
    * single rounded division. The evaluation primitive next to the AUC
    * and calibration reports: tp/fp/tn/fn are what a curation pipeline
    * thresholds on when the classifier gates data. Scoring is one
    * broadcast join + one combinable aggregation — no extra shuffle
    * beyond the training pass.
    */
  def stumpApply(labeled: DataFrame): DataFrame = {
    val model = decisionStump(labeled)
    val pred = when(col("f") <= col("threshold_fp"),
      when(lit(2L) * col("pos_left") > col("n_left"), 1L).otherwise(0L))
      .otherwise(
        when(lit(2L) * col("pos_right") > col("n_right"), 1L).otherwise(0L))
    labeled.crossJoin(broadcast(model))
      .select(col("y"), pred.as("pred"))
      .agg(
        sum(when(col("y") === 1L && col("pred") === 1L, 1L).otherwise(0L))
          .as("tp"),
        sum(when(col("y") === 0L && col("pred") === 1L, 1L).otherwise(0L))
          .as("fp"),
        sum(when(col("y") === 0L && col("pred") === 0L, 1L).otherwise(0L))
          .as("tn"),
        sum(when(col("y") === 1L && col("pred") === 0L, 1L).otherwise(0L))
          .as("fn"))
      .select(col("tp"), col("fp"), col("tn"), col("fn"),
        round((col("tp") + col("tn")).cast("double")
          / (col("tp") + col("fp") + col("tn") + col("fn")), 6).as("acc"))
  }

  def stumpApplyQuery(s: SparkSession, dir: String): DataFrame =
    stumpApply(stumpInput(s, dir))

  val BoostRounds = 3

  /** Integer-exact boosting: [[BoostRounds]] weighted stumps chained by
    * the deterministic doubling rule — every row a round's stump
    * misclassifies has its weight multiplied by 2 (integer, so the
    * weight trajectory is exact; classic AdaBoost's float α re-weights
    * are what keep gradient boosting out of the oracle-checkable set) —
    * and the ensemble predicts by MAJORITY of the three stumps (odd
    * count: no vote ties to break). Weights stay <= 2^(rounds-1): no
    * overflow for any feasible round count.
    *
    * Scale shape: the corpus shuffles ONCE. Stump predictions depend
    * only on f, so every round's weight is a pure function of (f, y) —
    * the whole chain (three trainings AND the final confusion matrix)
    * folds over the once-aggregated per-threshold (f, n1, n0) table,
    * with each round's weighted (cnt, pos) re-derived by literal
    * arithmetic over |distinct f| rows ([[decisionStumpG]]). The model
    * is a single collected row per round (contract-bounded, like the
    * centroid collects). Measured at sf0.1: 5.5 s (row-level rounds) →
    * 3.9 s warm. Same trajectory as the row-level formulation — the
    * oracle replays row-level and the hash gate proves the collapse.
    */
  def boostedStumps(labeled0: DataFrame): DataFrame = {
    final case class M(t: Long, err: Long, nl: Long, pl: Long, nr: Long,
      pr: Long)
    def train(g: DataFrame): M = {
      val r = decisionStumpG(g).head()
      M(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    }
    // per-side majority resolves on the driver (the model is one row),
    // so each stump's per-row prediction is a literal threshold compare
    def pred(m: M) = when(col("f") <= m.t,
      lit(if (2L * m.pl > m.nl) 1L else 0L))
      .otherwise(lit(if (2L * m.pr > m.nr) 1L else 0L))

    // EVERY round's weight is a pure function of (f, y): stump
    // predictions depend only on f, so the ×2-on-miss chain collapses
    // onto the once-aggregated per-threshold table — (f, n1, n0) counts
    // shuffle ONCE, and rounds 2..R re-derive weighted (cnt, pos) with
    // literal arithmetic over |distinct f| rows. Same trajectory as the
    // row-level formulation, verified by the unchanged oracle replay.
    val g0 = labeled0.groupBy(col("f")).agg(
      sum(col("y")).as("n1"),
      (count(lit(1)) - sum(col("y"))).as("n0")).localCheckpoint(true)
    def weightedG(ms: Seq[M]): DataFrame = {
      // weight of a (f, y) cell = 2^(# prior stumps misclassifying it)
      def wFor(y: Long) = ms.foldLeft(lit(1L)) { (w, m) =>
        w * when(pred(m) =!= lit(y), 2L).otherwise(1L)
      }
      g0.select(col("f"),
        (col("n1") * wFor(1L) + col("n0") * wFor(0L)).as("cnt"),
        (col("n1") * wFor(1L)).as("pos"))
    }
    val m1 = train(weightedG(Nil))
    val m2 = train(weightedG(Seq(m1)))
    val m3 = train(weightedG(Seq(m1, m2)))
    val maj = when(pred(m1) + pred(m2) + pred(m3) >= 2, 1L).otherwise(0L)
    // the confusion matrix also folds over the aggregated table: the
    // ensemble prediction is a function of f, so tp/fp/tn/fn are sums
    // of n1/n0 gated by maj(f)
    g0.select(col("n1"), col("n0"), maj.as("pred"))
      .agg(
        sum(when(col("pred") === 1L, col("n1")).otherwise(0L)).as("tp"),
        sum(when(col("pred") === 1L, col("n0")).otherwise(0L)).as("fp"),
        sum(when(col("pred") === 0L, col("n0")).otherwise(0L)).as("tn"),
        sum(when(col("pred") === 0L, col("n1")).otherwise(0L)).as("fn"))
      .select(
        lit(m1.t).as("t1_fp"), lit(m1.err).as("err1"),
        lit(m2.t).as("t2_fp"), lit(m2.err).as("err2_w"),
        lit(m3.t).as("t3_fp"), lit(m3.err).as("err3_w"),
        col("tp"), col("fp"), col("tn"), col("fn"),
        round((col("tp") + col("tn")).cast("double")
          / (col("tp") + col("fp") + col("tn") + col("fn")), 6).as("acc"))
  }

  def boostedQuery(s: SparkSession, dir: String): DataFrame =
    boostedStumps(stumpInput(s, dir))

  /** Feature selection by split quality — the depth-1 "which column
    * predicts the label" ranking a curation pipeline runs before
    * training a gate classifier: the EXACT stump search
    * ([[decisionStump]] — integer misclassification err, no float
    * argmin to drift) runs once per candidate feature, and features
    * rank by (err, name). Each feature is one independent
    * groupBy-threshold aggregation; the candidate set is config-sized,
    * so the whole ranking is |features| combinable passes.
    */
  def featureRank(lineitem: DataFrame): DataFrame = {
    val y = when(col("l_returnflag") === lit("R"), 1L).otherwise(0L)
    val feats: Seq[(String, Column)] = Seq(
      ("price_cents", round(col("l_extendedprice") * 100).cast("long")),
      ("quantity", col("l_quantity").cast("long")),
      ("discount_cents", round(col("l_discount") * 100).cast("long")))
    val stumps = feats.map { case (name, f) =>
      decisionStump(lineitem.select(f.as("f"), y.as("y")))
        .select(lit(name).as("feature"), col("threshold_fp"), col("err"),
          col("acc"))
    }.reduce(_ unionAll _)
    val w = Window.orderBy(col("err"), col("feature"))
    // 3-row frame: the global window is a no-op at scale
    stumps.withColumn("rank", row_number().over(w))
  }

  def featureRankQuery(s: SparkSession, dir: String): DataFrame =
    featureRank(Tables.lineitem(s, dir))

  val KnnK = 5
  val KnnHoldout = 25

  /** k-NN classification over the embedding corpus — the
    * label-propagation-by-similarity primitive a curation pipeline uses
    * to extend a small labeled seed set ("find me more like these"):
    * every held-out vector (vec_id % [[KnnHoldout]] == 0, the
    * deterministic test fold) is scored against the remaining labeled
    * corpus by exact cosine, its [[KnnK]] nearest vote, majority wins
    * (vote ties break to the smaller label, rank-boundary cosine ties
    * to the smaller neighbor id — both deterministic cross-engine).
    *
    * Scale shape is the [[graft.ops.Similarity.bruteForceTopK]] plan:
    * the test fold broadcasts (1/holdout of the corpus — small by
    * construction), the corpus streams through one codegen'd dot
    * product per (row, query) with NO corpus-side shuffle, and the
    * vote is a combinable count over k*|test| rows. Cosine is ranked
    * at round-6 like the whole ANN family (raw last-bit doubles differ
    * between engines; a near-tie at the rank-k boundary would
    * otherwise flip set membership).
    */
  def knnClassify(emb: DataFrame, k: Int = KnnK,
      holdout: Int = KnnHoldout): DataFrame = {
    import graft.functions.VectorOps.{vec_dot, vec_unit}
    val unit = emb.select(col("vec_id"), col("label").cast("long").as("label"),
      vec_unit(transform(col("embedding"), _.cast("double"))).as("v"))
    val test = unit.filter(col("vec_id") % holdout === 0)
      .select(col("vec_id").as("query_id"),
        col("label").as("true_label"), col("v").as("qv"))
    val train = OpUtil.spread(unit).filter(col("vec_id") % holdout =!= 0)
      .select(col("vec_id").as("neighbor_id"),
        col("label").as("nb_label"), col("v").as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val top = train.crossJoin(broadcast(test))
      .select(col("query_id"), col("true_label"), col("neighbor_id"),
        col("nb_label"), round(vec_dot(col("qv"), col("cv")), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    val votes = top.groupBy("query_id", "true_label", "nb_label")
      .agg(count(lit(1)).as("n_votes"))
    val vw = Window.partitionBy(col("query_id"))
      .orderBy(col("n_votes").desc, col("nb_label"))
    votes.withColumn("vr", row_number().over(vw))
      .filter(col("vr") === 1)
      .select(col("query_id"), col("true_label"),
        col("nb_label").as("pred_label"), col("n_votes"),
        when(col("nb_label") === col("true_label"), 1L).otherwise(0L)
          .as("correct"))
  }

  def knnQuery(s: SparkSession, dir: String): DataFrame =
    knnClassify(Tables.embeddings(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_boosted_stumps" -> (boostedQuery _),
    "ml_feature_rank" -> (featureRankQuery _),
    "ml_ridge_exact" -> (ridgeQuery _),
    "ml_knn_classify" -> (knnQuery _),
    "ml_decision_stump" -> (stumpQuery _),
    "ml_stump_apply" -> (stumpApplyQuery _),
    "ml_linreg_exact" -> (linregQuery _),
    "ml_perceptron" -> (perceptronQuery _),
    "ml_naive_bayes" -> (naiveBayesQuery _),
    "ml_auc_report" -> (aucQuery _),
    "ml_linreg_multi" -> (linregMultiQuery _),
    "ml_calibration" -> (calibrationQuery _),
    "ml_logreg_irls" -> (logregQuery _),
    "stream_linreg" -> (linregStream _))

  private val linregOracle: String =
    """WITH b AS (
      |  SELECT l_quantity::BIGINT AS x,
      |    round(l_extendedprice * 100)::BIGINT AS y
      |  FROM lineitem),
      |s AS (
      |  SELECT count(*)::BIGINT AS n, sum(x::HUGEINT) AS sx,
      |    sum(y::HUGEINT) AS sy, sum((x * x)::HUGEINT) AS sxx,
      |    sum((x * y)::HUGEINT) AS sxy
      |  FROM b),
      |c AS (
      |  SELECT n, sx, sy, sxx, sxy,
      |    n::HUGEINT * sxx - sx * sx AS det,
      |    sxx * sy - sx * sxy AS beta0_num,
      |    n::HUGEINT * sxy - sx * sy AS beta1_num
      |  FROM s)
      |SELECT n, sx::VARCHAR AS sx, sy::VARCHAR AS sy, sxx::VARCHAR AS sxx,
      |  sxy::VARCHAR AS sxy, det::VARCHAR AS det,
      |  beta0_num::VARCHAR AS beta0_num, beta1_num::VARCHAR AS beta1_num,
      |  round(beta0_num::DOUBLE / det::DOUBLE, 6) AS beta0,
      |  round(beta1_num::DOUBLE / det::DOUBLE, 6) AS beta1
      |FROM c""".stripMargin

  // the three training epochs replayed as chained CTEs: m<e> = the
  // epoch-e misclassified aggregate under the previous weights, w<e> =
  // the running weights after the update
  private val perceptronOracle: String =
    """WITH f AS (
      |  SELECT 1::BIGINT AS x0, n_chars::BIGINT AS x1,
      |    len(list_filter(string_split(text, ' '),
      |      t -> length(t) > 0))::BIGINT AS x2,
      |    length(regexp_replace(text, '[^0-9]', '', 'g'))::BIGINT AS x3,
      |    (CASE WHEN lang = 'en' THEN 1 ELSE -1 END)::BIGINT AS y
      |  FROM documents),
      |m1 AS (
      |  SELECT coalesce(sum(y * x0), 0)::BIGINT AS d0,
      |    coalesce(sum(y * x1), 0)::BIGINT AS d1,
      |    coalesce(sum(y * x2), 0)::BIGINT AS d2,
      |    coalesce(sum(y * x3), 0)::BIGINT AS d3,
      |    count(*)::BIGINT AS m
      |  FROM f WHERE y * 0 <= 0),
      |w1 AS (SELECT d0 AS a0, d1 AS a1, d2 AS a2, d3 AS a3, m FROM m1),
      |m2 AS (
      |  SELECT coalesce(sum(y * x0), 0)::BIGINT AS d0,
      |    coalesce(sum(y * x1), 0)::BIGINT AS d1,
      |    coalesce(sum(y * x2), 0)::BIGINT AS d2,
      |    coalesce(sum(y * x3), 0)::BIGINT AS d3,
      |    count(*)::BIGINT AS m
      |  FROM f, w1
      |  WHERE y * (a0 * x0 + a1 * x1 + a2 * x2 + a3 * x3) <= 0),
      |w2 AS (
      |  SELECT w1.a0 + m2.d0 AS a0, w1.a1 + m2.d1 AS a1,
      |    w1.a2 + m2.d2 AS a2, w1.a3 + m2.d3 AS a3, m2.m
      |  FROM w1, m2),
      |m3 AS (
      |  SELECT coalesce(sum(y * x0), 0)::BIGINT AS d0,
      |    coalesce(sum(y * x1), 0)::BIGINT AS d1,
      |    coalesce(sum(y * x2), 0)::BIGINT AS d2,
      |    coalesce(sum(y * x3), 0)::BIGINT AS d3,
      |    count(*)::BIGINT AS m
      |  FROM f, w2
      |  WHERE y * (a0 * x0 + a1 * x1 + a2 * x2 + a3 * x3) <= 0),
      |w3 AS (
      |  SELECT w2.a0 + m3.d0 AS a0, w2.a1 + m3.d1 AS a1,
      |    w2.a2 + m3.d2 AS a2, w2.a3 + m3.d3 AS a3, m3.m
      |  FROM w2, m3)
      |SELECT 1 AS epoch, a0 AS w0, a1 AS w1, a2 AS w2, a3 AS w3,
      |  m AS n_mis FROM w1
      |UNION ALL SELECT 2, a0, a1, a2, a3, m FROM w2
      |UNION ALL SELECT 3, a0, a1, a2, a3, m FROM w3""".stripMargin

  private val naiveBayesOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, is_en, tok FROM (
      |    SELECT doc_id,
      |      (CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS is_en,
      |      unnest(string_split(text, ' ')) AS tok
      |    FROM documents)
      |  WHERE length(tok) > 0),
      |tc AS (
      |  SELECT tok, sum(is_en)::BIGINT AS cnt_en,
      |    sum(1 - is_en)::BIGINT AS cnt_ot
      |  FROM toks GROUP BY tok),
      |cs AS (
      |  SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_en,
      |    sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS n_ot
      |  FROM documents),
      |ts AS (
      |  SELECT sum(cnt_en)::BIGINT AS tot_en, sum(cnt_ot)::BIGINT AS tot_ot,
      |    count(*)::BIGINT AS v
      |  FROM tc),
      |tl AS (
      |  SELECT tok,
      |    round((ln((cnt_en + 1.0) / (tot_en + v))
      |      - ln((cnt_ot + 1.0) / (tot_ot + v))) * 1000000)::BIGINT AS llr_fp
      |  FROM tc CROSS JOIN ts),
      |pd AS (
      |  SELECT doc_id, sum(llr_fp)::BIGINT AS tok_llr
      |  FROM toks JOIN tl USING (tok) GROUP BY doc_id),
      |o AS (
      |  SELECT d.doc_id,
      |    (round(ln(n_en::DOUBLE / n_ot) * 1000000)::BIGINT
      |      + coalesce(pd.tok_llr, 0))::BIGINT AS llr_fp,
      |    (CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END)::INT AS is_en
      |  FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id CROSS JOIN cs)
      |SELECT doc_id, llr_fp,
      |  (CASE WHEN llr_fp >= 0 THEN 1 ELSE 0 END)::INT AS pred_en, is_en
      |FROM o""".stripMargin

  // same 3x3 Cramer expansion over HUGEINT sums; a(ei-fh)-b(di-fg)+c(dh-eg)
  private def linregMultiOracle(lam: Long = 0L): String = {
    def det3(a: String, b: String, c: String, d: String, e: String,
        f: String, g: String, h: String, i: String): String =
      s"$a * ($e * $i - $f * $h) - $b * ($d * $i - $f * $g) + $c * ($d * $h - $e * $g)"
    // the λ-augmented normal-matrix diagonal (λ=0 is plain OLS)
    val (lx11, lx22) = (s"(sx11 + $lam::HUGEINT)", s"(sx22 + $lam::HUGEINT)")
    val det = det3("nh", "sx1", "sx2", "sx1", lx11, "sx12", "sx2", "sx12", lx22)
    val b0n = det3("sy", "sx1", "sx2", "sx1y", lx11, "sx12", "sx2y", "sx12", lx22)
    val b1n = det3("nh", "sy", "sx2", "sx1", "sx1y", "sx12", "sx2", "sx2y", lx22)
    val b2n = det3("nh", "sx1", "sy", "sx1", lx11, "sx1y", "sx2", "sx12", "sx2y")
    s"""WITH b AS (
       |  SELECT l_quantity::BIGINT AS x1,
       |    round(l_discount * 100)::BIGINT AS x2,
       |    round(l_extendedprice * 100)::BIGINT AS y
       |  FROM lineitem),
       |s AS (
       |  SELECT count(*)::BIGINT AS n, count(*)::HUGEINT AS nh,
       |    sum(x1::HUGEINT) AS sx1, sum(x2::HUGEINT) AS sx2,
       |    sum((x1 * x1)::HUGEINT) AS sx11, sum((x1 * x2)::HUGEINT) AS sx12,
       |    sum((x2 * x2)::HUGEINT) AS sx22, sum(y::HUGEINT) AS sy,
       |    sum((x1 * y)::HUGEINT) AS sx1y, sum((x2 * y)::HUGEINT) AS sx2y
       |  FROM b),
       |c AS (
       |  SELECT n, sx1, sx2, sx11, sx12, sx22, sy, sx1y, sx2y,
       |    $det AS det, $b0n AS beta0_num, $b1n AS beta1_num,
       |    $b2n AS beta2_num
       |  FROM s)
       |SELECT n, sx1::VARCHAR AS sx1, sx2::VARCHAR AS sx2,
       |  sx11::VARCHAR AS sx11, sx12::VARCHAR AS sx12,
       |  sx22::VARCHAR AS sx22, sy::VARCHAR AS sy,
       |  sx1y::VARCHAR AS sx1y, sx2y::VARCHAR AS sx2y,
       |  det::VARCHAR AS det, beta0_num::VARCHAR AS beta0_num,
       |  beta1_num::VARCHAR AS beta1_num, beta2_num::VARCHAR AS beta2_num,
       |  round(beta0_num::DOUBLE / det::DOUBLE, 6) AS beta0,
       |  round(beta1_num::DOUBLE / det::DOUBLE, 6) AS beta1,
       |  round(beta2_num::DOUBLE / det::DOUBLE, 6) AS beta2
       |FROM c""".stripMargin
  }

  // the NB replay feeds the rank-statistic replay: distinct-score
  // groups, running-count rank spans, midrank-doubled Mann-Whitney
  private def aucOracle: String =
    s"""WITH nb AS ($naiveBayesOracle),
       |g AS (
       |  SELECT llr_fp AS s, count(*)::BIGINT AS cnt,
       |    sum(is_en)::BIGINT AS pos
       |  FROM nb GROUP BY 1),
       |r AS (
       |  SELECT s, cnt, pos,
       |    sum(cnt) OVER (ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
       |  FROM g),
       |t AS (
       |  SELECT sum(pos * (2 * cum - cnt + 1))::BIGINT AS possum2,
       |    sum(pos)::BIGINT AS n_pos, sum(cnt - pos)::BIGINT AS n_neg
       |  FROM r)
       |SELECT n_pos, n_neg,
       |  (possum2 - n_pos * (n_pos + 1))::BIGINT AS auc_num,
       |  (2 * n_pos * n_neg)::BIGINT AS auc_den,
       |  round((possum2 - n_pos * (n_pos + 1))::DOUBLE
       |    / (2 * n_pos * n_neg), 6) AS auc
       |FROM t""".stripMargin

  // sigmoid + 1e-6 rounding per doc, then pure integer bin arithmetic
  private def calibrationOracle: String =
    s"""WITH nb AS ($naiveBayesOracle),
       |pb AS (
       |  SELECT is_en::BIGINT AS y,
       |    round(1.0 / (1.0 + exp(-(llr_fp / 1000000.0)))
       |      * 1000000)::BIGINT AS p_fp
       |  FROM nb),
       |bb AS (SELECT least(p_fp // 100000, 9)::BIGINT AS bin, y, p_fp FROM pb)
       |SELECT bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
       |  (sum(p_fp) // count(*))::BIGINT AS conf_fp,
       |  ((sum(y) * 1000000) // count(*))::BIGINT AS acc_fp
       |FROM bb GROUP BY bin""".stripMargin

  // the identical prefix-sum split search, DuckDB's window doing the
  // cumsum the engine shards; integer err argmin, one rounded division
  private def stumpCtesFor(fExpr: String): String =
    s"""WITH ft AS (
      |  SELECT $fExpr AS f,
      |    (CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT AS y
      |  FROM lineitem),
      |g AS (
      |  SELECT f, count(*)::BIGINT AS cnt, sum(y)::BIGINT AS pos
      |  FROM ft GROUP BY 1),
      |t AS (SELECT sum(cnt)::BIGINT AS n, sum(pos)::BIGINT AS p FROM g),
      |c AS (
      |  SELECT f,
      |    sum(cnt) OVER w::BIGINT AS nl, sum(pos) OVER w::BIGINT AS pl
      |  FROM g
      |  WINDOW w AS (ORDER BY f
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |s AS (
      |  SELECT c.f, c.nl, c.pl, t.n - c.nl AS nr, t.p - c.pl AS pr,
      |    least(c.pl, c.nl - c.pl)
      |      + least(t.p - c.pl, (t.n - c.nl) - (t.p - c.pl)) AS err,
      |    t.n AS n
      |  FROM c CROSS JOIN t WHERE c.nl < t.n)""".stripMargin

  private val stumpCtes: String =
    stumpCtesFor("round(l_extendedprice * 100)::BIGINT")

  private def stumpOracle: String = stumpCtes +
    """
      |SELECT f AS threshold_fp, err, nl AS n_left, pl AS pos_left,
      |  nr AS n_right, pr AS pos_right,
      |  round((n - err)::DOUBLE / n, 6) AS acc
      |FROM s ORDER BY err, f LIMIT 1""".stripMargin

  // train + apply replayed: the chosen split scores every row (each
  // side predicts its majority class, ties to 0), confusion counts are
  // integer sums, accuracy the one rounded division
  private def stumpApplyOracle: String = stumpCtes +
    """,
      |best AS (SELECT f, nl, pl, nr, pr FROM s ORDER BY err, f LIMIT 1),
      |scored AS (
      |  SELECT ft.y,
      |    CASE WHEN ft.f <= best.f
      |      THEN (CASE WHEN 2 * best.pl > best.nl THEN 1 ELSE 0 END)
      |      ELSE (CASE WHEN 2 * best.pr > best.nr THEN 1 ELSE 0 END)
      |    END AS pred
      |  FROM ft CROSS JOIN best),
      |cm AS (
      |  SELECT
      |    sum(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END)::BIGINT AS tp,
      |    sum(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END)::BIGINT AS fp,
      |    sum(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END)::BIGINT AS tn,
      |    sum(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END)::BIGINT AS fn
      |  FROM scored)
      |SELECT tp, fp, tn, fn,
      |  round((tp + tn)::DOUBLE / (tp + fp + tn + fn), 6) AS acc
      |FROM cm""".stripMargin

  // one weighted-stump search round: weight-sum groupBy, window cumsum,
  // integer err argmin, then the next round's ft with doubled weights
  // on this stump's misses. pr{r} is the stump's per-row prediction.
  private def wstumpRound(r: Int): String = {
    val ft = s"ft$r"
    val pr = s"""(CASE WHEN ft.f <= b.f
       |      THEN (CASE WHEN 2 * b.pl > b.nl THEN 1 ELSE 0 END)
       |      ELSE (CASE WHEN 2 * b.pr > b.nr THEN 1 ELSE 0 END) END)"""
      .stripMargin
    s"""g$r AS (
       |  SELECT f, sum(w)::BIGINT AS cnt, sum(y * w)::BIGINT AS pos
       |  FROM $ft GROUP BY 1),
       |t$r AS (SELECT sum(cnt)::BIGINT AS n, sum(pos)::BIGINT AS p
       |  FROM g$r),
       |c$r AS (
       |  SELECT f, sum(cnt) OVER w_::BIGINT AS nl,
       |    sum(pos) OVER w_::BIGINT AS pl
       |  FROM g$r
       |  WINDOW w_ AS (ORDER BY f
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |s$r AS (
       |  SELECT c.f, c.nl, c.pl, t.n - c.nl AS nr, t.p - c.pl AS pr,
       |    least(c.pl, c.nl - c.pl)
       |      + least(t.p - c.pl, (t.n - c.nl) - (t.p - c.pl)) AS err
       |  FROM c$r c CROSS JOIN t$r t WHERE c.nl < t.n),
       |b$r AS (SELECT f, nl, pl, nr, pr, err FROM s$r
       |  ORDER BY err, f LIMIT 1),
       |ft${r + 1} AS (
       |  SELECT ft.f, ft.y,
       |    ft.w * (CASE WHEN $pr != ft.y THEN 2 ELSE 1 END) AS w
       |  FROM $ft ft CROSS JOIN b$r b)""".stripMargin
  }

  // the three boosting rounds replayed; the ensemble is the literal
  // majority of the three per-row stump predictions
  private def boostedOracle: String = {
    def p(r: Int): String =
      s"""(CASE WHEN ft.f <= b$r.f
         |      THEN (CASE WHEN 2 * b$r.pl > b$r.nl THEN 1 ELSE 0 END)
         |      ELSE (CASE WHEN 2 * b$r.pr > b$r.nr THEN 1 ELSE 0 END)
         |    END)""".stripMargin
    s"""WITH ftb AS (
       |  SELECT round(l_extendedprice * 100)::BIGINT AS f,
       |    (CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT AS y
       |  FROM lineitem),
       |ft1 AS (SELECT f, y, 1::BIGINT AS w FROM ftb),
       |""".stripMargin +
      (1 to BoostRounds).map(wstumpRound).mkString(",\n") +
      s""",
         |scored AS (
         |  SELECT ft.y,
         |    (CASE WHEN ${p(1)} + ${p(2)} + ${p(3)} >= 2
         |      THEN 1 ELSE 0 END) AS pred
         |  FROM ft1 ft CROSS JOIN b1 CROSS JOIN b2 CROSS JOIN b3),
         |cm AS (
         |  SELECT
         |    sum(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END)::BIGINT
         |      AS tp,
         |    sum(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END)::BIGINT
         |      AS fp,
         |    sum(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END)::BIGINT
         |      AS tn,
         |    sum(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END)::BIGINT
         |      AS fn
         |  FROM scored)
         |SELECT b1.f AS t1_fp, b1.err AS err1,
         |  b2.f AS t2_fp, b2.err AS err2_w,
         |  b3.f AS t3_fp, b3.err AS err3_w,
         |  cm.tp, cm.fp, cm.tn, cm.fn,
         |  round((cm.tp + cm.tn)::DOUBLE
         |    / (cm.tp + cm.fp + cm.tn + cm.fn), 6) AS acc
         |FROM cm CROSS JOIN b1 CROSS JOIN b2 CROSS JOIN b3""".stripMargin
  }

  // exact-cosine top-k (the proven bruteforce round-6 equivalence,
  // list_cosine_similarity vs the Spark unit-dot) then a pure integer
  // vote: count per (query, label), majority with label-asc tie-break
  private val knnOracle: String =
    s"""WITH t AS (
       |  SELECT vec_id AS query_id, label::BIGINT AS true_label,
       |    embedding::DOUBLE[] AS qv
       |  FROM embeddings WHERE vec_id % $KnnHoldout = 0),
       |tr AS (
       |  SELECT vec_id AS neighbor_id, label::BIGINT AS nb_label,
       |    embedding::DOUBLE[] AS cv
       |  FROM embeddings WHERE vec_id % $KnnHoldout != 0),
       |scored AS (
       |  SELECT query_id, true_label, neighbor_id, nb_label,
       |    round(list_cosine_similarity(qv, cv), 6) AS cos
       |  FROM t CROSS JOIN tr),
       |rk AS (
       |  SELECT query_id, true_label, nb_label,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id) AS rn
       |  FROM scored),
       |votes AS (
       |  SELECT query_id, true_label, nb_label, count(*)::BIGINT AS n_votes
       |  FROM rk WHERE rn <= $KnnK GROUP BY 1, 2, 3),
       |vr AS (
       |  SELECT query_id, true_label, nb_label, n_votes,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY n_votes DESC, nb_label) AS vrn
       |  FROM votes)
       |SELECT query_id, true_label, nb_label AS pred_label, n_votes,
       |  (CASE WHEN nb_label = true_label THEN 1 ELSE 0 END)::BIGINT
       |    AS correct
       |FROM vr WHERE vrn = 1""".stripMargin

  // one stump oracle per candidate feature, unioned and ranked by
  // (err, feature) — each arm is the full stump replay as a subquery
  private def featureRankOracle: String = {
    val feats = Seq(
      ("price_cents", "round(l_extendedprice * 100)::BIGINT"),
      ("quantity", "l_quantity::BIGINT"),
      ("discount_cents", "round(l_discount * 100)::BIGINT"))
    val arms = feats.map { case (name, fe) =>
      s"SELECT '$name' AS feature, t.threshold_fp, t.err, t.acc FROM (\n" +
        stumpCtesFor(fe) +
        """
          |SELECT f AS threshold_fp, err,
          |  round((n - err)::DOUBLE / n, 6) AS acc
          |FROM s ORDER BY err, f LIMIT 1""".stripMargin + "\n) t"
    }.mkString("\nUNION ALL\n")
    s"""WITH all_f AS (
       |$arms)
       |SELECT feature, threshold_fp, err, acc,
       |  row_number() OVER (ORDER BY err, feature) AS rank
       |FROM all_f""".stripMargin
  }

  /** The IRLS fit replayed iteration by iteration: each round's five
    * float sums, the 2x2 Newton solve, betas threaded through CTEs.
    * Expression shapes mirror the Spark side exactly (same
    * associativity, same sigmoid form) so the round-6 betas and mean
    * log-likelihood land on the same values.
    */
  private val logregOracle: String = {
    def iter(n: Int, prev: String): String =
      s"""p$n AS (
         |  SELECT b.x, b.y,
         |    1.0 / (1.0 + exp(-($prev.b0 + $prev.b1 * b.x))) AS p
         |  FROM base b, $prev),
         |i$n AS (
         |  SELECT sum(p * (1.0 - p)) AS sw, sum(p * (1.0 - p) * x) AS swx,
         |    sum(p * (1.0 - p) * x * x) AS swxx,
         |    sum(y - p) AS g0, sum((y - p) * x) AS g1
         |  FROM p$n),
         |b$n AS (
         |  SELECT $prev.b0 + (i$n.swxx * i$n.g0 - i$n.swx * i$n.g1)
         |      / (i$n.sw * i$n.swxx - i$n.swx * i$n.swx) AS b0,
         |    $prev.b1 + (i$n.sw * i$n.g1 - i$n.swx * i$n.g0)
         |      / (i$n.sw * i$n.swxx - i$n.swx * i$n.swx) AS b1
         |  FROM $prev, i$n)""".stripMargin
    val iters = (1 to IrlsIters)
      .map(n => iter(n, if (n == 1) "b0cte" else s"b${n - 1}"))
      .mkString(",\n")
    val fin = s"b$IrlsIters"
    s"""WITH base AS (
       |  SELECT o_totalprice / $LogregXScale AS x,
       |    CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y
       |  FROM orders),
       |b0cte AS (SELECT 0.0 AS b0, 0.0 AS b1),
       |$iters,
       |pf AS (
       |  SELECT b.y,
       |    1.0 / (1.0 + exp(-($fin.b0 + $fin.b1 * b.x))) AS p
       |  FROM base b, $fin)
       |SELECT (SELECT count(*) FROM base)::BIGINT AS n,
       |  round($fin.b0, 6) AS beta0, round($fin.b1, 6) AS beta1,
       |  (SELECT round(sum(y * ln(p) + (1.0 - y) * ln(1.0 - p))
       |     / count(*), 6) FROM pf) AS mean_ll
       |FROM $fin""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "ml_logreg_irls" -> logregOracle,
    "ml_feature_rank" -> featureRankOracle,
    "ml_boosted_stumps" -> boostedOracle,
    "ml_knn_classify" -> knnOracle,
    "ml_decision_stump" -> stumpOracle,
    "ml_stump_apply" -> stumpApplyOracle,
    "ml_linreg_exact" -> linregOracle,
    "ml_perceptron" -> perceptronOracle,
    "ml_naive_bayes" -> naiveBayesOracle,
    "ml_auc_report" -> aucOracle,
    // stream/batch training equivalence: the streamed sums must finalize
    // to the IDENTICAL exact fit
    "stream_linreg" -> linregOracle,
    "ml_linreg_multi" -> linregMultiOracle(),
    "ml_ridge_exact" -> linregMultiOracle(RidgeLambda),
    "ml_calibration" -> calibrationOracle)
}
