package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared helpers for the operator layer. */
object OpUtil {

  /** `(|a|, |a∖b| + |b∖a|)` under BAG semantics — the two numbers the
    * maintained-index confluence audits pin, in ONE aggregation.
    * Equivalent to `(a.count, a.exceptAll(b).count +
    * b.exceptAll(a).count)`: per distinct row r,
    * max(cntA-cntB, 0) + max(cntB-cntA, 0) = |cntA - cntB|, so the
    * symmetric bag difference is Σ_r |cntA(r) - cntB(r)| and |a| is
    * Σ_r cntA(r) — both rollups of one ±1-weighted union-groupBy.
    * Cost: one shuffle of |a|+|b| rows vs exceptAll×2 + count's three
    * corpus-sized jobs (each exceptAll shuffles both inputs again).
    * NULL handling matches exceptAll: group-by keys compare
    * null-safely. Columns are matched BY POSITION (like exceptAll);
    * callers pass frames with identical schemas.
    */
  private[graft] def bagDiff(a: DataFrame, b: DataFrame): (Long, Long) = {
    val cols = a.columns.toSeq
    // the helper is schema-generic: an input column named like one of
    // the temps would be silently REPLACED by withColumn (and excluded
    // from the group-by keys), making two frames differing only there
    // report diff = 0 — refuse loudly instead
    val clash = cols.filter(Set("_w", "_na", "_net"))
    require(clash.isEmpty,
      s"bagDiff: input column(s) ${clash.mkString(", ")} collide with " +
        "the helper's temp names (_w/_na/_net) — rename them first")
    val tagged = a.withColumn("_w", lit(1L))
      .unionAll(b.toDF(cols: _*).withColumn("_w", lit(-1L)))
    val per = tagged.groupBy(cols.map(col): _*)
      .agg(sum(when(col("_w") === 1L, 1L).otherwise(0L)).as("_na"),
        sum(col("_w")).as("_net"))
    val r = per.agg(coalesce(sum(col("_na")), lit(0L)),
      coalesce(sum(abs(col("_net"))), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Ensure at least default-parallelism partitions before CPU-heavy
    * per-row work. Small parquet inputs arrive as a single split (one
    * row group), which would serialize tokenization / vector math onto
    * one core; a big input already has enough splits and passes through
    * untouched — so at cluster scale this is a no-op, never an extra
    * full-data shuffle.
    */
  def spread(df: DataFrame): DataFrame = {
    // streaming frames can't be probed (`df.rdd` throws pre-writeStream)
    // and don't need to be: micro-batch partitioning follows the source
    if (df.isStreaming) return df
    // only probe scan-shaped plans: on a plan containing an exchange,
    // `df.rdd` under AQE would eagerly materialize every upstream stage
    // just to read the partition count (and the action re-runs them) —
    // post-shuffle frames are already parallel, so pass them through
    val hasExchange = df.queryExecution.sparkPlan
      .find(_.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange])
      .isDefined
    if (hasExchange) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
