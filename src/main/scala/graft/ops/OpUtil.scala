package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared helpers for the operator layer. */
object OpUtil {

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
