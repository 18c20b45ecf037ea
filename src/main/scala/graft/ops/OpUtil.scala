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
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
