package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to `private[sql]` converters (Spark 4 removed the public
  * `new Column(expr)` constructor when Column moved to the
  * connect-compatible API, and `Dataset.ofRows` has always been
  * private[sql]). This is the only `private[sql]` reach in the
  * codebase; everything else uses public (or DSv1-contract) API.
  */
object GraftShims {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan — e.g. a custom operator node — back
    * into a DataFrame on the given session.
    */
  def dataFrameOf(s: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)

  /** Re-wrap a batch frame as a STREAMING frame — the contract a DSv1
    * streaming `Source.getBatch` must meet (MicroBatchExecution asserts
    * `isStreaming`). Same `internalCreateDataFrame(isStreaming = true)`
    * bridge Spark's own FileStreamSource uses; evaluation stays lazy
    * (the RDD materializes when the micro-batch executes).
    */
  def asStreaming(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }
}
