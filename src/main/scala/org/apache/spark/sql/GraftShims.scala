package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column↔Expression converters (Spark 4 removed
  * the public `new Column(expr)` constructor when Column moved to the
  * connect-compatible API). This is the only reach into Spark internals
  * in the codebase.
  */
object GraftShims {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
