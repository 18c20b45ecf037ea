package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for embedding math.
  *
  * The declarative alternative (`aggregate(zip_with(a, b, _*_), 0, _+_)`)
  * evaluates its lambda per element per row in the interpreter — on an
  * O(pairs) similarity join that dominated the whole benchmark. This
  * expression stays inside whole-stage codegen: one fused Java loop over
  * the two unsafe array buffers per pair.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorOps {

  /** Dot product of two array<double> columns (codegen'd). */
  def vec_dot(a: Column, b: Column): Column =
    GraftShims.columnOf(VectorDot(
      GraftShims.expressionOf(a), GraftShims.expressionOf(b)))

  /** L2 norm. */
  def vec_norm(a: Column): Column = sqrt(vec_dot(a, a))

  /** Unit-normalized copy of an array<double> column (zero vectors pass
    * through unchanged rather than dividing by zero).
    */
  def vec_unit(a: Column): Column = {
    val n = vec_norm(a)
    when(n === 0.0, a).otherwise(transform(a, x => x / n))
  }

  /** Cosine via pre-normalization-free formula (single pass per side). */
  def vec_cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / (vec_norm(a) * vec_norm(b))
}
