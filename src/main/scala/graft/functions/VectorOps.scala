package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
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

/** Squared L2 distance between two array<double> columns — same codegen
  * rationale as [[VectorDot]]: one fused left-to-right Java loop, so the
  * accumulation order is fixed and a SQL oracle summing the same way
  * reproduces the double bit-for-bit.
  */
case class VectorSqDist(left: Expression, right: Expression)
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
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorSqDist =
    copy(left = newLeft, right = newRight)
}

/** Identity wrapper marked non-deterministic so the optimizer will not
  * move a predicate built on it. Motivation: a selective filter on an
  * expensive projected expression (e.g. a vector dot product) gets
  * substituted through the Project and pushed into a nested-loop join
  * condition, where it is (a) evaluated for every *ordered* candidate
  * pair — before the cheap `id < id` dedup check — and (b) recomputed in
  * the output projection. The barrier pins the filter above the Project,
  * so the expensive expression runs exactly once per surviving row.
  */
case class PushdownBarrier(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(c: Expression): PushdownBarrier =
    copy(child = c)
}

object VectorOps {

  /** Pin a filter where it stands: `df.filter(no_pushdown(col("c")) > x)`. */
  def no_pushdown(c: Column): Column =
    GraftShims.columnOf(PushdownBarrier(GraftShims.expressionOf(c)))

  /** Dot product of two array<double> columns (codegen'd). */
  def vec_dot(a: Column, b: Column): Column =
    GraftShims.columnOf(VectorDot(
      GraftShims.expressionOf(a), GraftShims.expressionOf(b)))

  /** Squared L2 distance of two array<double> columns (codegen'd). */
  def vec_sqdist(a: Column, b: Column): Column =
    GraftShims.columnOf(VectorSqDist(
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
