package graft.functions

import org.apache.spark.sql.{Column, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

import graft.core.ElfHash

/** The reference's default partitioner hash (ELF hash over key bytes,
  * reference `src/panda/Partitioner.cpp:7-18`) as a codegen'd Catalyst
  * expression, so SQL/DataFrame pipelines can reproduce the reference's
  * bucket assignment (`elf_hash(key) % n`).
  */
case class ElfHashExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ElfHash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val g = ctx.freshName("g")
      s"""
         |long $h = 0L;
         |for (int $i = 0; $i < $c.length; $i++) {
         |  $h = ($h << 4) + (($c[$i]) & 0xffL);
         |  long $g = $h & 0xf0000000L;
         |  if ($g != 0L) $h ^= $g >>> 24;
         |  $h &= ~$g;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ElfHashExpr =
    copy(child = newChild)
}

object GraftFunctions {

  /** ELF hash of a binary or string column. */
  def elf_hash(c: Column): Column =
    GraftShims.columnOf(ElfHashExpr(GraftShims.expressionOf(c.cast("binary"))))

  /** Register engine functions for SQL use (`SELECT elf_hash(x), ...`). */
  def register(s: SparkSession): Unit = {
    s.udf // force session init
    val registry = s.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "elf_hash", exprs => ElfHashExpr(exprs.head), "built-in")
    registry.createOrReplaceTempFunction(
      "vec_dot", exprs => VectorDot(exprs.head, exprs(1)), "built-in")
    registry.createOrReplaceTempFunction(
      "unicode_norm",
      exprs => UnicodeNormExpr(exprs.head, exprs(1).eval(null).toString),
      "built-in")
  }
}
