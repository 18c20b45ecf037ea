package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen'd Catalyst
  * expression — the text-cleaning primitive every ingest pipeline runs
  * before tokenization/dedup (mixed-form crawls make byte-identical
  * text hash differently: composed 'á' vs 'a'+U+0301). A JVM
  * `java.text.Normalizer` call per row, no UDF boxing: the form is
  * resolved to a constant at plan time and the generated code calls the
  * static normalizer directly on the decoded string.
  *
  * Scale shape: purely row-local (narrow, no shuffle), so it fuses into
  * whole-stage codegen with the surrounding scan/filter like any
  * built-in string function.
  */
case class UnicodeNormExpr(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {

  private val normForm: Normalizer.Form = Normalizer.Form.valueOf(form)

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Normalizer.normalize(input.asInstanceOf[UTF8String].toString, normForm))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.${normForm.name()}));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormExpr =
    copy(child = newChild)
}

object UnicodeNormExpr {

  /** DataFrame-side helper: `unicode_norm(col, "NFC")`. */
  def unicode_norm(c: Column, form: String): Column =
    GraftShims.columnOf(UnicodeNormExpr(GraftShims.expressionOf(c), form))
}
