package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `explode_shingles(text, k)` — the engine's custom Catalyst GENERATOR
  * (the UDTF-shaped extension point, completing the quartet next to the
  * scalar `Expression` (ElfHashExpr/VectorDot), the whole-operator
  * `SparkPlan` (AsofJoin), and the `TypedImperativeAggregate`
  * (HllRegsAgg)): one input row fans out to its DISTINCT k-token word
  * shingles, the primitive under the whole near-dup dedup family.
  *
  * Why a Generator and not the typed flatMap: the flatMap path must
  * decode every row to a (Long, String) tuple, run the closure, and
  * re-encode each emitted tuple through the Dataset encoder. The
  * generator stays inside Tungsten — the text column arrives as
  * [[UTF8String]], tokens are found by a single byte scan (0x20 never
  * occurs inside a multi-byte UTF-8 sequence, so byte-splitting is
  * exact), and each shingle is a zero-copy slice of the original byte
  * array (tokens are single-space separated, so the byte range from
  * token i through token i+k-1 IS the `mkString(" ")` of those tokens —
  * including the empty-token behavior of `split(" ", -1)`). Per-doc
  * dedup happens inside the generator, so no downstream `distinct`
  * shuffle is ever needed — same contract as
  * [[graft.ops.Dedup.shingles]], which this backs.
  */
case class ShingleExplode(child: Expression, k: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType) :: Nil)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType && k >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"explode_shingles needs (string, k >= 1), got (${child.dataType}, $k)")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input)
    if (text == null) return Iterator.empty
    val bytes = text.asInstanceOf[UTF8String].getBytes
    // token start offsets: position 0 and every byte after a 0x20
    var nTokens = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nTokens += 1; i += 1 }
    if (nTokens < k) return Iterator.empty
    val starts = new Array[Int](nTokens + 1)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTokens) = bytes.length + 1 // sentinel: end(j) = starts(j+1) - 1
    val seen = new java.util.HashSet[UTF8String]()
    val out = Vector.newBuilder[InternalRow]
    var w = 0
    while (w + k <= nTokens) {
      val from = starts(w)
      val len = starts(w + k) - 1 - from
      val sh = UTF8String.fromBytes(bytes, from, len)
      if (seen.add(sh)) out += InternalRow(sh)
      w += 1
    }
    out.result()
  }

  override def terminate(): IterableOnce[InternalRow] = Iterator.empty

  override protected def withNewChildInternal(newChild: Expression): ShingleExplode =
    copy(child = newChild)
}

object ShingleExplode {
  /** DataFrame-facing column: `select(col("doc_id"),
    * shingle_explode(col("text"), 5).as("shingle"))`.
    */
  def shingle_explode(text: Column, k: Int): Column =
    GraftShims.columnOf(ShingleExplode(GraftShims.expressionOf(text), k))
}
