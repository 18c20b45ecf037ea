package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native HyperLogLog register aggregate — the engine's demonstration of
  * the custom AGGREGATE extension point (scalar expressions: ElfHashExpr
  * / VectorDot; whole operators: AsofJoin; this closes the triple).
  *
  * Input is the already-hashed 48-bit token hash
  * ([[graft.ops.Sketches.h48]] — md5-derived, engine-independent), so
  * the aggregate is pure bit arithmetic and its registers are IDENTICAL
  * to the SQL-composed [[graft.ops.Sketches.hllRegisters]] path: bucket
  * = top 6 bits, rho = position of the first set bit in the low 42
  * (43 when all-zero). That identity is what lets the native path reuse
  * sketch_hll's DuckDB oracle verbatim.
  *
  * Why it exists next to the SQL composition: ONE aggregation pass with
  * 64 bytes of state per group replaces the two-level
  * groupBy(source, bucket).max + groupBy(source) plan, and the buffer
  * rides the streaming state store (stream_hll_native) — the right tool
  * when group counts explode or the sketch must live across
  * micro-batches.
  *
  * MEASURED crossover (OpScaleProbe, local[32]): the native pass wins
  * at 0.5M-5M tokens (0.5 s vs 1.0 s at x1, 1.6 s vs 2.5 s at x10) but
  * LOSES at 50M (45.5 s vs 10.4 s): TypedImperativeAggregate plans as
  * ObjectHashAggregate, whose per-row update is interpreted (~0.7 us/
  * row here — child.eval boxing, no whole-stage codegen), while the
  * composed path's primitive max stays fully codegen'd. With tiny
  * group counts the intermediate (source, bucket) rows the native path
  * saves were never the cost. So the BULK 100 TB register build should
  * use the composed codegen'd plan ([[graft.ops.Sketches.hllRegisters]]);
  * this aggregate is for high-cardinality groups, streaming state, and
  * SQL ergonomics — the engine lesson "stay inside codegen on the hot
  * path" applied to our own extension.
  */
case class HllRegsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  private val Buckets = 64  // = Sketches.HllBuckets (2^6 registers)
  private val RemBits = 42  // = Sketches.HllRemBits (48-bit hash - 6)
  private val MaxRho = RemBits + 1

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Buckets)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h >>> RemBits).toInt & (Buckets - 1)
      val w = h & ((1L << RemBits) - 1)
      // rho = MaxRho - bitlength(w); bitlength(w>0) = 64 - nlz(w)
      val rho =
        if (w == 0L) MaxRho
        else MaxRho - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < Buckets) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegsAgg =
    copy(child = newChild)

  override def prettyName: String = "hll_regs"
}

object HllRegsAgg {
  /** DataFrame-side helper: `df.groupBy(...).agg(hll_regs(col("h")))`. */
  def hll_regs(c: Column): Column =
    GraftShims.columnOf(
      HllRegsAgg(GraftShims.expressionOf(c)).toAggregateExpression())
}
