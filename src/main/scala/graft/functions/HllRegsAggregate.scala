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
  * groupBy(source, bucket).max + groupBy(source) plan — no intermediate
  * (source, bucket) shuffle, and the map side partial-aggregates a
  * whole partition's tokens into 64 bytes before anything moves. At
  * 100 TB that is the difference between shuffling O(sources x 64)
  * sketch rows and O(sources x touched-buckets) register rows.
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
