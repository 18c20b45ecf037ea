package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Native EXACT distinct-count aggregate over a dense bounded id domain
  * — the classic production bitmap trick (dictionary-encoded user /
  * device / item ids OR into fixed-width bitsets; Druid, ClickHouse and
  * the Roaring family all ship a variant): per group the state is one
  * `Array[Long]` of `ceil(maxIds/64)` words, update sets a bit, merge
  * is wordwise OR, eval popcounts. Unlike HLL ([[HllRegsAgg]]) the
  * answer is EXACT — the trade is state linear in the DOMAIN instead of
  * constant: 8 KB per group at 64k ids, 12 MB at 100M — so this is the
  * right tool when ids are dense and bounded (post-dictionary) and the
  * group count is modest, and HLL is the right tool everywhere else.
  * Both ride the same extension point and the same streaming state
  * store.
  *
  * The domain bound is a REQUIRED literal and out-of-range ids THROW:
  * an exact aggregate that silently dropped ids would be a lie, and
  * clamping would alias distinct ids together. Nulls skip, matching
  * `count(DISTINCT x)`.
  */
case class BitmapDistinctAgg(
    child: Expression,
    maxIds: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(maxIds > 0, s"bitmap_distinct: domain must be positive, got $maxIds")
  private val Words = (maxIds + 63) >>> 6

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      if (id < 0L || id >= maxIds)
        throw new IllegalArgumentException(
          s"bitmap_distinct: id $id outside the declared domain [0, $maxIds)")
      buf((id >>> 6).toInt) |= 1L << (id & 63)
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Words) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < Words) { n += java.lang.Long.bitCount(buf(i)); i += 1 }
    n
  }

  // same defensive-copy stance as HllRegsAgg: never alias the mutable
  // buffer with serialized bytes
  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(Words * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](Words)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapDistinctAgg =
    copy(child = newChild)

  override def prettyName: String = "bitmap_distinct"
}

object BitmapDistinctAgg {
  /** DataFrame-side helper:
    * `df.groupBy(...).agg(bitmap_distinct(col("id"), maxIds))`.
    */
  def bitmap_distinct(c: Column, maxIds: Int): Column =
    GraftShims.columnOf(
      BitmapDistinctAgg(GraftShims.expressionOf(c), maxIds)
        .toAggregateExpression())
}
