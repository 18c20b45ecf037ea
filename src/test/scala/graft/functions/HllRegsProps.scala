package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property checks of the native HLL register aggregate against a plain
  * Scala reference model, exercising update/merge directly (no Spark
  * session): registers must equal the model for any input multiset, be
  * insensitive to input order, and merge must equal concatenation.
  */
object HllRegsProps extends Properties("HllRegsAgg") {

  private val Buckets = graft.ops.Sketches.HllBuckets
  private val RemBits = graft.ops.Sketches.HllRemBits
  private val MaxRho = RemBits + 1

  /** Reference model: max rho per bucket over 48-bit hashes. */
  private def model(hs: Seq[Long]): Seq[Int] = {
    val reg = Array.fill(Buckets)(0)
    hs.foreach { h =>
      val b = (h >>> RemBits).toInt & (Buckets - 1)
      val w = h & ((1L << RemBits) - 1)
      val rho =
        if (w == 0L) MaxRho
        else MaxRho - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > reg(b)) reg(b) = rho
    }
    reg.toSeq
  }

  private def agg = HllRegsAgg(BoundReference(0, LongType, nullable = false))

  private def run(hs: Seq[Long]): Seq[Int] = {
    val a = agg
    val buf = hs.foldLeft(a.createAggregationBuffer()) { (b, h) =>
      a.update(b, InternalRow(h))
    }
    a.eval(buf)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray().toSeq
  }

  // 48-bit hashes — the h48 domain the aggregate is specified over
  private val genH = Gen.choose(0L, (1L << 48) - 1)
  private val genHs = Gen.listOf(genH)

  property("registers equal the reference model") = forAll(genHs) { hs =>
    run(hs) == model(hs)
  }

  property("input order is irrelevant") = forAll(genHs) { hs =>
    run(hs) == run(hs.reverse)
  }

  property("merge equals concatenation") = forAll(genHs, genHs) { (xs, ys) =>
    val a = agg
    def fill(hs: Seq[Long]) = hs.foldLeft(a.createAggregationBuffer()) {
      (b, h) => a.update(b, InternalRow(h))
    }
    val merged = a.merge(fill(xs), fill(ys))
    a.eval(merged)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray().toSeq == model(xs ++ ys)
  }

  property("serialize/deserialize round-trips the buffer") = forAll(genHs) {
    hs =>
      val a = agg
      val buf = hs.foldLeft(a.createAggregationBuffer()) { (b, h) =>
        a.update(b, InternalRow(h))
      }
      a.deserialize(a.serialize(buf)).toSeq == buf.toSeq
  }
}
