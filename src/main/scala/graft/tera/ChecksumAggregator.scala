package graft.tera

import java.util.zip.CRC32

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The teravalidate checksum as a typed `Aggregator` (SURVEY.md §7.3):
  * 128-bit sum of CRC32(key), mergeable across partitions — the
  * `reduce`/`merge` split is exactly the reference's combiner/reduce
  * contract, surfaced through Spark's typed aggregation API so it
  * composes with `Dataset.select`/`groupByKey.agg`.
  */
class ChecksumAggregator extends Aggregator[Array[Byte], (Long, Long), String] {

  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), key: Array[Byte]): (Long, Long) = {
    val crc = new CRC32
    crc.update(key)
    val sum = U128(b._1, b._2) + U128(crc.getValue)
    (sum.hi, sum.lo)
  }

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) = {
    val sum = U128(a._1, a._2) + U128(b._1, b._2)
    (sum.hi, sum.lo)
  }

  override def finish(b: (Long, Long)): String = U128(b._1, b._2).toHex

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  override def outputEncoder: Encoder[String] = Encoders.STRING
}
