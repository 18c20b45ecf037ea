package graft.tera

import java.util.zip.CRC32

import org.apache.spark.rdd.RDD

/** Validation of a claimed total sort, per reference
  * `apps/terasort/TeraValidate.scala:64-123`:
  *  - keys non-decreasing within each partition (asserted distributed-side);
  *  - per-partition [min, max] ranges globally ordered (checked on the
  *    driver over ONE summary row per partition — O(partitions), never
  *    O(records), so it holds at 100 TB);
  *  - record count;
  *  - 128-bit sum of CRC32(key) — invariant under sorting, so the sorted
  *    checksum must equal the generated checksum.
  */
object TeraValidate {

  final case class PartSummary(
      partition: Int, records: Long, sumHi: Long, sumLo: Long,
      min: Array[Byte], max: Array[Byte], sorted: Boolean)

  final case class Result(
      records: Long, checksumHex: String, partitions: Int,
      partitionsSorted: Boolean, boundariesOrdered: Boolean) {
    def ok: Boolean = partitionsSorted && boundariesOrdered
  }

  def summarize(data: RDD[(Array[Byte], Array[Byte])]): Array[PartSummary] =
    data.mapPartitionsWithIndex { (pid, iter) =>
      val crc = new CRC32
      var sum = U128.Zero
      var count = 0L
      var min: Array[Byte] = null
      var prev: Array[Byte] = null
      var sorted = true
      while (iter.hasNext) {
        val key = iter.next()._1
        if (prev != null && java.util.Arrays.compareUnsigned(prev, key) > 0)
          sorted = false
        crc.reset()
        crc.update(key)
        sum = sum + U128(crc.getValue)
        if (count == 0L) min = key
        prev = key
        count += 1
      }
      if (count == 0L) Iterator.empty
      else Iterator(PartSummary(pid, count, sum.hi, sum.lo, min, prev, sorted))
    }.collect()

  def validate(data: RDD[(Array[Byte], Array[Byte])]): Result = {
    val parts = summarize(data).sortBy(_.partition)
    val total = parts.foldLeft(U128.Zero)((acc, p) => acc + U128(p.sumHi, p.sumLo))
    val boundariesOk = parts.iterator.sliding(2).withPartial(false).forall {
      case Seq(a, b) => java.util.Arrays.compareUnsigned(a.max, b.min) <= 0
    }
    Result(
      records = parts.map(_.records).sum,
      checksumHex = total.toHex,
      partitions = parts.length,
      partitionsSorted = parts.forall(_.sorted),
      boundariesOrdered = boundariesOk)
  }

  /** Order-independent checksum alone (for comparing pre- vs post-sort). */
  def checksum(data: RDD[(Array[Byte], Array[Byte])]): String = {
    val sums = data.mapPartitions { iter =>
      val crc = new CRC32
      var sum = U128.Zero
      iter.foreach { case (key, _) =>
        crc.reset(); crc.update(key); sum = sum + U128(crc.getValue)
      }
      Iterator((sum.hi, sum.lo))
    }.collect()
    sums.foldLeft(U128.Zero)((a, s) => a + U128(s._1, s._2)).toHex
  }
}
