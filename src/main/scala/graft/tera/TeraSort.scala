package graft.tera

import org.apache.spark.Partitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Total order over 10-byte binary keys, unsigned lexicographic.
  *
  * Two equivalent paths (both validated):
  *  - RDD: explicit range partitioner on the 7-byte key prefix +
  *    sort-within-partition via `repartitionAndSortWithinPartitions` —
  *    ONE shuffle, per reference `apps/terasort/TeraSort.scala:60-63`.
  *  - DataFrame: `repartitionByRange + sortWithinPartitions` on the
  *    BinaryType key (Spark's binary ordering is already unsigned
  *    lexicographic); Catalyst samples range bounds, which adapts to skew
  *    that the static prefix partitioner cannot.
  *
  * Scale: the static partitioner needs no sampling pass and is O(1) per
  * record; uniform keys (teragen's are) spread evenly across any partition
  * count, so 100 TB just means more partitions, never more per-task state.
  */
object TeraSort {

  /** Unsigned lexicographic ordering for byte arrays (JDK intrinsic). */
  implicit val byteArrayOrdering: Ordering[Array[Byte]] =
    (a: Array[Byte], b: Array[Byte]) => java.util.Arrays.compareUnsigned(a, b)

  /** Range-partition on the first 7 key bytes, mapped evenly onto
    * `numPartitions` buckets (reference semantics:
    * `apps/terasort/TeraSortPartitioner.scala:28-44`). Deviation: the
    * bucket index is clamped to numPartitions-1 — the reference's integer
    * division can emit index == numPartitions for the top 1-2 prefixes of
    * the 2^56 space, which Spark would reject.
    */
  final class PrefixRangePartitioner(val numPartitions: Int) extends Partitioner {
    require(numPartitions > 0)
    private val prefixSpace = 1L << 56
    private val perBucket = prefixSpace / numPartitions +
      (if (prefixSpace % numPartitions == 0) 0 else 1)

    def prefixOf(key: Array[Byte]): Long = {
      var p = 0L
      var i = 0
      while (i < 7) { p = (p << 8) | (key(i) & 0xffL); i += 1 }
      p
    }

    override def getPartition(key: Any): Int = {
      val bucket = prefixOf(key.asInstanceOf[Array[Byte]]) / perBucket
      math.min(bucket.toInt, numPartitions - 1)
    }
  }

  /** RDD path: one shuffle, sorted within partitions, partitions globally
    * range-ordered.
    */
  def sortRdd(input: RDD[(Array[Byte], Array[Byte])], partitions: Int)
      : RDD[(Array[Byte], Array[Byte])] =
    input.repartitionAndSortWithinPartitions(new PrefixRangePartitioner(partitions))

  /** DataFrame path over (key binary, value binary). */
  def sortDf(input: DataFrame, partitions: Int): DataFrame =
    input.repartitionByRange(partitions, col("key")).sortWithinPartitions("key")

  /** End-to-end generate + sort, RDD path. */
  def generateAndSort(spark: SparkSession, numRecords: Long, partitions: Int)
      : RDD[(Array[Byte], Array[Byte])] =
    sortRdd(TeraGen.records(spark, numRecords, partitions).rdd, partitions)
}
