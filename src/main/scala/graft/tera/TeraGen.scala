package graft.tera

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Deterministic sort-benchmark record generator.
  *
  * Record layout per reference `apps/terasort/TeraGen.scala:136-178` /
  * `TeraInputFormat.h:83-85`: 10-byte key from the high bytes of the LCG
  * state, 2-byte break, 32 ASCII-hex digits of the record number, 4-byte
  * break, 48 filler bytes (12 low hex digits of the state, each x4),
  * 4-byte break. Record `r` uses LCG state X_{r+1}.
  *
  * Scale design: generation is embarrassingly parallel — `spark.range`
  * hands each task a contiguous id span, the task does ONE O(log n)
  * `skipAhead` to its first id and then streams sequentially. No shuffle,
  * no driver data, any partition count. 100 TB = 10^12 records is just
  * `numPartitions` sized appropriately.
  */
object TeraGen {
  val KeyLen = 10
  val ValueLen = 90
  val RecordLen = 100

  /** Fill a 100-byte record for `recordNumber` from LCG state `rand`. */
  def fillRecord(buf: Array[Byte], rand: U128, recordNumber: U128): Unit = {
    var i = 0
    while (i < 10) { buf(i) = rand.byteAt(i); i += 1 }
    buf(10) = 0x00
    buf(11) = 0x11
    i = 0
    while (i < 32) { buf(12 + i) = recordNumber.hexDigitAt(i).toByte; i += 1 }
    buf(44) = 0x88.toByte
    buf(45) = 0x99.toByte
    buf(46) = 0xaa.toByte
    buf(47) = 0xbb.toByte
    i = 0
    while (i < 12) {
      val v = rand.hexDigitAt(20 + i).toByte
      val base = 48 + i * 4
      buf(base) = v; buf(base + 1) = v; buf(base + 2) = v; buf(base + 3) = v
      i += 1
    }
    buf(96) = 0xcc.toByte
    buf(97) = 0xdd.toByte
    buf(98) = 0xee.toByte
    buf(99) = 0xff.toByte
  }

  /** Generate records [0, numRecords) as a typed Dataset of (key, value).
    *
    * Handles non-contiguous id runs gracefully (re-seeds on a gap), so it
    * stays correct under any upstream repartitioning of the id range.
    */
  def records(spark: SparkSession, numRecords: Long, numPartitions: Int)
      : Dataset[(Array[Byte], Array[Byte])] = {
    import spark.implicits._
    spark.range(0L, numRecords, 1L, numPartitions).mapPartitions { ids =>
      val buf = new Array[Byte](RecordLen)
      var state = U128.Zero
      var nextId = -1L
      ids.map { id =>
        if (id != nextId) state = TeraRandom.skipAhead(id)
        state = TeraRandom.next(state)
        nextId = id + 1
        fillRecord(buf, state, U128(id))
        (java.util.Arrays.copyOfRange(buf, 0, KeyLen),
          java.util.Arrays.copyOfRange(buf, KeyLen, RecordLen))
      }
    }.toDF("key", "value").as[(Array[Byte], Array[Byte])]
  }

  /** DataFrame flavor with named binary columns. */
  def dataframe(spark: SparkSession, numRecords: Long, numPartitions: Int): DataFrame =
    records(spark, numRecords, numPartitions).toDF("key", "value")
}
