package graft.core

import org.apache.spark.Partitioner

/** The reference's default shuffle hash — ELF hash over key bytes mod
  * partition count (`src/panda/Partitioner.cpp:7-18`). Spark's own
  * `HashPartitioner`/`hashpartitioning` supersede it; this exists for
  * bit-parity when a caller needs the reference's exact bucket layout.
  */
object ElfHash {
  def apply(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h << 4) + (bytes(i) & 0xffL)
      val g = h & 0xf0000000L
      if (g != 0L) h ^= g >>> 24
      h &= ~g
      i += 1
    }
    h
  }

  def apply(s: String): Long = apply(s.getBytes("UTF-8"))
}

final class ElfHashPartitioner(val numPartitions: Int) extends Partitioner {
  require(numPartitions > 0)
  override def getPartition(key: Any): Int = {
    val bytes = key match {
      case b: Array[Byte] => b
      case s: String => s.getBytes("UTF-8")
      case other => other.toString.getBytes("UTF-8")
    }
    (ElfHash(bytes) % numPartitions).toInt
  }
}
