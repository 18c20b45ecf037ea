package graft

import org.apache.spark.sql.SparkSession

import graft.tera._

/** Scale probe for the sort pipeline. Env knobs:
  *  - SCALE_N: records (default 10M = 1 GB)
  *  - SCALE_P: partitions (default 64)
  *  - SCALE_FILES=1: run the reference's file-to-file protocol
  *    (gen → raw 100-byte files → read → sort → files → read → validate,
  *    per reference apps/terasort/run.sh) instead of the in-memory path
  *  - SPARK_DRIVER_MEM: heap (spill behavior shows up when the shuffle
  *    exceeds it)
  */
object ScaleProbe {
  def main(a: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val n = sys.env.getOrElse("SCALE_N", "10000000").toLong
    val p = sys.env.getOrElse("SCALE_P", "64").toInt
    val useFiles = sys.env.get("SCALE_FILES").contains("1")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-18s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }

    if (useFiles) {
      val base = java.nio.file.Files.createTempDirectory("teraprobe").toString
      try {
        timed("gen->files") {
          TeraIO.write(TeraGen.records(s, n, p).rdd, s"$base/input")
        }
        val genSum = timed("checksum(in)") {
          TeraValidate.checksum(TeraIO.read(s, s"$base/input"))
        }
        timed("sort->files") {
          TeraIO.write(TeraSort.sortRdd(TeraIO.read(s, s"$base/input"), p), s"$base/output")
        }
        val res = timed("validate(out)") {
          TeraValidate.validate(TeraIO.read(s, s"$base/output"))
        }
        println(s"records=${res.records} ok=${res.ok} " +
          s"checksumMatch=${res.checksumHex == genSum}")
      } finally {
        TeraIO.delete(s, base)
      }
    } else {
      var t0 = System.nanoTime()
      val genSum = TeraValidate.checksum(TeraGen.records(s, n, p).rdd)
      val tGen = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val res = TeraValidate.validate(
        TeraSort.sortRdd(TeraGen.records(s, n, p).rdd, p))
      val tSortVal = (System.nanoTime() - t0) / 1e9
      println(f"teragen+checksum: $tGen%.1f s; sort+validate: $tSortVal%.1f s")
      println(s"records=${res.records} ok=${res.ok} " +
        s"checksumMatch=${res.checksumHex == genSum}")
      val hsph = (n * 100.0 / 1e10) / ((tGen + tSortVal) / 3600.0)
      println(f"HSph@SF proxy: $hsph%.1f")
    }
    s.stop()
  }
}
