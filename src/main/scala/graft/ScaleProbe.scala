package graft
import org.apache.spark.sql.SparkSession
import graft.tera._
object ScaleProbe { def main(a: Array[String]): Unit = {
  val s = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions","64")
    .config("spark.serializer","org.apache.spark.serializer.KryoSerializer")
    .config("spark.ui.enabled","false").getOrCreate()
  s.sparkContext.setLogLevel("ERROR")
  val n = 10000000L // 1 GB of 100-byte records
  var t0 = System.nanoTime()
  val gen = TeraGen.records(s, n, 64).rdd
  val genSum = TeraValidate.checksum(gen)
  val tGen = (System.nanoTime()-t0)/1e9
  t0 = System.nanoTime()
  val sorted = TeraSort.sortRdd(TeraGen.records(s, n, 64).rdd, 64)
  val res = TeraValidate.validate(sorted)
  val tSortVal = (System.nanoTime()-t0)/1e9
  println(f"teragen+checksum: $tGen%.1f s; sort+validate: $tSortVal%.1f s")
  println(s"records=${res.records} ok=${res.ok} checksumMatch=${res.checksumHex == genSum}")
  val hsph = 1.0 / ((tGen + tSortVal) / 3600.0) * 0.1  // SF=1GB/10GB=0.1
  println(f"HSph@0.1GB-SF proxy: $hsph%.1f")
  s.stop()
}}
