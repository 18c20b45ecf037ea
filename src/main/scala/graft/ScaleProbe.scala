package graft
import org.apache.spark.sql.SparkSession
import graft.tera._
object ScaleProbe { def main(a: Array[String]): Unit = {
  val s = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions","64")
    .config("spark.serializer","org.apache.spark.serializer.KryoSerializer")
    .config("spark.ui.enabled","false").getOrCreate()
  s.sparkContext.setLogLevel("ERROR")
  val n = sys.env.getOrElse("SCALE_N", "10000000").toLong
  var t0 = System.nanoTime()
  val gen = TeraGen.records(s, n, sys.env.getOrElse("SCALE_P","64").toInt).rdd
  val genSum = TeraValidate.checksum(gen)
  val tGen = (System.nanoTime()-t0)/1e9
  t0 = System.nanoTime()
  val sorted = TeraSort.sortRdd(TeraGen.records(s, n, sys.env.getOrElse("SCALE_P","64").toInt).rdd, sys.env.getOrElse("SCALE_P","64").toInt)
  val res = TeraValidate.validate(sorted)
  val tSortVal = (System.nanoTime()-t0)/1e9
  println(f"teragen+checksum: $tGen%.1f s; sort+validate: $tSortVal%.1f s")
  println(s"records=${res.records} ok=${res.ok} checksumMatch=${res.checksumHex == genSum}")
  val hsph = (n * 100.0 / 1e10) / ((tGen + tSortVal) / 3600.0)
  println(f"HSph@0.1GB-SF proxy: $hsph%.1f")
  s.stop()
}}
