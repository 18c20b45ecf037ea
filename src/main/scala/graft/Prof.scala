package graft
import org.apache.spark.sql.SparkSession
object Prof { def main(a: Array[String]): Unit = {
  val s = SparkSession.builder().master("local[16]")
    .config("spark.sql.shuffle.partitions","16")
    .config("spark.sql.adaptive.enabled","true")
    .config("spark.ui.enabled","false").getOrCreate()
  s.sparkContext.setLogLevel("ERROR")
  val dir = "/root/testdata/sf0.1"
  def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"$name%-22s ${(System.nanoTime()-t0)/1e9}%7.2f s  rows=$n")
  }
  val docs = Tables.documents(s, dir)
  time("docs count")(docs.count())
  val sh = ops.Dedup.shingles(docs).cache()
  time("shingles")(sh.count())
  val sig = ops.Dedup.minhashSignatures(sh)
  time("signatures")(sig.count())
  time("full minhash")(ops.Dedup.minhashLsh(s, dir).count())
  time("full minhash again")(ops.Dedup.minhashLsh(s, dir).count())
  s.stop()
}}
