package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-9 layout evidence: what the bucketed layout buys a repeated
  * fact-fact join, measured. Compares the plain shuffle join (both
  * sides exchanged every run) against the bucketed-table join (bucket i
  * reads against bucket i, no exchange) at the bench scale, with
  * broadcast disabled so both plans are the cluster-shape SMJ. The
  * bucketed WRITE is timed separately — it is the once-per-layout cost
  * every subsequent join amortizes.
  *
  * Run: SPARK_GRAFT_SF_DIR=... runMain graft.LayoutProbe
  */
object LayoutProbe {
  import ProbeUtil.time

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val wh = java.nio.file.Files.createTempDirectory("graft_layout_wh").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def plainJoin() = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderpriority")
      .join(Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_extendedprice", "l_discount"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .collect()

    val buckets = 8
    val (_, tWrite) = time {
      Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("layout_orders_b")
      Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("layout_lineitem_b")
    }

    def bucketedJoin() = {
      val bo = spark.table("layout_orders_b")
      val bl = spark.table("layout_lineitem_b")
      bo.join(bl, bo("o_orderkey") === bl("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
        .collect()
    }

    // warm both paths, then median-of-3 each
    plainJoin(); bucketedJoin()
    val plain = (1 to 3).map(_ => time(plainJoin())._2).sorted.apply(1)
    val bucketed = (1 to 3).map(_ => time(bucketedJoin())._2).sorted.apply(1)
    println(f"""{"probe":"layout","sf_dir":"$dir","plain_join_s":$plain%.2f,""" +
      f""""bucketed_join_s":$bucketed%.2f,"bucket_write_s":$tWrite%.2f,""" +
      f""""speedup":${plain / bucketed}%.2f}""")
    spark.stop()
  }
}
