package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DebugMeta {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .appName("dbg").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("dbgmeta").toString
    Seq((1L, "x"), (2L, "y")).toDF("a", "v").write.parquet(d + "/p")
    import org.apache.spark.sql.types._
    val phys = StructType(Seq(StructField("a", LongType), StructField("b", LongType), StructField("v", StringType)))
    val raw = spark.read.schema(phys).parquet(d + "/p")
    val proj = raw.select(coalesce(col("a"), col("b")).as("b"), col("v"))
    try {
      val r = proj.select(col("*"), col("_metadata.file_name").as("f")).collect()
      println("META_OK " + r.length)
    } catch { case e: Exception => println("META_FAIL " + e.getMessage.take(200)) }
    spark.stop()
  }
}
