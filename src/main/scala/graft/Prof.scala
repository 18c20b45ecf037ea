package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: prints executed plans / stage timings for chosen queries. */
object Prof { def main(args: Array[String]): Unit = {
  val s = SparkSession.builder().master("local[16]")
    .config("spark.sql.shuffle.partitions","16")
    .config("spark.sql.adaptive.enabled","true")
    .config("spark.ui.enabled","false").getOrCreate()
  s.sparkContext.setLogLevel("ERROR")
  val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
  args.headOption match {
    case Some(q) if SparkEntry.queries.contains(q) =>
      val df = SparkEntry.queries(q)(s, dir)
      df.write.format("noop").mode("overwrite").save()
      println(df.queryExecution.executedPlan.toString)
    case _ => println("usage: Prof <queryName> [sfDir]")
  }
  s.stop()
}}
