package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: one line of physical-plan features per registered
  * query (join strategies, exchange count, codegen spans) so plan
  * regressions stand out. Not part of the driver contract.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val skipExec = Set("stream_") // streaming queries execute on registration
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        if (!skipExec.exists(name.startsWith)) df.write.format("noop").mode("overwrite").save()
        val p = df.queryExecution.executedPlan.toString
        def n(s: String) = p.sliding(s.length).count(_ == s)
        val smj = n("SortMergeJoin")
        val bnl = n("BroadcastNestedLoopJoin")
        val cart = n("CartesianProduct")
        val exch = n("Exchange") - n("BroadcastExchange")
        val bhj = n("BroadcastHashJoin")
        println(f"$name%-28s smj=$smj bnlj=$bnl cart=$cart shuffle=$exch bhj=$bhj")
      } catch { case e: Throwable =>
        println(f"$name%-28s ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
