package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Diagnostic main + reusable plan-shape extractor: one line of
  * physical-plan features per registered query (join strategies,
  * exchange count) so plan regressions stand out. The extractor also
  * backs `PlanShapeLockSpec`, which pins the shapes of the most
  * expensive queries — a deliberate plan change must edit the lock,
  * an accidental one fails CI instead of surfacing as a bench drift
  * two rounds later. Not part of the driver contract.
  */
object PlanAudit {

  /** Join/shuffle counts string-mined from the executed plan. `shuffle`
    * excludes broadcast exchanges (those are the cheap kind the lock
    * WANTS queries to drift toward, never away from silently).
    */
  final case class PlanShape(
      smj: Int, bhj: Int, bnlj: Int, cartesian: Int, shuffle: Int) {
    override def toString: String =
      s"smj=$smj bhj=$bhj bnlj=$bnlj cart=$cartesian shuffle=$shuffle"
  }

  /** Execute the frame (noop sink — full pipeline, nothing collected)
    * and extract its FINAL plan shape; under AQE the executed plan only
    * settles after the run, so shape-reading without executing would
    * record the initial guess, not the plan users pay for.
    */
  def executedShape(df: DataFrame): PlanShape = {
    df.write.format("noop").mode("overwrite").save()
    shapeOf(df.queryExecution.executedPlan.toString)
  }

  /** Plan shape WITHOUT executing: deterministic for fixed
    * code+fixtures+conf, which execution-time shapes are NOT — running
    * the frame materializes cached subtrees whose AdaptiveSparkPlan
    * sections finalize in the background, so an executed dump races
    * that finalization and string-mined counts flap by a few Exchanges
    * on iterative cache-heavy queries. The change-detecting LOCK uses
    * this; the human-facing audit main keeps [[executedShape]] (the
    * plan users actually pay for, AQE promotions included).
    */
  def staticShape(df: DataFrame): PlanShape =
    shapeOf(df.queryExecution.executedPlan.toString)

  def shapeOf(plan: String): PlanShape = {
    def n(s: String) = plan.sliding(s.length).count(_ == s)
    PlanShape(
      smj = n("SortMergeJoin"),
      bhj = n("BroadcastHashJoin"),
      bnlj = n("BroadcastNestedLoopJoin"),
      cartesian = n("CartesianProduct"),
      shuffle = n("Exchange") - n("BroadcastExchange"))
  }

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
        val shape =
          if (skipExec.exists(name.startsWith))
            shapeOf(df.queryExecution.executedPlan.toString)
          else executedShape(df)
        println(f"$name%-28s $shape")
      } catch { case e: Throwable =>
        println(f"$name%-28s ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
