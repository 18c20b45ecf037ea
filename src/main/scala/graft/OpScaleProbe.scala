package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, GraphOps, PipelineOps}

/** Scale probe for the non-sort operator families whose 100 TB claims
  * rest on plan shape: pipe_pack (two-pass sharded prefix sum),
  * graph_pagerank (de-broadcast src-partitioned iteration), and the
  * dedup prefix-join / connected-components path. Times each at 1x,
  * 10x, 100x of the sf0.1 tables (~sf0.1 / sf1 / sf10 equivalents) and
  * prints the curve — linear-ish growth backs the designs, superlinear
  * blowup flags a fix.
  *
  * Inputs scale by unioning SHIFTED copies of the real tables, keeping
  * every distribution while growing structure:
  *  - documents: remapped doc_ids; copy i > 0 rewrites each token with a
  *    copy prefix, so within-copy near-dup structure is preserved
  *    exactly but copies of the same doc share NO shingles (naive text
  *    duplication would plant k-cliques of near-dups and quadratically
  *    inflate the dedup OUTPUT, measuring the wrong thing).
  *  - events: remapped user/event ids AND item ids (rewritten through
  *    the props JSON), so the transition graph grows to k x nodes and
  *    k x edges — structural growth, not just edge-weight inflation.
  *
  * Env knobs: SPARK_GRAFT_SF_DIR (default sf0.1), SCALE_MULTS (default
  * "1,10,100").
  */
object OpScaleProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-op-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mults = sys.env.getOrElse("SCALE_MULTS", "1,10,100")
      .split(",").map(_.trim.toInt).toSeq

    val docsBase = Tables.documents(spark, sfDir)
    val evBase = Tables.events(spark, sfDir)
    // strides for disjoint id spaces per copy (one O(1) agg each)
    val docStride = docsBase.agg(max(col("doc_id"))).head.getLong(0) + 1
    val evMax = evBase
      .agg(max(col("user_id")), max(col("event_id")),
        max(get_json_object(col("props"), "$.k").cast("long")))
      .head
    val userStride = evMax.getLong(0) + 1
    val eventStride = evMax.getLong(1) + 1
    val itemStride = evMax.getLong(2) + 1

    def scaledDocs(k: Int): DataFrame =
      (0 until k).map { i =>
        if (i == 0) docsBase
        else docsBase.select(
          (col("doc_id") + lit(i * docStride)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"c${i}_$$1").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)

    def scaledEvents(k: Int): DataFrame =
      (0 until k).map { i =>
        if (i == 0) evBase
        else evBase.select(
          (col("event_id") + lit(i * eventStride)).as("event_id"),
          col("ts"),
          (col("user_id") + lit(i * userStride)).as("user_id"),
          col("event_type"), col("value"),
          when(get_json_object(col("props"), "$.k").isNotNull,
            concat(lit("{\"k\": "),
              (get_json_object(col("props"), "$.k").cast("long") +
                lit(i * itemStride)).cast("string"), lit("}")))
            .otherwise(col("props")).as("props"))
      }.reduce(_ unionByName _)

    def timed(name: String)(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      println(f"$name%-20s $dt%8.1f s")
      dt
    }

    // warm scans + JIT once so the 1x numbers aren't first-touch costs
    docsBase.write.format("noop").mode("overwrite").save()
    evBase.write.format("noop").mode("overwrite").save()

    mults.foreach { k =>
      println(s"== x$k (docs=${5000L * k}-ish, events=${100000L * k}-ish) ==")
      timed(s"pipe_pack x$k") {
        PipelineOps.packSequences(scaledDocs(k), PipelineOps.PackBudget)
      }
      timed(s"graph_pagerank x$k") { GraphOps.pagerank(scaledEvents(k)) }
      timed(s"dedup_prefix x$k") { Dedup.prefixJaccardDocs(scaledDocs(k)) }
      timed(s"dedup_clusters x$k") {
        Dedup.clustersFromPairs(spark, Dedup.prefixJaccardDocs(scaledDocs(k)))
      }
    }
    spark.stop()
  }
}
