package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Cross-micro-batch state: the oracle gate drains the events file in one
  * batch, so this spec is what proves the `mapGroupsWithState` totals
  * genuinely accumulate across batches — two source files, one file per
  * trigger, state carried between triggers.
  */
class StreamingStateSpec extends SparkSpec {

  test("user totals accumulate across micro-batches (state survives triggers)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    try {
      val events = graft.Tables.events(spark, sfDir)
        .select("event_id", "user_id", "value")
      // two disjoint halves as separate files => two triggers
      events.filter(col("event_id") % 2 === 0)
        .coalesce(1).write.parquet(s"$dir/half0")
      events.filter(col("event_id") % 2 === 1)
        .coalesce(1).write.parquet(s"$dir/half1")
      val files = new java.io.File(dir).listFiles().flatMap(_.listFiles())
        .filter(_.getName.endsWith(".parquet"))
      val src = s"$dir/src"
      new java.io.File(src).mkdirs()
      files.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(s"$src/part$i.parquet"))
      }

      val schema = StructType(Seq(
        StructField("event_id", LongType),
        StructField("user_id", LongType),
        StructField("value", DoubleType)))
      val stream = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
      val sink = EventStreams.runToMemorySink(
        spark, EventStreams.userTotalsStats(stream), OutputMode.Update)
      // at least one user must have been emitted in BOTH batches, or the
      // test isn't exercising cross-batch state at all
      val emissions = sink.groupBy("user_id").count()
        .filter(col("count") >= 2).count()
      assert(emissions > 0, "no user spanned two micro-batches")

      val streamed = EventStreams.finalizeUserTotals(sink)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val batch = events.groupBy("user_id")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(streamed == batch)
    } finally graft.tera.TeraIO.delete(spark, dir)
  }
}
