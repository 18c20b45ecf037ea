package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{OpUtil, Sketches}

/** Native HLL register aggregate: bit-identical to the SQL-composed
  * register path, correct through the partial/merge path, and reachable
  * from SQL via the session extension.
  */
class HllRegsAggSpec extends SparkSpec {

  private def toks = OpUtil.spread(graft.Tables.documents(spark, sfDir))
    .select(col("source"), explode(split(col("text"), " ", -1)).as("tok"))
    .filter(length(col("tok")) > 0)

  test("native registers equal the composed groupBy(bucket).max registers") {
    // composed path: one row per touched (source, bucket)
    val composed = Sketches.hllRegisters(toks)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    // native path: 64-slot array per source, exploded to touched rows —
    // forced through partial aggregation by a pre-shuffle repartition
    val native = toks
      .select(col("source"), Sketches.h48(col("tok")).as("h"))
      .repartition(7, col("h"))
      .groupBy("source").agg(HllRegsAgg.hll_regs(col("h")).as("reg"))
      .select(col("source"), posexplode(col("reg")).as(Seq("bucket", "r")))
      .filter(col("r") > 0)
      .collect().map(r => (r.getString(0), r.getInt(1).toLong) -> r.getInt(2))
      .toMap
    assert(native == composed)
  }

  test("hll_regs is callable from SQL through the extension") {
    toks.select(col("source"), Sketches.h48(col("tok")).as("h"))
      .createOrReplaceTempView("hll_toks")
    val viaSql = spark.sql(
      "SELECT source, hll_regs(h) AS reg FROM hll_toks GROUP BY source")
    assert(viaSql.schema("reg").dataType.typeName == "array")
    assert(viaSql.count() > 0)
  }

  test("streaming state carries the sketch buffer across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val data = toks.select(col("source"), Sketches.h48(col("tok")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val (first, second) = data.splitAt(data.length / 2)
    val mem = MemoryStream[(String, Long)]
    val q = mem.toDF().toDF("source", "h")
      .groupBy("source").agg(HllRegsAgg.hll_regs(col("h")).as("reg"))
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("hll_native_sink").start()
    try {
      mem.addData(first.toSeq: _*); q.processAllAvailable()
      mem.addData(second.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("hll_native_sink")
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    val batch = toks.select(col("source"), Sketches.h48(col("tok")).as("h"))
      .groupBy("source").agg(HllRegsAgg.hll_regs(col("h")).as("reg"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(streamed == batch)
  }

  test("update handles nulls and the all-zero remainder") {
    import spark.implicits._
    // h = bucket 63, remainder 0 → rho must be MaxRho = 43
    val top = (63L << 42)
    val regs = Seq(Some(top), None, Some(1L))
      .toDF("h")
      .agg(HllRegsAgg.hll_regs(col("h")).as("reg"))
      .collect()(0).getSeq[Int](0)
    assert(regs(63) == 43)   // zero remainder saturates rho
    assert(regs(0) == 42)    // h=1: bitlength 1 → rho = 43 - 1
    assert(regs.count(_ > 0) == 2)
  }
}
