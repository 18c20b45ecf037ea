package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BitmapDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("bitmap_distinct counts exactly across partitions (merge = wordwise OR)") {
    // ids straddle word boundaries (63/64/65) and repeat across the 8
    // input partitions, so both the update path and the serialized
    // merge path run
    val df = spark.range(0, 1000).repartition(8)
      .select((col("id") % 130).as("g"), (col("id") % 97).as("uid"))
      .groupBy(lit(1).as("k"))
      .agg(BitmapDistinctAgg.bitmap_distinct(col("uid"), 100).as("n"))
    assert(df.head().getLong(1) == 97L)
  }

  test("bitmap_distinct equals countDistinct per group on the fixture") {
    val ev = graft.Tables.events(spark, sfDir)
    val maxU = ev.agg(max(col("user_id"))).head().getLong(0)
    val native = graft.ops.Sketches.bitmapUsersOf(ev, maxU + 1)
      .as[(String, Long)].collect().toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(native == exact && native.nonEmpty)
  }

  test("bitmap_distinct is SQL-callable through the session extension") {
    graft.Tables.events(spark, sfDir).createOrReplaceTempView("ev_bd")
    val out = spark.sql(
      "SELECT bitmap_distinct(user_id, 100000) FROM ev_bd").head().getLong(0)
    val want = graft.Tables.events(spark, sfDir)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(out == want)
    spark.catalog.dropTempView("ev_bd")
  }

  test("bitmap_distinct throws loudly on an id outside the declared domain") {
    val ex = intercept[Exception] {
      Seq(1L, 5L).toDF("uid")
        .agg(BitmapDistinctAgg.bitmap_distinct(col("uid"), 4).as("n"))
        .collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(_.getMessage != null) &&
      chain(ex).exists(t => Option(t.getMessage)
        .exists(_.contains("outside the declared domain"))))
  }
}
