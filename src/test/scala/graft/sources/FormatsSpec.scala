package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CSV / JSON / text round-trips over engine tables — the commodity
  * source formats a migrating user brings data in with. Parquet is the
  * engine's native format; these prove the scan layer is
  * format-agnostic.
  */
class FormatsSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-fmt").toString

  test("csv round-trip preserves rows and schema under an explicit schema") {
    val dir = tmp()
    try {
      val nation = graft.Tables.nation(spark, sfDir)
      nation.write.option("header", "true").mode("overwrite").csv(dir)
      val back = spark.read.option("header", "true")
        .schema(nation.schema).csv(dir)
      assert(back.count() == nation.count())
      assert(back.schema == nation.schema)
      val a = nation.orderBy("n_nationkey").collect().map(_.toSeq)
      val b = back.orderBy("n_nationkey").collect().map(_.toSeq)
      assert(a.sameElements(b))
    } finally graft.tera.TeraIO.delete(spark, dir)
  }

  test("json lines round-trip preserves values") {
    val dir = tmp()
    try {
      val region = graft.Tables.region(spark, sfDir)
      region.write.mode("overwrite").json(dir)
      val back = spark.read.schema(region.schema).json(dir)
      assert(back.orderBy("r_regionkey").collect().map(_.toSeq).toSeq ==
        region.orderBy("r_regionkey").collect().map(_.toSeq).toSeq)
    } finally graft.tera.TeraIO.delete(spark, dir)
  }

  test("wordcount runs identically over a text-file source") {
    val dir = tmp()
    try {
      graft.Tables.documents(spark, sfDir).select(col("text"))
        .write.mode("overwrite").text(dir)
      val fromText = graft.apps.WordCount
        .countWords(spark.read.textFile(dir).toDF("text"), "text")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val fromTable = graft.apps.WordCount
        .countWords(graft.Tables.documents(spark, sfDir), "text")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(fromText == fromTable)
      assert(fromText.nonEmpty)
    } finally graft.tera.TeraIO.delete(spark, dir)
  }

  test("malformed csv rows degrade to nulls or drop, never task failures") {
    val dir = tmp()
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "part-0.csv"),
        ("1,alpha,10.5\n" +
          "not_a_long,beta,2.5\n" +    // bad long
          "3,gamma,not_a_double\n" +   // bad double
          "4,delta,4.25\n").getBytes("UTF-8"))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType)))
      // PERMISSIVE (default): malformed cells null out, rows survive
      val permissive = spark.read.schema(schema).csv(dir).collect()
      assert(permissive.length == 4)
      assert(permissive.count(r => r.isNullAt(0)) == 1)
      assert(permissive.count(r => r.isNullAt(2)) == 1)
      // DROPMALFORMED: bad rows vanish, good rows keep exact values
      val dropped = spark.read.schema(schema)
        .option("mode", "DROPMALFORMED").csv(dir)
        .collect().map(r => r.getLong(0)).sorted.toSeq
      assert(dropped == Seq(1L, 4L))
    } finally graft.tera.TeraIO.delete(spark, dir)
  }
}
