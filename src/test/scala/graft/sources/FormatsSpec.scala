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
}
