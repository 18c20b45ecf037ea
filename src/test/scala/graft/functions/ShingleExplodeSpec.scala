package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ShingleExplode.shingle_explode

/** The custom Generator must be bit-equal to the typed-flatMap shingle
  * path on the full corpus and on every edge case, since it backs the
  * whole near-dup dedup family.
  */
class ShingleExplodeSpec extends SparkSpec {

  private def viaGenerator(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.select(col("doc_id"), shingle_explode(col("text"), k).as("shingle"))

  test("generator equals the flatMap shingles on the sf0.001 corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
    val gen = viaGenerator(docs, graft.ops.Dedup.ShingleSize)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val fm = graft.ops.Dedup.shinglesFlatMapK(docs, graft.ops.Dedup.ShingleSize)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(gen == fm && gen.nonEmpty)
  }

  test("edge cases: short docs, empty tokens, duplicates, multi-byte") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"), // 2 shingles of 5
      (2L, "a b c"), // shorter than k -> none
      (3L, ""), // empty text: split(" ",-1) gives one empty token
      (4L, "x  y z  w q"), // consecutive spaces -> empty tokens preserved
      (5L, "a b a b a b a b a b"), // duplicate shingles collapse per doc
      (6L, "é ü 漢 字 カ ナ"), // multi-byte UTF-8 around the byte scan
      (7L, "t " * 4 + "t") // trailing-space shapes
    ).toDF("doc_id", "text")
    val k = 5
    val gen = viaGenerator(docs, k)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val fm = graft.ops.Dedup.shinglesFlatMapK(docs, k)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(gen == fm, s"gen $gen vs flatMap $fm")
    // sanity on the planted expectations
    assert(gen.count(_._1 == 1L) == 2)
    assert(!gen.exists(_._1 == 2L))
    assert(gen.count(_._1 == 5L) == 2) // "a b a b a" and "b a b a b"
    assert(gen.count(_._1 == 6L) == 2)
  }

  test("SQL injection: explode_shingles parses and runs") {
    graft.Tables.documents(spark, sfDir).createOrReplaceTempView("docs_se")
    val n = spark.sql(
      s"SELECT doc_id, explode_shingles(text, ${graft.ops.Dedup.ShingleSize})" +
        " AS shingle FROM docs_se")
      .count()
    val m = graft.ops.Dedup.shingles(
      graft.Tables.documents(spark, sfDir)).count()
    assert(n == m)
  }

  test("null text emits nothing") {
    import spark.implicits._
    val docs = Seq((1L, null: String), (2L, "a b c d e f")).toDF("doc_id", "text")
    assert(viaGenerator(docs, 5).count() == 2)
  }
}
