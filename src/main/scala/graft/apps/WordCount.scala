package graft.apps

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.MapReduceJob

/** Wordcount — the reference's first application
  * (`apps/wordcount/wc_api.cu:35-59`): uppercase the text, words are
  * maximal `[A-Z]+` runs, keep words of >= 6 letters (the reference's
  * `ws > 6` counts the terminating delimiter byte, so the effective
  * threshold is 6 letters — see SURVEY.md §7.4.1; we implement the clean
  * semantics), count per word.
  *
  * Two equivalent implementations:
  *  - DataFrame: codegen'd builtins end-to-end
  *    (`explode(split(upper(...)))` → partial+final hash aggregate) —
  *    the plan Catalyst produces is exactly map → combine → shuffle →
  *    reduce;
  *  - the MapReduce-contract flavor on [[MapReduceJob]], proving the core
  *    builder reproduces the app.
  */
object WordCount {
  val MinLetters = 6

  /** DataFrame pipeline over any single string column. */
  def countWords(text: DataFrame, column: String): DataFrame =
    text
      .select(explode(split(upper(col(column)), "[^A-Z]+")).as("word"))
      .filter(length(col("word")) >= MinLetters)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** MapReduce-contract flavor: flatMap emit (word, 1) → combiner sums. */
  def countWordsMR(lines: RDD[String]): RDD[(String, Long)] =
    MapReduceJob(lines) { line =>
      line.toUpperCase.split("[^A-Z]+").iterator
        .filter(_.length >= MinLetters)
        .map(w => (w, 1L))
    }.withCombiner(_ + _)
      .reduceByKeyToRdd(_ + _)

  /** Typed-Dataset flavor. */
  def countWordsDs(lines: Dataset[String]): Dataset[(String, Long)] = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.flatMap(_.toUpperCase.split("[^A-Z]+"))
      .filter(_.length >= MinLetters)
      .groupByKey(identity)
      .count()
  }

  /** Driver-facing query: word counts over the documents table. */
  def documentsWordCount(s: SparkSession, dir: String): DataFrame =
    countWords(graft.Tables.documents(s, dir), "text")

  /** Same result produced through the MapReduce-contract path. */
  def documentsWordCountMR(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lines = graft.Tables.documents(s, dir)
      .select("text").as[String].rdd
    countWordsMR(lines).toDF("word", "cnt")
  }
}
