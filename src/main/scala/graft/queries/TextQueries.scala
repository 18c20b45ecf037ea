package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.apps.WordCount

/** Text-shaped queries over the documents table. */
object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wordcount" -> (WordCount.documentsWordCount _),
    "wordcount_mr" -> (WordCount.documentsWordCountMR _)
  )

  private val wcOracle =
    """SELECT w AS word, count(*) AS cnt
      |FROM documents, unnest(string_split_regex(upper(text), '[^A-Z]+')) AS t(w)
      |WHERE length(w) >= 6
      |GROUP BY w""".stripMargin

  val oracles: Map[String, String] = Map(
    "wordcount" -> wcOracle,
    "wordcount_mr" -> wcOracle
  )
}
