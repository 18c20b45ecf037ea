package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.EventStreams

/** Structured Streaming registrations. Each runs a real streaming query
  * synchronously over the events parquet (memory sink) and returns the
  * drained result, so the DuckDB batch oracle checks true
  * stream/batch-equivalence of the window and state semantics.
  */
object StreamQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_events_hourly" -> (EventStreams.hourlyWindowed _),
    "stream_user_totals" -> (EventStreams.userTotals _)
  )

  val oracles: Map[String, String] = Map(
    "stream_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "stream_user_totals" ->
      """SELECT user_id, count(*) AS n_events,
        |  round(sum(value), 2) AS sum_value
        |FROM events GROUP BY user_id""".stripMargin
  )
}
