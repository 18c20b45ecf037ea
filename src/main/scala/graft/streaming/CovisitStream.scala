package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming co-visitation — the item-item recommender index maintained
  * incrementally: per-user state accumulates visit counts per item
  * (bounded by the item catalog, the same bound the batch groupBy
  * carries per user), each micro-batch re-emits the user's updated
  * counts, and once the stream drains the converged per-(user, item)
  * counts run through EXACTLY the batch cap → pair → top-k tail
  * ([[graft.ops.GraphOps.covisitFromCounts]]) — so the streaming index
  * hash-checks against the SAME DuckDB oracle as `graph_covisit`, and
  * the fold is arrival-order independent by construction (counts are
  * commutative).
  */
object CovisitStream {

  final case class CvEv(user_id: Long, item: Long)
  final case class CvState(counts: Map[Long, Long])
  final case class CvOut(user_id: Long, item: Long, n_visits: Long,
    n_total: Long)

  private[graft] def counts(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val fn: (Long, Iterator[CvEv], GroupState[CvState]) => Iterator[CvOut] =
      (user, evs, state) => {
        var c = state.getOption.map(_.counts).getOrElse(Map.empty[Long, Long])
        evs.foreach(e => c = c.updated(e.item, c.getOrElse(e.item, 0L) + 1L))
        state.update(CvState(c))
        val total = c.valuesIterator.sum
        c.iterator.map { case (item, n) => CvOut(user, item, n, total) }
      }
    events
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .filter(col("item").isNotNull)
      .as[CvEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
      .toDF()
  }

  /** Last emission per (user, item) — the one carrying the final count —
    * then the batch tail verbatim.
    */
  private[graft] def finalizeIndex(sink: DataFrame): DataFrame =
    graft.ops.GraphOps.covisitFromCounts(
      sink.groupBy("user_id", "item")
        .agg(max(struct(col("n_total"), col("n_visits"))).as("last"))
        .select(col("user_id"), col("item"),
          col("last.n_visits").as("n_visits")))

  def covisitStream(s: SparkSession, dir: String): DataFrame = {
    val out = finalizeIndex(
      EventStreams.runToMemorySink(s,
        counts(EventStreams.eventStream(s, dir)),
        OutputMode.Update))
    out.localCheckpoint(eager = true)
  }
}
