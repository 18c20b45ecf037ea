package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming right-to-be-forgotten audit — the continuous twin of
  * [[graft.ops.Warehouse.forget]]: events arrive as a stream, per-user
  * state tracks the cumulative per-type counts plus the latest event
  * (by (ts, event_id), so the fold is ARRIVAL-ORDER independent), and
  * each emission re-derives whether the user is in the deletion set
  * (latest event is an 'error'). Once the stream drains, the converged
  * per-user rows aggregate to exactly the batch audit — checked against
  * the SAME DuckDB oracle.
  *
  * State is O(users x event types seen), the same bound the batch
  * latest-per-user aggregation carries per partition; on a cluster it
  * shards by user across executors.
  */
object ForgetStream {

  final case class FEv(event_id: Long, ts: java.sql.Timestamp,
    user_id: Long, event_type: String)
  final case class FState(counts: Map[String, Long],
    bestTs: Long, bestId: Long, bestType: String)
  final case class FOut(user_id: Long, event_type: String,
    type_count: Long, n_events: Long, forgotten: Boolean)

  private[graft] def audit(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val fn: (Long, Iterator[FEv], GroupState[FState]) => Iterator[FOut] =
      (user, evs, state) => {
        var st = state.getOption.getOrElse(
          FState(Map.empty, Long.MinValue, Long.MinValue, null))
        evs.foreach { e =>
          val c = st.counts.getOrElse(e.event_type, 0L) + 1L
          // full microsecond precision (getTime alone truncates to ms,
          // which could flip the latest-event tiebreak vs the batch max)
          val tsMicros =
            math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
          val newer = tsMicros > st.bestTs ||
            (tsMicros == st.bestTs && e.event_id > st.bestId)
          st = FState(st.counts.updated(e.event_type, c),
            if (newer) tsMicros else st.bestTs,
            if (newer) e.event_id else st.bestId,
            if (newer) e.event_type else st.bestType)
        }
        state.update(st)
        val total = st.counts.valuesIterator.sum
        val forgotten = st.bestType == "error"
        st.counts.iterator.map { case (t, c) =>
          FOut(user, t, c, total, forgotten)
        }
      }
    events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .as[FEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
      .toDF()
  }

  /** The last emission per (user, type) — the one with the full event
    * count — carries the converged flag and counts; fold those into the
    * batch audit's exact schema.
    */
  private[graft] def finalizeAudit(sink: DataFrame): DataFrame =
    sink.groupBy("user_id", "event_type")
      .agg(max(struct(col("n_events"), col("forgotten"), col("type_count")))
        .as("last"))
      .select(col("user_id"), col("event_type"),
        col("last.forgotten").as("forgotten"),
        col("last.type_count").as("type_count"))
      .groupBy("event_type")
      .agg(
        coalesce(sum(when(!col("forgotten"), col("type_count"))), lit(0L))
          .as("kept_events"),
        coalesce(sum(when(col("forgotten"), col("type_count"))), lit(0L))
          .as("purged_events"),
        countDistinct(when(col("forgotten"), col("user_id")))
          .as("purged_users"))

  def forgetStream(s: SparkSession, dir: String): DataFrame = {
    val out = finalizeAudit(
      EventStreams.runToMemorySink(s,
        audit(EventStreams.eventStream(s, dir)),
        OutputMode.Update))
    out.localCheckpoint(eager = true)
  }
}
