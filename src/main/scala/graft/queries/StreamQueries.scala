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
    "stream_user_totals" -> (EventStreams.userTotals _),
    "stream_sessions" -> (EventStreams.sessionize _),
    "stream_session_window" -> (EventStreams.sessionWindowStream _),
    "stream_wordcount" -> (EventStreams.wordcountStream _),
    "stream_dedup" -> (EventStreams.dedupExact _),
    "stream_dedup_minhash" -> (EventStreams.minhashDedupStream _),
    "stream_interval_join" -> (EventStreams.clickPurchaseJoin _),
    "stream_interval_left_join" -> (EventStreams.clickPurchaseLeftJoin _),
    "stream_kmv" -> (EventStreams.kmvDistinctStream _),
    "stream_hll" -> (EventStreams.hllDistinctStream _),
    "stream_hll_native" -> (EventStreams.hllDistinctStreamNative _),
    "stream_quantile" -> (EventStreams.quantileSketchStream _),
    "stream_gopher_rules" -> (EventStreams.gopherRulesStream _),
    "stream_cdc_apply" -> (graft.streaming.ChangelogStream.cdcApplyStream _),
    "stream_forget" -> (graft.streaming.ForgetStream.forgetStream _),
    "stream_covisit" -> (graft.streaming.CovisitStream.covisitStream _),
    "stream_topk" -> (EventStreams.topkStream _),
    "stream_snapshot_sink" -> (EventStreams.snapshotSinkStream _),
    "stream_snapshot_totable" -> (EventStreams.snapshotToTableStream _),
    "stream_snapshot_source" -> (EventStreams.snapshotSourceStream _),
    "stream_snapshot_readtable" -> (EventStreams.snapshotReadTableStream _),
    "stream_snapshot_cdf" -> (EventStreams.snapshotCdfStream _),
    "stream_ann_maintain" -> (EventStreams.annMaintainStream _),
    "stream_bm25_maintain" -> (EventStreams.bm25MaintainStream _)
  )

  val oracles: Map[String, String] = Map(
    "stream_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "stream_user_totals" ->
      """SELECT user_id, count(*) AS n_events,
        |  round(sum(value), 2) AS sum_value
        |FROM events GROUP BY user_id""".stripMargin,
    // same oracle as batch q19 — stream/batch session equivalence
    "stream_sessions" ->
      """WITH marked AS (
        |  SELECT user_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts))
        |SELECT user_id, sum(new_s)::BIGINT AS n_sessions,
        |  count(*) AS n_events
        |FROM marked GROUP BY user_id""".stripMargin,
    // the reference app's batch oracle verbatim — stream/batch
    // wordcount equivalence
    "stream_wordcount" -> graft.queries.TextQueries.oracles("wordcount"),
    // batch lag/cumsum sessionization with the engine's window bounds
    // (start = first event, end = last event + gap): the built-in
    // session_window state machine must agree session-for-session
    "stream_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0
        |    END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
        |    AS session_end,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM sess GROUP BY user_id, sid""".stripMargin,
    // batch equivalent of the watermarked stream-stream interval join
    "stream_interval_join" ->
      """SELECT c.event_id AS click_id, c.user_id,
        |  p.event_id AS purchase_id, round(p.value, 2) AS purchase_value
        |FROM events c JOIN events p
        |  ON c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND p.user_id = c.user_id
        |  AND p.ts >= c.ts - INTERVAL 2 HOUR AND p.ts < c.ts""".stripMargin,
    // batch LEFT JOIN over the same interval: the outer rows exist in
    // the stream result only because sentinel-driven watermark advance
    // evicted every real click's state before the final drain
    "stream_interval_left_join" ->
      """SELECT c.event_id AS click_id, c.user_id,
        |  p.event_id AS purchase_id, round(p.value, 2) AS purchase_value
        |FROM events c LEFT JOIN events p
        |  ON p.event_type = 'purchase'
        |  AND p.user_id = c.user_id
        |  AND p.ts >= c.ts - INTERVAL 2 HOUR AND p.ts < c.ts
        |WHERE c.event_type = 'click'""".stripMargin,
    // same oracle as batch sketch_kmv — stream/batch sketch equivalence
    "stream_kmv" -> graft.ops.Sketches.oracles("sketch_kmv"),
    // same oracle as batch sketch_hll — stream/batch register equivalence
    "stream_hll" -> graft.ops.Sketches.oracles("sketch_hll"),
    // native TypedImperativeAggregate under streaming state — registers
    // identical to every other HLL path, same oracle
    "stream_hll_native" -> graft.ops.Sketches.oracles("sketch_hll"),
    // same oracle as batch sketch_quantile — bucket-count equivalence
    "stream_quantile" -> graft.ops.Sketches.oracles("sketch_quantile"),
    // same oracle as batch text_gopher_rules — stateless gate equivalence
    "stream_gopher_rules" ->
      graft.queries.TextQueries.oracles("text_gopher_rules"),
    // same oracle as batch wh_cdc_apply — stream/batch MERGE equivalence
    "stream_cdc_apply" -> graft.ops.Warehouse.oracles("wh_cdc_apply"),
    // the streaming fold converges to the batch deletion audit verbatim
    "stream_forget" -> graft.ops.Warehouse.oracles("wh_forget"),
    // converged counts run the batch cap→pair→top-k tail verbatim
    "stream_covisit" -> graft.ops.GraphOps.oracles("graph_covisit"),
    // same oracle as batch dedup_minhash — the streamed signature store
    // feeds the identical LSH + exact-Jaccard finalization
    "stream_dedup_minhash" ->
      graft.queries.DedupQueries.oracles("dedup_minhash"),
    // same oracle as batch dedup_exact — arrival-order-independent keeper
    "stream_dedup" ->
      """SELECT min(doc_id) AS doc_id, md5(text) AS text_md5,
        |  count(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,
    // batch top-k per event_type — the bounded O(k)-state stream must
    // land exactly here regardless of batch boundaries
    "stream_topk" ->
      s"""WITH v AS (
         |  SELECT event_type, event_id,
         |    round(value * 100)::BIGINT AS value_fp
         |  FROM events),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY event_type
         |    ORDER BY value_fp DESC, event_id) AS rank FROM v)
         |SELECT event_type, rank, event_id, value_fp
         |FROM r WHERE rank <= ${graft.streaming.EventStreams.TopkK}""".stripMargin,
    // the snapshot-table ingest must hold the stream exactly once: the
    // final table aggregates to the source table's truth, and the
    // redelivered batch is a protocol-constant no-op
    "stream_snapshot_sink" ->
      """SELECT event_type, count(*)::BIGINT AS n,
        |  round(sum(value), 2) AS sum_value, 0::BIGINT AS replay_advanced
        |FROM events GROUP BY 1""".stripMargin,
    // writeStream.toTable must land the whole events table exactly
    // once; the checkpointed restart (no new data) commits nothing
    "stream_snapshot_totable" ->
      """SELECT event_type, count(*)::BIGINT AS n,
        |  round(sum(value), 2) AS sum_value, 0::BIGINT AS replay_advanced
        |FROM events GROUP BY 1""".stripMargin,
    // the snapshot-table TAIL must deliver the three pre-start commits
    // (= the whole orders table) plus the mid-stream fourth, exactly
    // once; the mid-stream audit is that batch's cardinality
    "stream_snapshot_source" ->
      """WITH rows4 AS (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice FROM orders
        |  UNION ALL
        |  SELECT o_orderstatus, o_orderkey, o_totalprice + 100.0
        |  FROM orders WHERE o_orderkey % 10 = 0)
        |SELECT o_orderstatus, count(*)::BIGINT AS n,
        |  round(sum(o_totalprice), 2) AS total,
        |  sum(o_orderkey)::BIGINT AS sum_okey,
        |  (SELECT count(*) FROM orders
        |   WHERE o_orderkey % 10 = 0)::BIGINT AS mid_stream_rows
        |FROM rows4 GROUP BY 1""".stripMargin,
    // readStream.table over the catalog: three commits partition the
    // orders table by key decile (<=4, 5-8, mid-stream 9) — delivered
    // exactly once, so the union is the whole table; the audit is the
    // mid-stream batch's cardinality
    "stream_snapshot_readtable" ->
      """SELECT o_orderstatus, count(*)::BIGINT AS n,
        |  round(sum(o_totalprice), 2) AS total,
        |  sum(o_orderkey)::BIGINT AS sum_okey,
        |  (SELECT count(*) FROM orders
        |   WHERE o_orderkey % 10 = 9)::BIGINT AS mid_stream_rows
        |FROM orders GROUP BY 1""".stripMargin,
    // the STREAMED change feed maintains an incremental view through
    // merge (+500 reprice of deciles 2-3, +30M-key inserts), COW
    // key-band delete, and append — the maintained view must equal
    // this direct recomputation of the final table state; sums are
    // integer cents so the view algebra is exact
    "stream_snapshot_cdf" ->
      """WITH b AS (SELECT max(o_orderkey)//2 AS dlo,
        |  max(o_orderkey)*6//10 AS dhi FROM orders),
        |v2 AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 10 IN (2, 3) THEN o_totalprice + 500.0
        |      ELSE o_totalprice END AS p
        |  FROM orders WHERE o_orderkey % 10 <= 3
        |  UNION ALL
        |  SELECT o_orderkey + 30000000, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 7),
        |v3 AS (SELECT v2.* FROM v2, b
        |  WHERE NOT (o_orderkey > b.dlo AND o_orderkey <= b.dhi)),
        |fin AS (SELECT * FROM v3
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 9)
        |SELECT o_orderstatus, count(*)::BIGINT AS n_rows,
        |  sum(CAST(round(p * 100) AS BIGINT))::BIGINT AS total_cents,
        |  sum(o_orderkey)::BIGINT AS sum_okey,
        |  3::BIGINT AS n_commits, 'A,D,I,U,UB' AS ops_seen
        |FROM fin GROUP BY 1""".stripMargin,
    // the STREAMED maintained SQ8 index: codebook from the ORIGINAL
    // corpus, quantization of the final churned corpus (merge replaces
    // %10==3 doubled + inserts %10==7 shifted +10M, COW-deletes the
    // (100,200] band, appends %10==1 shifted +20M), ADC ranks — the
    // oracle IS the rebuild the per-micro-batch maintenance must
    // equal; audits are protocol constants (confluence held, index
    // cardinality = final corpus)
    "stream_ann_maintain" ->
      s"""WITH base AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v, len(embedding) AS d
         |  FROM embeddings),
         |x AS (SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS i
         |      FROM base),
         |st AS (SELECT i, min(x) AS mn, max(x) AS mx FROM x GROUP BY 1),
         |arrs AS (SELECT list(mn ORDER BY i) AS mns,
         |  list(mx - mn ORDER BY i) AS rngs,
         |  list((mx - mn) / 256.0 ORDER BY i) AS scs FROM st),
         |merged AS (
         |  SELECT vec_id,
         |    CASE WHEN vec_id % 10 = 3
         |      THEN list_transform(v, x -> x * 2) ELSE v END AS v, d
         |  FROM base
         |  UNION ALL
         |  SELECT vec_id + 10000000, v, d FROM base WHERE vec_id % 10 = 7),
         |fc AS (
         |  SELECT * FROM merged WHERE NOT (vec_id > 100 AND vec_id <= 200)
         |  UNION ALL
         |  SELECT vec_id + 20000000, v, d FROM base WHERE vec_id % 10 = 1),
         |deq AS (
         |  SELECT fc.vec_id, list_transform(range(1, fc.d + 1), i ->
         |    arrs.mns[i] + (CAST(CASE WHEN arrs.rngs[i] <= 0 THEN 0
         |      ELSE least(255, greatest(0,
         |        floor((fc.v[i] - arrs.mns[i]) / arrs.rngs[i] * 255)))
         |      END AS INT) + 0.5) * arrs.scs[i]) AS dq
         |  FROM fc, arrs),
         |q AS (SELECT vec_id AS query_id, v AS qv, d FROM base
         |      WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.query_id, deq.vec_id AS neighbor_id,
         |    round(list_sum(list_transform(range(1, q.d + 1),
         |      i -> (q.qv[i] - deq.dq[i]) * (q.qv[i] - deq.dq[i]))), 6)
         |      AS adc
         |  FROM q JOIN deq ON deq.vec_id != q.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, adc,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY adc, neighbor_id) AS rn
         |  FROM scored)
         |SELECT query_id, neighbor_id, adc, rn AS rank,
         |  1::BIGINT AS index_matches_rebuild,
         |  (SELECT count(*) FROM fc)::BIGINT AS n_index_rows
         |FROM ranked WHERE rn <= ${graft.ops.Similarity.DefaultK}""".stripMargin
  )
}
