package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exactly-once Structured Streaming ingest into a [[SnapshotTable]] —
  * the transactional half of the lakehouse story the memory-sink demos
  * don't exercise: `foreachBatch` gives at-least-once delivery (a batch
  * that committed before a crash is REDELIVERED after restart from the
  * checkpoint), so the sink must make the second delivery a no-op.
  *
  * Protocol: each micro-batch commit carries its batch id as a manifest
  * property (`stream.<tag>.batch`). The writer skips any batch id at or
  * below the highest id already committed for its tag — discovered by
  * one scan of the LIVE manifests' headers at (re)start, then tracked
  * in memory, so the steady state adds zero metadata reads. The
  * manifest rename is the atomic boundary: either a batch's snapshot is
  * visible (and its redelivery is skipped) or it never happened (and
  * the redelivery commits it) — there is no third state, which is what
  * makes the sink exactly-once end-to-end given a checkpointed source.
  *
  * Scale: recovery cost is O(live manifests) small-file reads, bounded
  * by the [[SnapshotTable.expireSnapshots]] horizon; per-batch cost is
  * the batch write itself plus one manifest write. Single writer per
  * table, per the layer's contract — fan-in goes through the query, not
  * through concurrent sinks.
  */
object SnapshotStreamSink {

  private def propKey(tag: String) = s"stream.$tag.batch"

  /** Highest batch id any LIVE snapshot committed for `tag`; -1 when
    * none. One manifest-header scan — called once per writer lifetime.
    */
  def lastCommittedBatch(s: SparkSession, root: String, tag: String): Long = {
    val cur = SnapshotTable.currentSnapshot(s, root)
    if (cur == 0L) -1L
    else {
      // stream.* props are carried forward into EVERY later commit
      // (SnapshotTable.commitWithCarried), so the floor survives
      // compaction, merge, and expiration — the CURRENT manifest alone
      // is authoritative; scanning the rest only picks up pre-carry
      // history and skips expired ids
      (1L to cur).iterator.flatMap { id =>
        try SnapshotTable.snapshotProps(s, root, id).get(propKey(tag))
          .map(_.toLong)
        catch { case _: IllegalArgumentException => None }
      }.foldLeft(-1L)(math.max)
    }
  }

  /** A `foreachBatch` function committing each micro-batch as an APPEND
    * snapshot, idempotent in the batch id. Use one writer instance per
    * started query: `df.writeStream.foreachBatch(writer(root, tag))
    * .option("checkpointLocation", …).start()`. `statsCol` flows to
    * [[SnapshotTable.commit]] so streamed-in files join the skipping
    * index like batch-written ones.
    */
  def writer(root: String, tag: String, statsCol: Option[String] = None):
      (DataFrame, Long) => Unit = {
    // lazily discovered so the recovery scan happens on the stream's
    // first batch, against the restarted table state
    var last: Option[Long] = None
    (df: DataFrame, batchId: Long) => {
      val s = df.sparkSession
      val floor = last.getOrElse {
        val v = lastCommittedBatch(s, root, tag)
        last = Some(v)
        v
      }
      if (batchId > floor) {
        SnapshotTable.commit(df, root, statsCol = statsCol,
          props = Map(propKey(tag) -> batchId.toString))
        last = Some(batchId)
      }
      // else: redelivery of an already-visible batch — exactly-once skip
    }
  }
}
