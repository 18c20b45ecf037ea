package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Checkpoint RECOVERY — the failure-handling half of the streaming
  * story: every other streaming spec drains an uninterrupted query, so
  * none of them proves what the durable state exists FOR. Each test here
  * runs micro-batches against a REAL checkpoint directory, STOPS the
  * query, feeds more data while it is down, restarts from the
  * checkpoint, and asserts (a) the resumed query reloaded its state (a
  * key spanning the restart shows cumulative, not restarted, totals),
  * (b) no committed batch is re-emitted (batch ids after restart are
  * strictly new), and (c) the final result equals the uninterrupted run
  * and the batch ground truth — the exactly-once contract end to end.
  *
  * Sink choices mirror production: the Update-mode stateful queries
  * write through `foreachBatch` (Spark only permits checkpoint recovery
  * into the memory sink in Complete mode), the Complete-mode signature
  * store restarts into the memory sink directly.
  */
class StreamRecoverySpec extends SparkSpec {

  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Collected (batchId, row) emissions from a foreachBatch sink. */
  private final class Emissions {
    private val buf = ArrayBuffer.empty[(Long, Row)]
    def add(id: Long, rows: Array[Row]): Unit =
      buf.synchronized { rows.foreach(r => buf += ((id, r))) }
    def snapshot: Seq[(Long, Row)] = buf.synchronized { buf.toSeq }
  }

  test("user totals (bounded state): stop/restart from checkpoint resumes " +
    "exactly-once") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Double)]
    val in = mem.toDF().toDF("user_id", "value")
    val out = EventStreams.userTotalsStats(in)
    val ckpt = tmp("graft-rec-ut")
    val em = new Emissions
    val sinkFn: (Dataset[Row], Long) => Unit =
      (df, id) => em.add(id, df.collect())
    def start() = out.writeStream.outputMode(OutputMode.Update)
      .option("checkpointLocation", ckpt)
      .foreachBatch(sinkFn)
      .start()

    val half1 = (1 to 20).map(u => (u.toLong, u * 1.0))
    val half2 = (11 to 30).map(u => (u.toLong, u * 2.0))

    val q1 = start()
    try { mem.addData(half1); q1.processAllAvailable() } finally q1.stop()
    val preStop = em.snapshot
    val preIds = preStop.map(_._1).toSet
    assert(preStop.nonEmpty && preIds.nonEmpty)

    mem.addData(half2) // arrives while the query is DOWN
    val t0 = System.nanoTime()
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val recoverSec = (System.nanoTime() - t0) / 1e9

    val post = em.snapshot.drop(preStop.size)
    // (b) committed batches are not replayed: every post-restart batch id
    // is strictly beyond the committed ones, and no user that appeared
    // only before the stop re-emits
    assert(post.nonEmpty && post.forall(_._1 > preIds.max),
      s"restart replayed a committed batch: ${post.map(_._1).distinct}")
    assert(post.forall(_._2.getLong(0) >= 11L),
      "a user from the committed batch re-emitted after restart")
    // (a) state reloaded: users 11..20 saw one event per half, so their
    // post-restart emission must count BOTH (a lost store restarts at 1)
    val spanning = post.map(_._2).filter(r => r.getLong(0) <= 20L)
    assert(spanning.nonEmpty && spanning.forall(_.getLong(1) == 2L),
      s"state not recovered: ${spanning.map(r => (r.getLong(0), r.getLong(1)))}")
    // (c) the union of emissions finalizes to the batch ground truth
    val sink = spark.createDataFrame(
      spark.sparkContext.parallelize(em.snapshot.map(_._2)),
      out.schema)
    val got = EventStreams.finalizeUserTotals(sink)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val expect = (half1 ++ half2).groupBy(_._1)
      .map { case (u, es) =>
        u -> ((es.size.toLong,
          math.rint(es.map(_._2).sum * 100) / 100)) }
    assert(got == expect, s"resumed totals drifted: $got vs $expect")
    info(f"restart-to-drained recovery: $recoverSec%.2f s")
  }

  test("CDC apply (unbounded keyed state): updates landing after a restart " +
    "fold onto recovered inserts") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import ChangelogStream.ChOp
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2026-01-$d%02d 00:00:00")
    val inserts = (1 to 10).map(k =>
      ChOp(k.toLong, 0, "I", s"S${k % 3}", k * 10.0, s"P${k % 2}", ts(k)))
    val changes =
      (1 to 5).map(k => ChOp(k.toLong, 1, "U", null, k * 10.0 + 100.0, null, null)) ++
      (6 to 8).map(k => ChOp(k.toLong, 1, "D", null, 0.0, null, null))

    def drive(interrupt: Boolean): Seq[Row] = {
      val mem = MemoryStream[ChOp]
      val out = ChangelogStream.materialize(mem.toDF())
      val ckpt = tmp("graft-rec-cdc")
      val em = new Emissions
      val sinkFn: (Dataset[Row], Long) => Unit =
        (df, id) => em.add(id, df.collect())
      def start() = out.writeStream.outputMode(OutputMode.Update)
        .option("checkpointLocation", ckpt)
        .foreachBatch(sinkFn)
        .start()
      val q1 = start()
      try { mem.addData(inserts); q1.processAllAvailable() }
      finally if (interrupt) q1.stop()
      mem.addData(changes) // while down (or mid-stream, uninterrupted)
      val q2 = if (interrupt) start() else q1
      try q2.processAllAvailable() finally q2.stop()
      val sink = spark.createDataFrame(
        spark.sparkContext.parallelize(em.snapshot.map(_._2)), out.schema)
      ChangelogStream.finalizeSnapshot(sink)
        .orderBy("o_orderkey").collect().toSeq
    }

    val resumed = drive(interrupt = true)
    val uninterrupted = drive(interrupt = false)
    assert(resumed == uninterrupted,
      s"resumed snapshot != uninterrupted: $resumed vs $uninterrupted")
    // the update ops carry NO status/priority — a correct fold must have
    // recovered the insert state to fill them; a lost store would emit
    // null status for keys 1..5
    val byKey = resumed.map(r => r.getLong(0) -> r).toMap
    assert(byKey.keySet == ((1 to 5) ++ (9 to 10)).map(_.toLong).toSet,
      s"deletes 6..8 must vanish, others survive: ${byKey.keySet}")
    (1 to 5).foreach { k =>
      val r = byKey(k.toLong)
      assert(r.getString(1) == s"S${k % 3}" && r.getDouble(2) == k * 10.0 + 100.0,
        s"key $k lost recovered insert state: $r")
    }
    (9 to 10).foreach { k =>
      assert(byKey(k.toLong).getDouble(2) == k * 10.0)
    }
  }

  test("minhash signature store (Complete-mode agg): chunked docs min-merge " +
    "across a restart") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // two near-dup docs each arriving as TWO chunks on OPPOSITE sides of
    // the restart: their signatures only match the batch pipeline if the
    // per-doc component minima recovered from the checkpoint and merged
    // with the post-restart chunk
    val words = (0 until 21).map(i => s"tok$i")
    val chunkA = words.take(11).mkString(" ")            // tok0..tok10
    val chunkB = words.drop(11).mkString(" ")            // tok11..tok20
    val chunkB2 = (words.slice(11, 20) :+ "tokX").mkString(" ")
    val d3 = (0 until 21).map(i => s"alt$i").mkString(" ")
    val d4 = (0 until 21).map(i => s"oth$i").mkString(" ")
    val batch1 = Seq((1L, chunkA), (2L, chunkB2), (3L, d3))
    val batch2 = Seq((1L, chunkB), (2L, chunkA), (4L, d4))

    def drive(interrupt: Boolean, tag: String): DataFrame = {
      val mem = MemoryStream[(Long, String)]
      val sig = graft.ops.Dedup.minhashSignatures(
        graft.ops.Dedup.shingles(mem.toDF().toDF("doc_id", "text")))
      val name = s"rec_minhash_$tag"
      val ckpt = tmp("graft-rec-mh")
      def start() = sig.writeStream.outputMode(OutputMode.Complete)
        .format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
      val q1 = start()
      try { mem.addData(batch1); q1.processAllAvailable() }
      finally if (interrupt) q1.stop()
      mem.addData(batch2)
      val q2 = if (interrupt) start() else q1
      try q2.processAllAvailable() finally q2.stop()
      val out = spark.table(name).localCheckpoint(eager = true)
      spark.catalog.dropTempView(name)
      out
    }

    val resumedSig = drive(interrupt = true, "r")
    val plainSig = drive(interrupt = false, "p")
    val key = (df: DataFrame) => df.collect().map(_.toSeq).toSet
    assert(key(resumedSig) == key(plainSig),
      "recovered signature store != uninterrupted store")

    // downstream of the recovered store: same candidates, same verified
    // near-dup pairs as the all-batch pipeline over the same chunk rows
    val allRows = (batch1 ++ batch2).toDF("doc_id", "text")
    val sh = graft.ops.Dedup.shingles(allRows)
    val resumed = graft.ops.Dedup.verifyJaccard(
      graft.ops.Dedup.lshCandidatesFromSignatures(resumedSig), sh)
      .collect().map(_.toSeq).toSet
    val batch = graft.ops.Dedup.minhashLshDocs(allRows)
      .collect().map(_.toSeq).toSet
    assert(resumed == batch && resumed.nonEmpty,
      s"recovered pipeline drifted: $resumed vs $batch")
    assert(resumed.exists(r => r.take(2) == Seq(1L, 2L)),
      s"planted near-dup pair (1,2) not found: $resumed")
  }
}
