package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[SnapshotStreamSink]]'s exactly-once contract: redelivered batch
  * ids are no-ops across writer instances (the post-restart path), and
  * a real checkpointed query that stops, misses data, and restarts
  * lands the snapshot table on the batch ground truth with no
  * duplicates — the ingest-side complement of `StreamRecoverySpec`,
  * which proves the same discipline for stateful operators.
  */
class SnapshotSinkSpec extends SparkSpec {

  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("redelivered batch ids are skipped, including by a fresh writer") {
    import spark.implicits._
    val root = tmp("graft-sink")
    val df1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val df2 = Seq((3L, "c")).toDF("k", "v")
    val df3 = Seq((4L, "d")).toDF("k", "v")
    val w1 = SnapshotStreamSink.writer(root, "t")
    w1(df1, 0L)
    w1(df2, 1L)
    assert(SnapshotTable.currentSnapshot(spark, root) == 2L)
    // same writer instance: redelivery skipped from the in-memory floor
    w1(df2, 1L)
    assert(SnapshotTable.currentSnapshot(spark, root) == 2L)
    // FRESH writer (a restarted query): must recover the floor from the
    // manifest headers, then skip the same redelivery
    assert(SnapshotStreamSink.lastCommittedBatch(spark, root, "t") == 1L)
    val w2 = SnapshotStreamSink.writer(root, "t")
    w2(df2, 1L)
    assert(SnapshotTable.currentSnapshot(spark, root) == 2L)
    w2(df3, 2L)
    assert(SnapshotTable.currentSnapshot(spark, root) == 3L)
    assert(SnapshotTable.read(spark, root).collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
    // tags are independent bookkeeping
    assert(SnapshotStreamSink.lastCommittedBatch(spark, root, "other") == -1L)
  }

  test("checkpointed stream into a snapshot table: stop, miss data, " +
    "restart — table equals batch truth with no duplicates") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Double)]
    val in = mem.toDF().toDF("k", "value")
    val root = tmp("graft-sink-rec")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-sink-ckpt").toString
    // each start() builds a FRESH writer — exactly what a restarted
    // query does, so the floor-recovery path runs for real
    def start() = in.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(SnapshotStreamSink.writer(root, "rec"))
      .start()

    val q1 = start()
    try { mem.addData((1 to 10).map(i => (i.toLong, i * 1.0)))
      q1.processAllAvailable() } finally q1.stop()
    val afterFirst = SnapshotTable.currentSnapshot(spark, root)
    assert(afterFirst >= 1L)
    assert(SnapshotTable.read(spark, root).count() == 10L)

    mem.addData((11 to 30).map(i => (i.toLong, i * 1.0))) // while DOWN
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    // a third restart with nothing new must not advance the table
    val afterSecond = SnapshotTable.currentSnapshot(spark, root)
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    assert(SnapshotTable.currentSnapshot(spark, root) == afterSecond,
      "an idle restart advanced the table")

    val rows = SnapshotTable.read(spark, root).collect()
    assert(rows.length == 30, s"expected 30 rows, got ${rows.length}")
    assert(rows.map(_.getLong(0)).toSet == (1L to 30L).toSet)
    assert(SnapshotTable.read(spark, root)
      .agg(sum(col("value"))).head().getDouble(0) == (1 to 30).sum.toDouble)
    // and the missed-while-down rows are exactly the incremental read
    assert(SnapshotTable
      .changesBetween(spark, root, afterFirst, afterSecond)
      .collect().map(_.getLong(0)).toSet == (11L to 30L).toSet)
  }

  test("upsertWriter under a live checkpointed stream: last write per " +
      "key wins across batches AND within one (seq), a restart " +
      "redelivers nothing, and each batch was a stats-pruned merge") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Double, Long)]
    val in = mem.toDF().toDF("k", "v", "seq")
    val root = tmp("graft-ups-rec")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ups-ckpt").toString
    def start() = in.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(SnapshotStreamSink.upsertWriter(root, "cdc", "k",
        seqCol = Some("seq")))
      .start()
    val q1 = start()
    try {
      mem.addData((1 to 100).map(i => (i.toLong, i * 1.0, 1L)))
      q1.processAllAvailable() // batch 0: bootstrap
      mem.addData(Seq((5L, 500.0, 2L), (6L, 600.0, 2L),
        (200L, 1.0, 2L))) // batch 1: two updates + an insert
      q1.processAllAvailable()
    } finally q1.stop()
    // while DOWN: nothing; restart must redeliver nothing
    val before = SnapshotTable.currentSnapshot(spark, root)
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(SnapshotTable.currentSnapshot(spark, root) == before,
        "an idle restart advanced the table")
      // live batch with an intra-batch double-update: seq 4 wins
      mem.addData(Seq((5L, 5550.0, 3L), (5L, 5000.0, 4L)))
      q2.processAllAvailable()
    } finally q2.stop()
    val got = SnapshotTable.read(spark, root)
      .select("k", "v").as[(Long, Double)].collect().toMap
    assert(got.size == 101)
    assert(got(5L) == 5000.0 && got(6L) == 600.0 && got(200L) == 1.0)
    assert(got(7L) == 7.0)
    // the table never stored the transport seq column
    assert(!SnapshotTable.read(spark, root).columns.contains("seq"))
  }
}
