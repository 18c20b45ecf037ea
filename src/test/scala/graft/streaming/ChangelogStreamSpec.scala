package graft.streaming

import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming CDC materialization: the converged snapshot must be
  * independent of HOW the changelog arrives — ops split across
  * micro-batches, and even an update arriving BEFORE its own insert,
  * must fold to the same row.
  */
class ChangelogStreamSpec extends SparkSpec {

  private def ts(d: Int) =
    java.sql.Timestamp.valueOf(f"2026-01-$d%02d 00:00:00")

  test("cross-batch, out-of-order changelog converges to the merged row") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Int, String, String, Double, String,
      java.sql.Timestamp)]
    val in = mem.toDF()
      .toDF("key", "version", "op", "status", "price", "priority", "odate")
    val out = ChangelogStream.materialize(in)
    val name = "cdc_sink"
    val q = out.writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName(name).start()
    try {
      // batch 1: key 1 insert; key 2's UPDATE arrives before its insert;
      // key 3 insert
      mem.addData(
        (1L, 0, "I", "O", 10.0, "1-URGENT", ts(1)),
        (2L, 1, "U", "O", 120.0, "2-HIGH", ts(2)),
        (3L, 0, "I", "F", 30.0, "3-MEDIUM", ts(3)))
      q.processAllAvailable()
      // batch 2: key 2's late insert (older version), key 3's delete,
      // key 1's update
      mem.addData(
        (2L, 0, "I", "O", 20.0, "2-HIGH", ts(2)),
        (3L, 1, "D", "F", 30.0, "3-MEDIUM", ts(3)),
        (1L, 1, "U", "O", 110.0, "1-URGENT", ts(1)))
      q.processAllAvailable()
    } finally q.stop()
    val snap = ChangelogStream.finalizeSnapshot(spark.table(name))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(2), r.getString(3)))).toMap
    // key 1: insert then update → price 110
    assert(snap(1L) == (("O", 110.0, "1-URGENT")))
    // key 2: update arrived FIRST, insert later — version fold must
    // still apply I (price 20) before U (price 120)
    assert(snap(2L) == (("O", 120.0, "2-HIGH")))
    // key 3: deleted — absent from the snapshot
    assert(!snap.contains(3L))
  }

  test("fold is invariant under every arrival permutation of a key's ops") {
    import org.apache.spark.sql.streaming.OutputMode
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // 3 ops for one key: insert, price update, priority-preserving
    // second update (higher version wins on price)
    val ops = Seq(
      (7L, 0, "I", "O", 10.0, "1-URGENT", ts(1)),
      (7L, 1, "U", "O", 50.0, "1-URGENT", ts(1)),
      (7L, 2, "U", "O", 90.0, "1-URGENT", ts(1)))
    val results = ops.permutations.map { perm =>
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val mem = MemoryStream[(Long, Int, String, String, Double, String,
        java.sql.Timestamp)]
      val in = mem.toDF()
        .toDF("key", "version", "op", "status", "price", "priority", "odate")
      val name = s"cdc_perm_${perm.map(_._2).mkString}"
      val q = ChangelogStream.materialize(in)
        .writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName(name).start()
      try {
        // one op per micro-batch, in permutation order
        perm.foreach { o => mem.addData(o); q.processAllAvailable() }
      } finally q.stop()
      ChangelogStream.finalizeSnapshot(spark.table(name))
        .collect().map(_.toSeq).toSeq
    }.toSeq
    assert(results.distinct.size == 1,
      s"permutation-dependent snapshots: ${results.distinct}")
    assert(results.head.head(2) == 90.0) // highest version's price won
  }

  test("streaming snapshot equals the batch MERGE on the driver table") {
    val stream = ChangelogStream.cdcApplyStream(spark, sfDir)
      .orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    val batch = graft.ops.Warehouse.cdcApply(spark, sfDir)
      .orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    assert(stream == batch)
  }
}
