package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSpec

/** Round-10 contracts: the sharded-prefix-sum shuffle ranks equal the
  * global-window reference form row-for-row while keeping every corpus
  * row out of single-partition exchanges, and the dedup label memo
  * invalidates on clearShared.
  */
class Round10Spec extends SparkSpec {

  test("shuffleShard: sharded prefix-sum ranks equal the global-window " +
      "reference semantics") {
    val docs = graft.Tables.documents(spark, sfDir)
    val got = PipelineOps.shuffleShard(docs)
      .orderBy("shuffle_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the semantics the scaladoc pins: rank in (h48, doc_id) order,
    // shard = h48 mod ShuffleShards, per-shard position in same order
    import graft.ops.Sketches.h48
    val h = h48(concat(lit("shuf|"), col("doc_id")))
    val expect = docs.select(col("doc_id"), h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(PipelineOps.ShuffleShards)))
      .select(col("doc_id"), col("shard"),
        row_number().over(Window.orderBy(col("h"), col("doc_id")))
          .cast("long").as("shuffle_rank"),
        row_number().over(Window.partitionBy(col("shard"))
          .orderBy(col("h"), col("doc_id"))).cast("long").as("pos_in_shard"))
      .orderBy("shuffle_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == expect.length && got.length > 0)
    assert(got.sameElements(expect))
  }

  test("shuffleShard plan: no corpus row crosses a single-partition " +
      "exchange; the offset table broadcasts") {
    val df = PipelineOps.shuffleShard(graft.Tables.documents(spark, sfDir))
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"),
      "a global window would serialize the corpus through one task: " + p)
    assert(p.contains("BroadcastExchange"),
      "the O(ranges x shards) offset table should broadcast: " + p)
  }

  test("curateV3: the lazy end-to-end composition equals stage-by-stage " +
      "materialization") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString)
    val lazyRun = rows(PipelineOps.curateV3(spark, sfDir))
    val staged = rows(
      PipelineOps.curateV3Staged(spark, sfDir, _.localCheckpoint(true)))
    assert(lazyRun.nonEmpty)
    assert(lazyRun.sameElements(staged))
  }

  test("bpe encode: the mapPartitions arm equals the fold arm on the " +
      "same merge table") {
    val docs = graft.Tables.documents(spark, sfDir)
    val merges = TextAnalysis.bpeMerges(docs).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty && merges.size <= TextAnalysis.BpeFoldMaxMerges)
    def rows(mx: Seq[(String, String)], forceScala: Boolean) = {
      // pad with no-op merges (a control-char symbol no corpus char or
      // prior merge can produce) to push the table over the threshold
      // without changing the encoding
      val padded = if (forceScala)
        mx ++ (1 to TextAnalysis.BpeFoldMaxMerges).map(i =>
          (s"$i", s"$i"))
      else mx
      TextAnalysis.bpeEncodeWith(docs, padded)
        .collect().map(_.toSeq).sortBy(_.toString)
    }
    val fold = rows(merges, forceScala = false)
    val scala = rows(merges, forceScala = true)
    assert(fold.nonEmpty)
    assert(fold.sameElements(scala))
  }

  test("clearShared drops the label memo so the chain recomputes") {
    val a = Dedup.sharedClusters(spark, sfDir)
    assert(Dedup.sharedClusters(spark, sfDir) eq a) // memo hit
    Dedup.clearShared()
    val b = Dedup.sharedClusters(spark, sfDir)
    assert(!(b eq a), "clearShared must force a rebuilt frame")
    assert(b.collect().toSet == a.collect().toSet)
  }

  test("curateStep over three increments equals the first-arrival batch " +
      "recompute, and each append is exactly the step's survivors") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val root = java.nio.file.Files
      .createTempDirectory("graft_step").toString + "/curated"
    // texts that clear the quality gate (length, stopword, punct bands)
    // vs junk that fails it; duplicates planted across increments
    def prose(tag: String) =
      (s"the story of $tag is that it was good for all of them and " +
        "then the end came to pass as it should in a town by the sea ") * 3
    val b1 = Seq((10L, "s1", prose("alpha")), (11L, "s1", prose("beta")),
      (12L, "s2", "xx")).toDF("doc_id", "source", "text")
    val b2 = Seq((20L, "s2", prose("alpha")), // dup of doc 10 → dropped
      (21L, "s2", prose("gamma")),
      (22L, "s1", prose("gamma"))) // in-batch dup → min doc_id keeps 21
      .toDF("doc_id", "source", "text")
    val b3 = Seq((30L, "s3", prose("gamma")), // dup of kept 21 → dropped
      (31L, "s3", prose("delta")),
      (32L, "s3", "yy")).toDF("doc_id", "source", "text")
    val ids = Seq(b1, b2, b3).zipWithIndex.map { case (b, i) =>
      PipelineOps.curateStep(spark, b, root, s"w$i")
    }
    assert(ids == Seq(1L, 2L, 3L))
    val got = SnapshotTable.read(spark, root).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // first-arrival truth: 10, 11 (batch 1), 21 (batch 2), 31 (batch 3)
    assert(got == Set(10L, 11L, 21L, 31L))
    // each step's append holds exactly its survivors
    def added(v: Long) = SnapshotTable.changesBetween(spark, root, v - 1, v)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(added(1L) == Set(10L, 11L))
    assert(added(2L) == Set(21L))
    assert(added(3L) == Set(31L))
    // watermarks recorded per step
    assert(SnapshotTable.snapshotProps(spark, root, 3L) - "schema"
      == Map("watermark" -> "w2"))
  }
}
