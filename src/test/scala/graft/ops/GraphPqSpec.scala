package graft.ops

import graft.SparkSpec

/** PQ-ADC search quality + fixed-point PageRank invariants (round 4). */
class GraphPqSpec extends SparkSpec {
  import spark.implicits._

  test("PQ-ADC search: dense ranks, no self-match, reasonable recall vs brute force") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = Similarity.queryVectors(spark, sfDir)
    val adc = Similarity.pqSearch(spark, emb, queries, 5)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    val byQuery = adc.groupBy(_._1)
    assert(byQuery.size == 10)
    byQuery.foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to 5), s"ranks for $q")
      assert(!rows.exists(_._2 == q), "self excluded")
    }
    // 4-bit-per-subspace quantization is lossy; demand it still beats
    // chance by a wide margin against the exact top-5
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = adc.map(r => (r._1, r._2)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"ADC recall@5 = $recall")
  }

  test("pagerank: every node ranked, mass bounded by the scale, hubs beat the floor") {
    val events = graft.Tables.events(spark, sfDir)
    val ranks = GraphOps.pagerank(events)
      .as[(Long, Long)].collect().toMap
    val nNodes = ranks.size
    assert(nNodes > 0)
    // total mass can only leak (dangling drop + integer-div truncation),
    // never exceed the initial SCALE
    assert(ranks.values.sum <= GraphOps.PrScale)
    assert(ranks.values.forall(_ > 0))
    // the teleport floor: every rank >= base share
    val base = (1000L - GraphOps.PrDampNum) * (GraphOps.PrScale / nNodes) / 1000L
    assert(ranks.values.forall(_ >= base))
    // the most-linked-to node must sit above the floor (it receives mass)
    val topIn = GraphOps.transitionEdges(events)
      .groupBy("dst").agg(org.apache.spark.sql.functions.sum("w").as("in_w"))
      .orderBy(org.apache.spark.sql.functions.desc("in_w"))
      .select("dst").as[Long].head()
    assert(ranks(topIn) > base, "a hub node earns more than teleport mass")
  }

  test("pagerank is deterministic across runs") {
    val events = graft.Tables.events(spark, sfDir)
    val a = GraphOps.pagerank(events).as[(Long, Long)].collect().sorted.toSeq
    val b = GraphOps.pagerank(events).as[(Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }
}
