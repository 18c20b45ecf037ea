package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

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

  test("pqSearch: an oversize query batch fails loudly, not an OOM") {
    import org.apache.spark.sql.functions.{array, lit}
    val emb = graft.Tables.embeddings(spark, sfDir)
    // one past the cap; the guard must fire before any LUT is built
    val oversize = spark.range(Similarity.PqMaxQueryBatch + 1)
      .select(col("id").as("vec_id"),
        array(lit(0.1f), lit(0.2f)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Similarity.pqSearch(spark, emb, oversize, 5)
    }
    assert(e.getMessage.contains("PqMaxQueryBatch"))
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

  test("pagerank on an empty event stream returns empty, not a crash") {
    val empty = graft.Tables.events(spark, sfDir).filter(col("event_id") < 0)
    assert(GraphOps.pagerank(empty).count() == 0)
  }

  test("triangle census: canonical orientation counts each triangle once") {
    val out = GraphOps.triangleCensus(graft.Tables.events(spark, sfDir))
      .as[(Long, Long, Long)].head()
    val (nodes, edges, tris) = out
    assert(nodes > 0 && edges > 0)
    // upper bound: C(nodes, 3); a dense transition graph should have some
    assert(tris <= nodes * (nodes - 1) * (nodes - 2) / 6)
    assert(tris > 0, "fixture transition graph has triangles")
    // brute-force recount on the collected edge set
    val es = GraphOps.transitionEdges(graft.Tables.events(spark, sfDir))
      .select("src", "dst").as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(p => p._1 != p._2).toSet
    val vs = es.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    var local = 0L
    for (Seq(x, y, z) <- vs.combinations(3))
      if (es((x, y)) && es((y, z)) && es((x, z))) local += 1
    assert(local == tris, s"brute force $local vs engine $tris")
  }

  test("MR tagged-union join matches the declarative left-outer aggregate") {
    val mr = graft.queries.Relational.mrJoin(spark, sfDir)
      .select("custkey", "n_orders", "total_spent")
      .as[(Long, Long, Double)].collect().sorted.toSeq
    val df = graft.queries.Relational.q7OuterJoin(spark, sfDir)
      .select(col("c_custkey"), col("n_orders"), col("total_spent"))
      .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(mr == df)
  }

  test("pagerank is deterministic across runs") {
    val events = graft.Tables.events(spark, sfDir)
    val a = GraphOps.pagerank(events).as[(Long, Long)].collect().sorted.toSeq
    val b = GraphOps.pagerank(events).as[(Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }
}
