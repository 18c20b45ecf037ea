package graft.ops

import graft.SparkSpec

/** Known-answer and equivalence checks for the k-core peel and the
  * large-star/small-star connected components.
  */
class GraphCcKcoreSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("a", "b")

  test("kcoreOf keeps exactly the 3-core: K4 survives, pendant tree peels away") {
    // K4 on {1,2,3,4} (every node degree 3) + a path 4-10-11 hanging off
    // it: 10 and 11 never reach degree 3 and must peel, taking the
    // pendant edges with them; the K4 survives with all degrees 3
    val und = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 10L), (10L, 11L))
    val out = GraphOps.kcoreOf(und, k = 3, rounds = 4)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("kcoreOf cascade: a chain of degree-2 nodes fully unravels under k=2 pruning of a tree") {
    // a pure path has no 2-core at all — every peel round removes the
    // current endpoints, so enough rounds empty it completely
    val path = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(GraphOps.kcoreOf(path, k = 2, rounds = 4).count() == 0L)
    // a cycle IS its own 2-core: nothing peels no matter the rounds
    val cyc = edges((1L, 2L), (2L, 3L), (3L, 1L))
    val out = GraphOps.kcoreOf(cyc, k = 2, rounds = 4)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("ccStarOf labels every node with its component minimum") {
    // two components: {1,5,9,12} connected as a path in id-scrambled
    // order, and {20,21}; labels must be the component minima
    val und = edges((9L, 5L), (5L, 12L), (12L, 1L), (20L, 21L))
    val out = GraphOps.ccStarOf(und, rounds = 4)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L), (5L, 1L), (9L, 1L), (12L, 1L),
      (20L, 20L), (21L, 20L)))
  }

  test("ccStarOf equals GraphX connectedComponents on the fixture transition graph") {
    import org.apache.spark.graphx.{Edge, Graph}
    val und = GraphOps.transitionEdges(
      graft.Tables.events(spark, sfDir))
      .select(org.apache.spark.sql.functions.least($"src", $"dst").as("a"),
        org.apache.spark.sql.functions.greatest($"src", $"dst").as("b"))
      .filter($"a" =!= $"b").distinct()
    val star = GraphOps.ccStarOf(und, rounds = GraphOps.CcStarRounds)
      .as[(Long, Long)].collect().toMap
    val es = und.as[(Long, Long)].rdd.map { case (a, b) => Edge(a, b, ()) }
    val gx = Graph.fromEdges(es, ()).connectedComponents()
      .vertices.collect().toMap
    assert(star.nonEmpty && star == gx)
  }

  test("mstOf finds the hand-computed minimum spanning tree") {
    // square 1-2-3-4 with a heavy diagonal: MST must take the three
    // cheapest sides (1-2:1, 3-4:2, 2-3:3) and skip 1-4:9 and 1-3:8
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 3L), (3L, 4L, 2L),
      (1L, 4L, 9L), (1L, 3L, 8L)).toDF("a", "b", "w")
    val out = GraphOps.mstOf(edges).as[(Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq((1L, 2L, 1L), (2L, 3L, 3L), (3L, 4L, 2L)))
  }

  test("mstOf ties break on the (w, a, b) total order") {
    // triangle with all weights equal: the unique MST under the total
    // order keeps the two lexicographically smallest edges
    val edges = Seq((1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L))
      .toDF("a", "b", "w")
    val out = GraphOps.mstOf(edges).as[(Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq((1L, 2L, 5L), (1L, 3L, 5L)))
  }

  test("fixture MST equals driver-side Kruskal: same size, same total weight, acyclic") {
    val we = GraphOps.transitionEdges(graft.Tables.events(spark, sfDir))
      .select(org.apache.spark.sql.functions.least($"src", $"dst").as("a"),
        org.apache.spark.sql.functions.greatest($"src", $"dst").as("b"),
        $"w")
      .filter($"a" =!= $"b")
      .groupBy("a", "b")
      .agg(org.apache.spark.sql.functions.sum($"w").as("w"))
    val all = we.as[(Long, Long, Long)].collect()
    // reference Kruskal under the same (w, a, b) total order
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val kruskal = all.sortBy(e => (e._3, e._1, e._2)).filter { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra == rb) false else { parent(ra) = rb; true }
    }
    val mst = GraphOps.mstOf(we).as[(Long, Long, Long)].collect()
    assert(mst.length == kruskal.length)
    assert(mst.map(_._3).sum == kruskal.map(_._3).sum)
    // unique MST under a strict total order -> exact set equality
    assert(mst.toSet == kruskal.toSet)
  }

  test("fixture kcore/ccStar are fixpoints at the configured round counts") {
    val ev = graft.Tables.events(spark, sfDir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(rows(GraphOps.kcore(ev, GraphOps.KcoreK, GraphOps.KcorePeelRounds)) ==
      rows(GraphOps.kcore(ev, GraphOps.KcoreK, GraphOps.KcorePeelRounds + 1)))
    assert(rows(GraphOps.ccStar(ev, GraphOps.CcStarRounds)) ==
      rows(GraphOps.ccStar(ev, GraphOps.CcStarRounds + 1)))
  }
}
