package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-8 session-4 additions: feature ranking, radius search, and
  * class balancing.
  */
class Session4OpsSpec extends SparkSpec {
  import spark.implicits._

  test("featureRank arms equal the per-feature stumps, dense ranks by (err, feature)") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val out = MlOps.featureRank(li)
      .select("feature", "threshold_fp", "err", "rank")
      .as[(String, Long, Long, Int)].collect().sortBy(_._4)
    assert(out.map(_._1).toSet ==
      Set("price_cents", "quantity", "discount_cents"))
    assert(out.map(_._4).toSeq == Seq(1, 2, 3))
    // errs are sorted by rank, and each arm equals its standalone stump
    assert(out.map(_._3).toSeq == out.map(_._3).sorted.toSeq)
    val priceStump = MlOps.decisionStump(li.select(
      round(col("l_extendedprice") * 100).cast("long").as("f"),
      when(col("l_returnflag") === lit("R"), 1L).otherwise(0L).as("y")))
      .head()
    val priceArm = out.find(_._1 == "price_cents").get
    assert(priceArm._2 == priceStump.getLong(0) &&
      priceArm._3 == priceStump.getLong(1))
  }

  test("rangeSearch returns every neighbor at or above tau and nothing below") {
    // q0 along +x: ids 1 (cos 1), 3 (cos ~0.707), 5 (orthogonal), 7
    // (opposite) — tau 0.5 keeps exactly {1, 3}
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(2.0f, 0.0f)),
      (3L, Array(1.0f, 1.0f)),
      (5L, Array(0.0f, 1.0f)),
      (7L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.rangeSearch(emb,
        emb.filter(col("vec_id") === 0L), tau = 0.5)
      .select("query_id", "neighbor_id", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(out.map(r => (r._2, r._4)).toSeq == Seq((1L, 1), (3L, 2)))
    assert(out(0)._3 == 1.0 && math.abs(out(1)._3 - 0.707107) < 1e-6)
  }

  test("classBalance caps every label at the min class count with deterministic keepers") {
    val emb = (1L to 10L).map(i => (i, Array(1.0f), 0)) ++
      (11L to 13L).map(i => (i, Array(1.0f), 1)) ++
      (14L to 20L).map(i => (i, Array(1.0f), 2))
    val out = PipelineOps.classBalance(
        emb.toDF("vec_id", "embedding", "label"))
      .select("label", "vec_id").as[(Long, Long)].collect()
    val byLabel = out.groupBy(_._1).view.mapValues(_.length).toMap
    // min class (label 1) has 3 rows -> every label keeps exactly 3
    assert(byLabel == Map(0L -> 3, 1L -> 3, 2L -> 3))
    // rerun is bit-identical (content-addressed order, not partition order)
    val again = PipelineOps.classBalance(
        emb.toDF("vec_id", "embedding", "label"))
      .select("label", "vec_id").as[(Long, Long)].collect()
    assert(out.sorted.toSeq == again.sorted.toSeq)
  }

  test("pcaPower concentrates on the dominant axis of a hand-built corpus") {
    // 10 vectors hugging axis 1 (both signs), tiny noise on axis 0 —
    // the top eigenvector of X'X is e1; the iterate's weight must land
    // on index 1 and dwarf index 0
    val rows = (0 until 10).map { k =>
      val sgn = if (k % 2 == 0) 1.0f else -1.0f
      (k.toLong, Array(0.01f * k, sgn * 3.0f))
    }
    val out = Similarity.pcaPower(rows.toDF("vec_id", "embedding"))
      .as[(Int, Long)].collect().toMap
    assert(math.abs(out(1)) > 100L * math.max(1L, math.abs(out(0))))
  }

  test("pcaPower on the fixture aligns with a float power iteration") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val vq = Similarity.pcaPower(emb).as[(Int, Long)].collect()
      .sortBy(_._1).map(_._2.toDouble)
    // driver-side float reference (tiny fixture: 50 x 64)
    val x = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    var v = Array.fill(x.head.length)(1.0)
    for (_ <- 1 to Similarity.PcaIters) {
      val y = x.map(r => r.zip(v).map { case (a, b) => a * b }.sum)
      val z = v.indices.map(j => x.zip(y).map { case (r, yi) => r(j) * yi }.sum).toArray
      val n = math.sqrt(z.map(a => a * a).sum)
      v = z.map(_ / n)
    }
    val dot = vq.zip(v).map { case (a, b) => a * b }.sum
    val cos = math.abs(dot) /
      (math.sqrt(vq.map(a => a * a).sum) * math.sqrt(v.map(a => a * a).sum))
    assert(cos > 0.98, s"cos=$cos")
  }
}
