package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-8 session-3 additions: time travel (wh_snapshot_asof), exact
  * decision-stump training (ml_decision_stump), and deterministic
  * min-label propagation (graph_label_prop).
  */
class Round8OpsSpec extends SparkSpec {

  // ---- wh_snapshot_asof -------------------------------------------------

  test("snapshot as-of v2 applies every changelog path per key residue") {
    val base = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val out = Warehouse.snapshotAsOfQuery(spark, sfDir)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    base.foreach { case (k, p) =>
      (k % 10) match {
        case 0 | 1 => // updated twice, latest image wins
          assert(math.abs(out(k) - (p + 150.0)) < 1e-6, s"key $k")
        case 2 =>     // only the v1 bump applies
          assert(math.abs(out(k) - (p + 100.0)) < 1e-6, s"key $k")
        case 3 =>     // deleted at v1, resurrected at v2 at the original image
          assert(math.abs(out(k) - p) < 1e-6, s"key $k")
        case 4 =>     // deleted at v2
          assert(!out.contains(k), s"key $k should be deleted")
        case _ =>     // untouched since insert
          assert(math.abs(out(k) - p) < 1e-6, s"key $k")
      }
    }
    assert(out.keySet.subsetOf(base.keySet))
  }

  test("snapshot as-of plans one combinable aggregation, no window sort") {
    val plan = Warehouse.snapshotAsOfQuery(spark, sfDir)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window sort:\n$plan")
  }

  // ---- ml_decision_stump ------------------------------------------------

  test("stump finds the zero-error split on a separable feature") {
    import spark.implicits._
    val labeled = Seq((10L, 0L), (20L, 0L), (30L, 1L), (40L, 1L), (50L, 1L))
      .toDF("f", "y")
    val r = MlOps.decisionStump(labeled).head()
    assert(r.getLong(0) == 20L) // threshold: f <= 20 is the pure-negative side
    assert(r.getLong(1) == 0L)  // err
    assert(r.getLong(2) == 2L && r.getLong(3) == 0L) // n_left, pos_left
    assert(r.getLong(4) == 3L && r.getLong(5) == 3L) // n_right, pos_right
    assert(r.getDouble(6) == 1.0)                    // acc
  }

  test("stump tie-break picks the smallest threshold among equal-err splits") {
    import spark.implicits._
    // constant label: EVERY split has err = 0 predicting the majority
    // class on both sides, so the argmin must land on the smallest f
    val labeled = Seq((5L, 1L), (6L, 1L), (7L, 1L)).toDF("f", "y")
    val r = MlOps.decisionStump(labeled).head()
    assert(r.getLong(0) == 5L && r.getLong(1) == 0L)
  }

  test("stump matches a brute-force split search on the fixture lineitem") {
    val labeled = graft.Tables.lineitem(spark, sfDir).select(
      round(col("l_extendedprice") * 100).cast("long").as("f"),
      when(col("l_returnflag") === lit("R"), 1L).otherwise(0L).as("y"))
    val rows = labeled.collect().map(r => (r.getLong(0), r.getLong(1)))
    val grouped = rows.groupBy(_._1).map { case (f, g) =>
      (f, g.length.toLong, g.map(_._2).sum)
    }.toArray.sortBy(_._1)
    val n = grouped.map(_._2).sum
    val p = grouped.map(_._3).sum
    var nl = 0L
    var pl = 0L
    var best = (Long.MaxValue, Long.MaxValue) // (err, threshold)
    grouped.foreach { case (f, cnt, pos) =>
      nl += cnt; pl += pos
      if (nl < n) {
        val err = math.min(pl, nl - pl) +
          math.min(p - pl, (n - nl) - (p - pl))
        if (err < best._1 || (err == best._1 && f < best._2))
          best = (err, f)
      }
    }
    val r = MlOps.decisionStump(labeled).head()
    assert(r.getLong(0) == best._2, s"threshold ${r.getLong(0)} vs $best")
    assert(r.getLong(1) == best._1, s"err ${r.getLong(1)} vs $best")
  }

  test("stump apply: perfect confusion matrix on separable data") {
    import spark.implicits._
    val labeled = Seq((10L, 0L), (20L, 0L), (30L, 1L), (40L, 1L), (50L, 1L))
      .toDF("f", "y")
    val r = MlOps.stumpApply(labeled).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 0L) // tp, fp
    assert(r.getLong(2) == 2L && r.getLong(3) == 0L) // tn, fn
    assert(r.getDouble(4) == 1.0)
  }

  test("stump apply misclassifications equal the training err on lineitem") {
    val labeled = graft.Tables.lineitem(spark, sfDir).select(
      round(col("l_extendedprice") * 100).cast("long").as("f"),
      when(col("l_returnflag") === lit("R"), 1L).otherwise(0L).as("y"))
    val err = MlOps.decisionStump(labeled).head().getLong(1)
    val cm = MlOps.stumpApply(labeled).head()
    // majority-class predictions per side make fp + fn == err by
    // construction; this ties the applied model back to the search
    assert(cm.getLong(1) + cm.getLong(3) == err)
  }

  test("stump plan has no global sort: cumsum windows are shard-local") {
    import spark.implicits._
    val labeled = Seq((1L, 0L), (2L, 1L)).toDF("f", "y")
    val plan = MlOps.decisionStump(labeled)
      .queryExecution.executedPlan.toString
    // the only acceptable top-level ordering is the TakeOrdered argmin
    assert(!plan.contains("Exchange rangepartitioning"),
      s"global sort leaked into the stump plan:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  // ---- graph_label_prop -------------------------------------------------

  test("min-label propagation carries the k-hop minimum on a path graph") {
    import spark.implicits._
    // path 1-2-3-...-10: after 4 rounds node v holds min(1, v-4)
    val und = (1L to 9L).map(i => (i, i + 1)).toDF("a", "b")
    val labs = GraphOps.minLabelProp(und).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 10L).foreach { v =>
      val expected = math.max(1L, v - GraphOps.LabelPropIters)
      assert(labs(v) == expected, s"node $v: ${labs(v)} != $expected")
    }
  }

  test("min-label propagation never crosses components") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L)).toDF("a", "b")
    val labs = GraphOps.minLabelProp(und).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(labs(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(labs(_) == 10L))
  }

  test("modularity is exact on a known two-community graph") {
    import spark.implicits._
    // two triangles-less paths: communities {1,2,3} and {10,11,12},
    // m = 4, within = 2 each, deg_sum = 4 each ->
    // q_num = 4*4*2 - 16 = 16 per community, q_den = 64, Q = 0.5
    val und = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L)).toDF("a", "b")
    val rows = GraphOps.modularityOf(und).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(rows.keySet == Set(1L, 10L))
    rows.values.foreach { case (nNodes, within, degSum, qNum, qDen) =>
      assert(nNodes == 3L && within == 2L && degSum == 4L)
      assert(qNum == 16L && qDen == 64L)
    }
    assert(rows.values.map(_._4).sum.toDouble / 64.0 == 0.5)
  }

  test("label propagation emits one row per node of the transition graph") {
    val out = GraphOps.labelPropagation(graft.Tables.events(spark, sfDir))
    val nodes = out.select("node").distinct().count()
    assert(out.count() == nodes && nodes > 0)
    // labels are always <= the node id (min-fold can only shrink)
    assert(out.filter(col("lab") > col("node")).count() == 0)
  }
}
