package graft.queries

import graft.SparkSpec

/** Semantics of the round-4 relational analytics: ordered funnel and
  * weekly cohort retention (both oracle-checked end-to-end by the gate;
  * these specs pin the invariants the hash alone doesn't explain).
  */
class CohortFunnelSpec extends SparkSpec {
  import spark.implicits._

  test("funnel: one row per user, stage times strictly ordered, depth consistent") {
    val rows = Relational.q29Funnel(spark, sfDir)
      .select("user_id", "t_view", "t_click", "t_purchase", "funnel_depth")
      .as[(Long, Option[java.sql.Timestamp], Option[java.sql.Timestamp],
        Option[java.sql.Timestamp], Int)]
      .collect()
    val nUsers = graft.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(rows.length == nUsers)
    rows.foreach { case (u, v, c, p, d) =>
      // a stage can only be entered after the previous one
      assert(c.isEmpty || v.nonEmpty, s"user $u: click without view")
      assert(p.isEmpty || c.nonEmpty, s"user $u: purchase without click")
      for (tv <- v; tc <- c) assert(tc.after(tv), s"user $u: click <= view")
      for (tc <- c; tp <- p) assert(tp.after(tc), s"user $u: purchase <= click")
      val expected = if (p.nonEmpty) 3 else if (c.nonEmpty) 2 else if (v.nonEmpty) 1 else 0
      assert(d == expected, s"user $u depth")
    }
    // the funnel is monotone: stage populations can only shrink
    val d1 = rows.count(_._5 >= 1); val d2 = rows.count(_._5 >= 2); val d3 = rows.count(_._5 >= 3)
    assert(d1 >= d2 && d2 >= d3)
    assert(d1 > 0, "fixture has at least one view")
  }

  test("bag set ops: intersect-all multiplicity = min of the side counts") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val orders = graft.Tables.orders(spark, sfDir)
    val nBig = orders.filter(col("o_totalprice") > 250000.0)
      .groupBy("o_custkey").agg(count(lit(1))).as[(Long, Long)].collect().toMap
    val nUrg = orders.filter(col("o_orderpriority") === "1-URGENT")
      .groupBy("o_custkey").agg(count(lit(1))).as[(Long, Long)].collect().toMap
    val out = Relational.q36BagSetOps(spark, sfDir)
      .as[(Long, String, Long)].collect()
    assert(out.nonEmpty)
    out.foreach {
      case (k, "both_all", m) =>
        assert(m == math.min(nBig(k), nUrg.getOrElse(k, 0L)), s"cust $k")
      case (k, "big_only_all", m) =>
        assert(m == nBig(k) - math.min(nBig(k), nUrg.getOrElse(k, 0L)), s"cust $k")
      case other => fail(s"unexpected row $other")
    }
  }

  test("first/last/nth window: explicit frame semantics hold per user") {
    import org.apache.spark.sql.functions.col
    val rows = Relational.q35FirstLast(spark, sfDir)
      .select("user_id", "first_value", "running_last", "second_value")
      .as[(Long, Double, Double, Option[Double])].collect()
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, rs) =>
      assert(rs.map(_._2).distinct.length == 1, s"user $u first_value constant")
      // exactly one row per user (the first) lacks a second value
      assert(rs.count(_._4.isEmpty) == (if (rs.length >= 1) 1 else 0), s"user $u")
    }
  }

  test("retention: offsets non-negative, cohort cells partition the active pairs") {
    val cells = Relational.q30Retention(spark, sfDir)
      .as[(String, Long, Long)].collect()
    assert(cells.nonEmpty)
    assert(cells.forall(_._2 >= 0), "no activity before a user's cohort week")
    // every user contributes exactly one offset-0 cell membership
    val offset0Users = cells.filter(_._2 == 0).map(_._3).sum
    val nUsers = graft.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(offset0Users == nUsers, "each user is active in their cohort week")
    // total cell mass = distinct (user, week) pairs
    val totalPairs = cells.map(_._3).sum
    val distinctPairs = graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "date_trunc('week', ts) AS w").distinct().count()
    assert(totalPairs == distinctPairs)
  }
}
