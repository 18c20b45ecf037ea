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
