package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at-or-before each left ts") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L), // before any right row
      (1L, ts("2024-01-01 10:05:00"), 101L), // equal-ts tie: right visible
      (1L, ts("2024-01-01 10:30:00"), 102L), // after both right rows
      (2L, ts("2024-01-01 09:00:00"), 200L)  // key with no right rows
    ).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 10:05:00"), 900L, 5.0),
      (1L, ts("2024-01-01 10:10:00"), 901L, 7.0)
    ).toDF("user_id", "ts", "purchase_id", "purchase_value")

    val out = TemporalJoins.asofJoin(left, right, "user_id", "ts",
        Seq("purchase_id", "purchase_value"))
      .select($"event_id", $"purchase_id")
      .as[(Long, Option[Long])].collect().toMap

    assert(out(100L).isEmpty)
    assert(out(101L).contains(900L)) // inclusive at equal ts
    assert(out(102L).contains(901L)) // latest, not first
    assert(out(200L).isEmpty)
  }

  test("rangeJoinBucketed matches (ts, ts+W] exactly across bucket edges") {
    val w = 10L * 60 * 1000000 // 10 min
    val left = Seq((1L, ts("2024-01-01 10:07:00"), 1L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 10:07:00"), 1.0),  // equal ts: excluded (strict >)
      (1L, ts("2024-01-01 10:09:59"), 2.0),  // same bucket
      (1L, ts("2024-01-01 10:16:59"), 4.0),  // next bucket, in range
      (1L, ts("2024-01-01 10:17:00"), 8.0),  // exactly ts+W: included
      (1L, ts("2024-01-01 10:17:01"), 16.0), // past window
      (2L, ts("2024-01-01 10:08:00"), 32.0)  // other key
    ).toDF("user_id", "ts", "value")

    val out = TemporalJoins.rangeJoinBucketed(left, right, "user_id", "ts",
        w, "event_id",
        Seq(count(col("__m")).as("n"),
          sum(col("__m").getField("value")).as("s")))
      .select($"n", $"s").as[(Long, Double)].collect().toSeq
    assert(out == Seq((3L, 14.0)))
  }

  test("rangeJoinBucketed keeps zero-match left rows") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 1L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq((1L, ts("2024-01-01 11:00:00"), 1.0))
      .toDF("user_id", "ts", "value")
    val out = TemporalJoins.rangeJoinBucketed(left, right, "user_id", "ts",
        60L * 1000000, "event_id", Seq(count(col("__m")).as("n")))
      .select($"n").as[Long].collect().toSeq
    assert(out == Seq(0L))
  }

  test("custom AsofJoinExec matches the union+window formulation") {
    val composed = TemporalJoins.asofClickPurchase(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val exec = TemporalJoins.asofExecClickPurchase(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(exec == composed)
    assert(exec.nonEmpty)

    val plan = TemporalJoins.asofExecClickPurchase(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"custom exec missing:\n$plan")
  }

  test("AsofJoinExec handles ties, empty right groups, and copies state") {
    val left = Seq(
      (1L, ts("2024-01-01 10:05:00"), 101L),
      (1L, ts("2024-01-01 10:30:00"), 102L),
      (2L, ts("2024-01-01 09:00:00"), 200L),
      (3L, ts("2024-01-01 09:00:00"), 300L)
    ).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 10:05:00"), 900L),
      (1L, ts("2024-01-01 10:10:00"), 901L),
      (3L, ts("2024-01-01 08:00:00"), 903L)
    ).toDF("user_id", "ts", "purchase_id")
    val out = graft.plans.AsofJoin(left, right, "user_id", "ts",
        Seq("purchase_id"))
      .select($"event_id", $"purchase_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(101L).contains(900L)) // tie at equal ts is inclusive
    assert(out(102L).contains(901L)) // latest wins
    assert(out(200L).isEmpty)        // key with no right rows
    assert(out(300L).contains(903L)) // earlier right row carries forward
  }

  test("AsofJoinExec: NULL keys/ts never match (SQL comparison semantics)") {
    val left = Seq(
      (Some(1L), Some(ts("2024-01-01 10:30:00")), 101L),
      (None: Option[Long], Some(ts("2024-01-01 10:30:00")), 102L), // null key
      (Some(1L), None: Option[Timestamp], 103L)                    // null ts
    ).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00")), 900L),
      (None: Option[Long], Some(ts("2024-01-01 09:00:00")), 901L), // null key
      (Some(1L), None: Option[Timestamp], 902L)                    // null ts
    ).toDF("user_id", "ts", "purchase_id")
    val out = graft.plans.AsofJoin(left, right, "user_id", "ts",
        Seq("purchase_id"))
      .select($"event_id", $"purchase_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(101L).contains(900L)) // null right rows skipped, not joined
    assert(out(102L).isEmpty)        // null left key: no match
    assert(out(103L).isEmpty)        // null left ts: no match
  }

  test("AsofJoinExec breaks duplicate (key, ts) ties like the composed form") {
    val left = Seq((1L, ts("2024-01-01 10:30:00"), 101L))
      .toDF("user_id", "ts", "event_id")
    // three right rows at the SAME (key, ts): max payload must win,
    // in both formulations, on every rerun
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 902L),
      (1L, ts("2024-01-01 10:00:00"), 907L),
      (1L, ts("2024-01-01 10:00:00"), 905L)
    ).toDF("user_id", "ts", "purchase_id").repartition(3)
    val exec = graft.plans.AsofJoin(left, right, "user_id", "ts",
        Seq("purchase_id"))
      .select($"purchase_id").as[Long].collect().toSeq
    val composed = TemporalJoins.asofJoin(left, right, "user_id", "ts",
        Seq("purchase_id"))
      .select($"purchase_id").as[Long].collect().toSeq
    assert(exec == Seq(907L))
    assert(composed == Seq(907L))
  }

  test("bucketed range join plans as an equi-join, not a nested loop") {
    val df = TemporalJoins.rangeSignupActivity(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"range join degraded to NLJ:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("asof plan is a single shuffle (no range blow-up join)") {
    val ev = graft.Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val df = TemporalJoins.asofJoin(clicks, purchases, "user_id", "ts",
      Seq("purchase_id"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"unexpected NLJ:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("asofNearest picks min |gap|, ties backward, respects tolerance") {
    import org.apache.spark.sql.functions._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // click 1: purchases at -60s and +50s -> forward wins on |gap|
    // click 2: purchases at -40s and +40s -> tie -> backward wins
    // click 3: nearest purchase is 2h away -> outside +-1h -> nulls
    val clicks = Seq((1L, ts(1000), 101L), (2L, ts(5000), 102L),
      (3L, ts(9000), 103L)).toDF("user_id", "ts", "event_id")
    val purch = Seq(
      (1L, ts(940), 201L, 1.0), (1L, ts(1050), 202L, 2.0),
      (2L, ts(4960), 203L, 3.0), (2L, ts(5040), 204L, 4.0),
      (3L, ts(9000 + 7200), 205L, 5.0)
    ).toDF("user_id", "ts", "purchase_id", "purchase_value")
    val out = TemporalJoins.asofNearest(clicks, purch, "user_id", "ts",
        TemporalJoins.NearestTolMicros, "event_id",
        Seq("purchase_id", "purchase_value"))
      .select("event_id", "gap_us", "purchase_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(_._1)
    assert(out(0) == ((101L, Some(-50L * 1000000L), Some(202L))))
    assert(out(1) == ((102L, Some(40L * 1000000L), Some(203L))))
    assert(out(2) == ((103L, None, None)))
  }
}
