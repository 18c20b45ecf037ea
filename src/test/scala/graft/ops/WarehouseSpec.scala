package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Warehouse maintenance operators: SCD2 interval invariants, CDC merge
  * semantics, and the one-shuffle plan claim of the SCD2 build.
  */
class WarehouseSpec extends SparkSpec {

  test("scd2 intervals chain per key and never repeat a status") {
    val rows = Warehouse.scd2(graft.Tables.orders(spark, sfDir))
      .orderBy("o_custkey", "version").collect()
    val byKey = rows.groupBy(_.getLong(0))
    byKey.foreach { case (k, hist) =>
      val sorted = hist.sortBy(_.getLong(1))
      // versions are 1..n dense
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq,
        s"non-dense versions for $k")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // interval chain: this version closes exactly where next opens
          assert(a.getString(4) == b.getString(3),
            s"gap/overlap for $k: ${a.getString(4)} vs ${b.getString(3)}")
          // a change row means the status actually changed
          assert(a.getString(2) != b.getString(2),
            s"consecutive duplicate status for $k")
        case _ => ()
      }
      // only the last version is open-ended
      assert(sorted.last.getString(4) == "9999-12-31 00:00:00")
      assert(sorted.init.forall(_.getString(4) != "9999-12-31 00:00:00"))
    }
  }

  test("scd2 plans a single shuffle: both windows share one partitioning") {
    val plan = Warehouse.scd2(graft.Tables.orders(spark, sfDir))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$plan")
  }

  test("cdc merge deletes, updates, and passes through correctly") {
    val base = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice").cache()
    val merged = Warehouse.cdcApply(spark, sfDir)
      .select("o_orderkey", "o_totalprice").cache()
    val baseMap = base.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val outMap = merged.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    baseMap.foreach { case (k, price) =>
      k % 10 match {
        case 3 => assert(!outMap.contains(k), s"delete survived: $k")
        case r if r <= 2 =>
          assert(math.abs(outMap(k) - (price + 100.0)) < 0.011,
            s"update not applied: $k")
        case _ =>
          assert(math.abs(outMap(k) - price) < 0.011,
            s"pass-through changed: $k")
      }
    }
    // nothing invented: merged keys = base keys minus deletes
    assert(outMap.keySet == baseMap.keySet.filterNot(_ % 10 == 3))
    base.unpersist(); merged.unpersist()
  }

  test("compaction collapses 64 ingest fragments to the size-targeted " +
    "file count without a shuffle and without changing a row") {
    val root = java.nio.file.Files.createTempDirectory("graft_compact_spec")
    val fragDir = root.resolve("frag").toString
    val outDir = root.resolve("out").toString
    val ev = graft.Tables.events(spark, sfDir)
    ev.repartition(64).write.mode("overwrite").parquet(fragDir)
    assert(Warehouse.dataFileCount(spark, fragDir) == 64)
    val planned = Warehouse.compact(spark, fragDir, outDir)
    assert(planned == 1, s"fixture table must bin-pack to one file")
    assert(Warehouse.dataFileCount(spark, outDir) == 1)
    // the rewrite plan is shuffle-free: coalesce, never an Exchange
    val rewritePlan = spark.read.parquet(fragDir).coalesce(1)
      .queryExecution.executedPlan.toString
    assert(!rewritePlan.contains("Exchange"),
      s"compaction rewrite must not shuffle:\n$rewritePlan")
    // value-invisible: every row survives exactly
    val before = ev.orderBy("event_id").collect()
    val after = spark.read.parquet(outDir).orderBy("event_id").collect()
    assert(before.sameElements(after), "compaction changed data")
  }
}
