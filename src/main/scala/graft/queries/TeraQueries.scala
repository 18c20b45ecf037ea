package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.tera.{TeraGen, TeraSort, TeraValidate}

/** Driver-facing wrapper for the sort-benchmark pipeline: generate →
  * total-sort → validate, scaled by the test scale factor (sf0.1 → 1M
  * records = 100 MB). The result is a deterministic one-row summary
  * (the golden checksum is locked by TeraSuiteSpec); there is no SQL
  * oracle because the input is generated, not a table.
  */
object TeraQueries {

  /** Records to generate for a given sf dir: sf * 10^7 (min 10k). */
  def recordsFor(dir: String): Long = {
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(dir)
      .map(_.group(1).toDouble).getOrElse(0.001)
    math.max(10000L, (sf * 1e7).toLong)
  }

  def teraPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = recordsFor(dir)
    // spill-aware sizing: keep each sort partition under ~64 MB of raw
    // records so the per-task working set fits executor memory at any
    // scale (empirically: 10 GB / 128 partitions OOMs an 8g heap; /512
    // sails through)
    val parts = math.max(
      s.sparkContext.defaultParallelism,
      (n * TeraGen.RecordLen / (64L << 20)).toInt + 1)
    // the TPCx-HS-style protocol (reference apps/terasort/run.sh `for i
    // in seq 1 2`): TWO consecutive timed gen+sort+validate runs, each
    // reported as SF-per-hour with SF = bytes/10^10. TPCx-HS designates
    // the run with the LOWER metric as the performance run, so
    // hsph_at_sf carries min(run1, run2) and both raw values ride along
    def timedRun(): (TeraValidate.Result, Double) = {
      val t0 = System.nanoTime()
      val sorted = TeraSort.generateAndSort(s, n, parts)
      val r = TeraValidate.validate(sorted)
      (r, (System.nanoTime() - t0) / 3.6e12)
    }
    val (r1, h1) = timedRun()
    val (r2, h2) = timedRun()
    require(r1.checksumHex == r2.checksumHex && r1.records == r2.records,
      s"non-deterministic tera pipeline: run1=${r1.checksumHex} " +
        s"run2=${r2.checksumHex}")
    val r = if (h1 >= h2) r1 else r2 // the slower = performance run
    val sf = n * TeraGen.RecordLen / 1e10
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    Seq((r.records, r.checksumHex,
        r1.partitionsSorted && r2.partitionsSorted,
        r1.boundariesOrdered && r2.boundariesOrdered,
        r4(sf), r4(sf / h1), r4(sf / h2), r4(sf / math.max(h1, h2))))
      .toDF("records", "checksum", "partitions_sorted", "boundaries_ordered",
        "hs_sf", "hsph_run1", "hsph_run2", "hsph_at_sf")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tera_sort_validate" -> teraPipeline _
  )

  val oracles: Map[String, String] = Map.empty
}
