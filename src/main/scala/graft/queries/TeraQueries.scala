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
    // the TPCx-HS-style protocol (reference apps/terasort/run.sh): time
    // gen+sort+validate end to end, SF = bytes/10^10, report SF per hour
    val t0 = System.nanoTime()
    val sorted = TeraSort.generateAndSort(s, n, parts)
    val r = TeraValidate.validate(sorted)
    val hours = (System.nanoTime() - t0) / 3.6e12
    val sf = n * TeraGen.RecordLen / 1e10
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    Seq((r.records, r.checksumHex, r.partitionsSorted, r.boundariesOrdered,
        r4(sf), r4(sf / hours)))
      .toDF("records", "checksum", "partitions_sorted", "boundaries_ordered",
        "hs_sf", "hsph_at_sf")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tera_sort_validate" -> teraPipeline _
  )

  val oracles: Map[String, String] = Map.empty
}
