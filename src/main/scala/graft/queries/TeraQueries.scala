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
    val sorted = TeraSort.generateAndSort(s, n, parts)
    val r = TeraValidate.validate(sorted)
    Seq((r.records, r.checksumHex, r.partitionsSorted, r.boundariesOrdered))
      .toDF("records", "checksum", "partitions_sorted", "boundaries_ordered")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tera_sort_validate" -> teraPipeline _
  )

  val oracles: Map[String, String] = Map.empty
}
