package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Bm25Index
import graft.sources.SnapshotTable

/** Round-14 compaction-cadence evidence: a maintained index must
  * survive an OPEN-ENDED churn stream without accumulating small-file
  * debt. Drives `PASSES` (default 120) corpus-churn + maintenance
  * cycles through [[Bm25Index]] twice — cadence ON (default conf) and
  * OFF — and records every `PASSES/6` passes: tf/dl file counts, the
  * maintenance pass time, and the search latency over the maintained
  * tables. With the cadence OFF both file counts grow O(passes) and
  * search inherits the fragment count; ON they saw-tooth under the
  * debt threshold and search stays flat. Confluence is audited at the
  * end of each run (diff must be 0 — compaction is layout-only).
  *
  * Run: runMain graft.IndexMaintenanceProbe   [PASSES=120] [DOCS=4000]
  */
object IndexMaintenanceProbe {
  import ProbeUtil.time

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val passes = sys.env.getOrElse("PASSES", "120").toInt
    val nDocs = sys.env.getOrElse("DOCS", "4000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Seq(("cadence_on", "24"), ("cadence_off", "0")).foreach {
      case (label, maxSmall) =>
        spark.conf.set("graft.index.compact.max.small", maxSmall)
        val b = java.nio.file.Files
          .createTempDirectory("graft_ixprobe").toString
        val corpusRoot = s"$b/corpus"
        val indexRoot = s"$b/ix"
        val docs = spark.range(0, nDocs).select(col("id").as("doc_id"),
          concat(lit("w"), col("id") % 500, lit(" common shared "),
            lit("t"), col("id") % 37).as("text"))
        SnapshotTable.commit(
          docs.repartitionByRange(8, col("doc_id")), corpusRoot,
          statsCol = Some("doc_id"))
        Bm25Index.buildBm25Index(spark, corpusRoot, indexRoot)
        def files(root: String): Int = SnapshotTable.fileList(spark, root,
          SnapshotTable.currentSnapshot(spark, root)).size
        val every = math.max(1, passes / 6)
        var maxTf = 0
        (1 to passes).foreach { i =>
          // churn: ~40 docs rewritten per pass (rolling window)
          SnapshotTable.merge(
            spark.range((i % 100) * 40L, (i % 100) * 40L + 40L)
              .select(col("id").as("doc_id"),
                concat(lit("rev"), lit(i), lit(" pass "),
                  col("id") % 11).as("text")),
            corpusRoot, "doc_id")
          val (_, maintSec) =
            time(Bm25Index.maintainBm25Index(spark, corpusRoot, indexRoot))
          maxTf = math.max(maxTf, files(Bm25Index.tfRoot(indexRoot)))
          if (i % every == 0 || i == passes) {
            val (n, searchSec) = time(
              Bm25Index.searchBm25Index(spark, corpusRoot, indexRoot)
                .count())
            println(f"[index-probe] $label%-11s pass=$i%4d " +
              f"tf_files=${files(Bm25Index.tfRoot(indexRoot))}%5d " +
              f"dl_files=${files(Bm25Index.dlRoot(indexRoot))}%5d " +
              f"maint=$maintSec%6.2fs search=$searchSec%6.2fs rows=$n%5d")
          }
        }
        val ((_, diff), auditSec) =
          time(Bm25Index.confluenceAudit(spark, corpusRoot, indexRoot))
        println(f"[index-probe] $label%-11s DONE passes=$passes " +
          f"max_tf_files=$maxTf%5d confluence_diff=$diff " +
          f"audit=$auditSec%6.1fs")
    }
    spark.conf.unset("graft.index.compact.max.small")
    spark.stop()
  }
}
