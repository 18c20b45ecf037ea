package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** Round-13 manifest-shard evidence: commit cost must track the DELTA,
  * not the table. Builds snapshot tables of growing FILE COUNT (×1k /
  * ×4k / ×10k entries — the ~800k-file 100 TB table's shape, scaled to
  * what a local box writes in minutes), then measures at each size:
  *
  *  - single-file APPEND commit latency (median of 5) — the number
  *    that was O(files) under the flat manifest (every commit
  *    re-rendered one line per live file) and must now be FLAT;
  *  - the HEAD's size in bytes vs the total entry text (what the flat
  *    format would rewrite per commit) — the written-bytes ratio;
  *  - cold and warm full entry-list parse (readers still expand all
  *    shards; the immutable-shard cache amortizes repeat reads).
  *
  * Run: runMain graft.ManifestScaleProbe   [FILES_AXIS=1000,4000,10000]
  */
object ManifestScaleProbe {
  import ProbeUtil.time

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val axis = sys.env.getOrElse("FILES_AXIS", "1000,4000,10000")
      .split(",").map(_.trim.toInt).toSeq

    axis.foreach { n =>
      val root =
        java.nio.file.Files.createTempDirectory("graft_mprobe").toString + "/t"
      // build the table in 1k-file batches (each its own shard — the
      // streaming-ingest shape that accretes shards over time)
      val batch = 1000
      val (_, buildSec) = time {
        (0 until n / batch).foreach { i =>
          SnapshotTable.commit(
            spark.range(i.toLong * batch, (i + 1).toLong * batch)
              .select(col("id").as("k"), (col("id") * 7).as("v"))
              .repartitionByRange(batch, col("k")), // every partition
            // non-empty → the file count IS the axis label
            root, statsCol = Some("k"))
        }
      }
      val cur = SnapshotTable.currentSnapshot(spark, root)
      val fs = new Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      def headBytes(id: Long): Long =
        fs.getFileStatus(new Path(s"$root/_manifests/v$id.manifest")).getLen
      // what a FLAT manifest would rewrite per commit ≈ the total
      // entry text = every live shard's bytes (all are referenced
      // here) plus the head's own entry section
      val entryBytes = fs.listStatus(new Path(s"$root/_manifests"))
        .filter(_.getPath.getName.endsWith(".shard"))
        .map(_.getLen).sum
      // single-file append latency, median of 5
      val appends = (1 to 5).map { i =>
        time(SnapshotTable.commit(
          Seq((1000000L + i, 1L)).toDF("k", "v").coalesce(1),
          root, statsCol = Some("k")))._2
      }.sorted
      val newCur = SnapshotTable.currentSnapshot(spark, root)
      // reader cost: cold parse (fresh JVM state approximated by the
      // first call after the appends touched the head) vs warm cache
      val (files1, coldSec) = time(
        SnapshotTable.fileList(spark, root, newCur).size)
      val (_, warmSec) = time(
        SnapshotTable.fileList(spark, root, newCur).size)
      // MAINTAINED-NDV overhead: with the group on, every commit scans
      // its own new files once (O(delta)); the per-append premium must
      // be flat in the TABLE size
      val (_, ndvBuildSec) = time(
        SnapshotTable.buildNdvIndex(spark, root, "k"))
      val ndvAppends = (1 to 5).map { i =>
        time(SnapshotTable.commit(
          Seq((2000000L + i, 1L)).toDF("k", "v").coalesce(1),
          root, statsCol = Some("k")))._2
      }.sorted
      println(f"[manifest-probe] files=$n%6d build=$buildSec%7.1fs " +
        f"append_median=${appends(2)}%6.3fs " +
        f"head_bytes=${headBytes(newCur)}%8d " +
        f"flat_equiv_bytes=$entryBytes%10d " +
        f"list_cold=$coldSec%6.3fs list_warm=$warmSec%6.3fs " +
        f"n_listed=$files1%6d " +
        f"ndv_build=$ndvBuildSec%7.1fs " +
        f"ndv_append_median=${ndvAppends(2)}%6.3fs")
    }

    // ---- axis 2: MANY SMALL COMMITS (the per-minute streaming-sink
    // shape the round-13 verdict flagged: one delta shard per ~32
    // files accretes refs forever). With auto-fold ON the head's
    // ref count, line count, and cold fileList must stay FLAT as the
    // commit count grows; with fold OFF they grow O(commits/32) — the
    // contrast this axis records. Also times expire on the long
    // history (reclaim must be O(expired shards), not O(history)).
    val commitsAxis = sys.env.getOrElse("COMMITS_AXIS", "400,1600")
      .split(",").map(_.trim.toInt).toSeq
    Seq(("fold_on", "16"), ("fold_off", "0")).foreach {
      case (label, foldRefs) =>
        commitsAxis.foreach { m =>
          val root = java.nio.file.Files
            .createTempDirectory("graft_mprobe2").toString + "/t"
          spark.conf.set("graft.snapshot.manifest.fold.max.refs", foldRefs)
          val (_, buildSec) = time {
            (0 until m).foreach { i =>
              SnapshotTable.commit(
                Seq((i.toLong, i.toLong * 7)).toDF("k", "v").coalesce(1),
                root, statsCol = Some("k"))
            }
          }
          val fs = new Path(root).getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          val cur = SnapshotTable.currentSnapshot(spark, root)
          val head = {
            val p = new Path(s"$root/_manifests/v$cur.manifest")
            val in = fs.open(p)
            try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
              .map(_.trim).filter(_.nonEmpty).toSeq
            finally in.close()
          }
          val refs = head.count(_.startsWith("#shard "))
          val appends = (1 to 5).map { i =>
            time(SnapshotTable.commit(
              Seq((9000000L + i, 1L)).toDF("k", "v").coalesce(1),
              root, statsCol = Some("k")))._2
          }.sorted
          val (nFiles, coldSec) = time(
            SnapshotTable.fileList(spark, root,
              SnapshotTable.currentSnapshot(spark, root)).size)
          val (reclaim, expireSec) =
            time(SnapshotTable.expireSnapshots(spark, root, 1))
          println(f"[manifest-probe2] $label%-8s commits=$m%6d " +
            f"build=$buildSec%7.1fs head_lines=${head.size}%5d " +
            f"refs=$refs%4d append_median=${appends(2)}%6.3fs " +
            f"list_cold=$coldSec%6.3fs n_files=$nFiles%6d " +
            f"expire=${expireSec}%6.2fs expired_snaps=${reclaim._1}%5d")
        }
    }
    spark.conf.unset("graft.snapshot.manifest.fold.max.refs")
    spark.stop()
  }
}
