package graft.sources

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL/DataFrame-reader surface for [[SnapshotTable]] — time travel
  * without the library API:
  *
  * {{{
  * spark.read.format("graft-snap").load(root)                  // current
  * spark.read.format("graft-snap").option("snapshot", 3).load(root)
  * }}}
  *
  * The provider resolves the manifest ONCE at table-creation time (the
  * pinning contract: later commits never change what this frame sees)
  * and hands the resolved file list to Spark's own parquet `FileTable`
  * — so the scan is the stock vectorized parquet scan with filter/
  * column pushdown, partition planning, and whole-stage codegen; the
  * snapshot layer contributes exactly what it should, file pruning, and
  * nothing else. At 100 TB this is one manifest read of metadata on the
  * driver; no directory listing of `data/` ever happens.
  *
  * An unknown or expired snapshot id fails at load() time with the
  * [[SnapshotTable.fileList]] error, not with an empty scan.
  */
class SnapshotSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-snap"

  private def resolvedTable(options: CaseInsensitiveStringMap): ParquetTable = {
    val root = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-snap: .load(<table root>) is required"))
    val spark = SparkSession.active
    val id = Option(options.get("snapshot")).map(_.toLong)
      .getOrElse(SnapshotTable.currentSnapshot(spark, root))
    val files = SnapshotTable.fileList(spark, root, id).map(f => s"$root/$f")
    ParquetTable(s"graft-snap $root@v$id", spark, options, files,
      userSpecifiedSchema = None, classOf[ParquetFileFormat])
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolvedTable(options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    resolvedTable(new CaseInsensitiveStringMap(properties))
}

object SnapshotSource {

  /** Snapshot catalog listing — the metadata query a `VERSION AS OF`
    * user starts from: one row per live snapshot (id, file count), one
    * manifest-directory listing plus one manifest read per KEPT
    * snapshot, no data access.
    */
  def snapshots(s: SparkSession, root: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val mdir = new Path(root, "_manifests")
    val fs = mdir.getFileSystem(s.sparkContext.hadoopConfiguration)
    val ids =
      if (!fs.exists(mdir)) Seq.empty[Long]
      else fs.listStatus(mdir).iterator.map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
          n.stripPrefix("v").stripSuffix(".manifest").toLong }
        .toSeq.sorted
    import s.implicits._
    ids.map(id => (id, SnapshotTable.fileList(s, root, id).size.toLong))
      .toDF("snapshot_id", "n_files")
  }
}
