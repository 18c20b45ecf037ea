package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DataSourceV2 connector for fixed-length binary record files — the
  * Spark-native port of the reference's custom Hadoop input format
  * (`apps/terasort/TeraInputFormat.scala:47-113`: fixed 100-byte records,
  * splits aligned to record boundaries, file listing sorted by path).
  *
  * {{{
  * spark.read.format("graft-fixed")
  *   .option("keyLen", 10).option("valueLen", 90)
  *   .load(dir)              // => DataFrame[key: binary, value: binary]
  * }}}
  *
  * Design for scale:
  *  - splits are byte ranges of `splitSize` rounded to whole records, so
  *    a 100 TB directory fans out to ~800k independent tasks with no
  *    driver-side record handling;
  *  - column pruning is pushed into the reader ([[SupportsPushDownRequiredColumns]]):
  *    a key-only projection (the terasort validate shape) never
  *    materializes value bytes;
  *  - file order is path-sorted, matching the reference's contract that
  *    partition order follows file order (global-order validation).
  */
class FixedRecordSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-fixed"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FixedRecordSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FixedRecordTable(new CaseInsensitiveStringMap(properties))
}

object FixedRecordSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = false),
    StructField("value", BinaryType, nullable = false)))

  val DefaultKeyLen = 10
  val DefaultValueLen = 90
  val DefaultSplitSize: Long = 128L * 1024 * 1024

  /** Shared data-file listing (path-sorted, staging/underscore files
    * skipped) — both the record scan and the metadata-only count scan
    * must see exactly the same file set.
    */
  private[sources] def listDataFiles(path: String): Array[org.apache.hadoop.fs.FileStatus] = {
    val p = new Path(path)
    // the session's Hadoop conf, not a bare Configuration — spark.hadoop.*
    // (s3a credentials, HA nameservices, ...) must reach the filesystem
    val fs = p.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).filter(_.isFile)
        .filterNot(f => f.getPath.getName.startsWith("_") ||
          f.getPath.getName.startsWith(".")) // "." = in-progress staging
        .sortBy(_.getPath.toString)
    else Array(fs.getFileStatus(p))
  }
}

final class FixedRecordTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = "graft-fixed:" + options.get("path")
  override def schema(): StructType = FixedRecordSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(opts.asCaseSensitiveMap())
    new FixedRecordScanBuilder(new CaseInsensitiveStringMap(merged))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val schema = info.schema()
    require(schema.length == 2 &&
        schema.forall(_.dataType == BinaryType),
      s"graft-fixed writes (binary, binary) rows, got ${schema.simpleString}")
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-fixed: missing path"))
    val keyLen = options.getInt("keyLen", FixedRecordSource.DefaultKeyLen)
    val valueLen = options.getInt("valueLen", FixedRecordSource.DefaultValueLen)
    val queryId = info.queryId()
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new FixedRecordBatchWrite(path,
          queryId, keyLen, valueLen,
          new SerializableConfiguration(
            SparkSession.active.sparkContext.hadoopConfiguration))
      }
    }
  }
}

/** Batch write with job-level atomicity: every task streams its rows
  * into a job-scoped hidden staging directory
  * (`<path>/.staging-<queryId>/`, invisible to the reader), and the
  * final part names only appear when [[FixedRecordBatchWrite.commit]]
  * renames the staged files listed in the task commit messages into the
  * target directory. A job that fails after some tasks committed leaves
  * nothing visible (abort deletes the staging dir), and a retried write
  * re-stages from scratch instead of appending duplicate part files
  * next to survivors. Task attempts are arbitrated by Spark's commit
  * coordinator (useCommitCoordinator defaults to true), so exactly one
  * attempt per partition contributes a commit message. Final names
  * carry the write's queryId, so successive appends from different
  * queries cannot clobber each other. Row byte lengths are validated
  * against keyLen/valueLen at write time — the fixed-length contract
  * the reader will enforce later.
  */
final class FixedRecordBatchWrite(path: String, queryId: String,
    keyLen: Int, valueLen: Int, conf: SerializableConfiguration)
    extends BatchWrite {

  private val stagingDir = new Path(path, s".staging-$queryId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    FixedRecordWriterFactory(path, queryId, keyLen, valueLen, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = stagingDir.getFileSystem(conf.value)
    messages.foreach {
      case StagedFile(name) =>
        val from = new Path(stagingDir, name)
        val to = new Path(path, name)
        require(fs.rename(from, to),
          s"graft-fixed: publish $from -> $to failed")
      case other =>
        throw new IllegalStateException(s"unexpected commit message $other")
    }
    fs.delete(stagingDir, true)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = stagingDir.getFileSystem(conf.value)
    fs.delete(stagingDir, true)
    ()
  }
}

/** Task commit message: staged part-file name awaiting job-level publish. */
final case class StagedFile(name: String) extends WriterCommitMessage

/** Standalone (serializable) factory — must not capture the BatchWrite. */
final case class FixedRecordWriterFactory(path: String, queryId: String,
    keyLen: Int, valueLen: Int, conf: SerializableConfiguration)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val partName = f"part-$partitionId%05d-$taskId-$queryId"
      private val stagingDir = new Path(path, s".staging-$queryId")
      // .inprogress suffix: a task attempt that dies mid-write leaves a
      // name the job commit never publishes (messages only name files
      // whose task commit renamed them)
      private val inprogress = new Path(stagingDir, s".$partName.inprogress")
      private val staged = new Path(stagingDir, partName)
      private val fs = stagingDir.getFileSystem(conf.value)
      private val out = fs.create(inprogress, true)

      override def write(row: InternalRow): Unit = {
        val k = row.getBinary(0)
        val v = row.getBinary(1)
        require(k.length == keyLen && v.length == valueLen,
          s"graft-fixed: row bytes (${k.length}, ${v.length}) != " +
            s"configured ($keyLen, $valueLen)")
        out.write(k)
        out.write(v)
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        require(fs.rename(inprogress, staged),
          s"graft-fixed: rename $inprogress -> $staged failed")
        StagedFile(partName)
      }
      override def abort(): Unit = {
        out.close()
        fs.delete(inprogress, false)
        ()
      }
      override def close(): Unit = ()
    }
}

final class FixedRecordScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var required: StructType = FixedRecordSource.fullSchema
  private var pushedCountStar = false

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COUNT(*) answered from the FILE LISTING alone: fixed-length records
    * make row count a pure function of byte length (len / recordLen —
    * the same invariant the split planner already requires), so a global
    * count over 100 TB touches zero data bytes and runs in listing time.
    * Only the bare global COUNT(*) shape is accepted; anything else
    * (group-bys, other aggregates, counts of a column) scans normally.
    * Counts are EXACT, so the pushdown is complete — Spark plans no
    * re-aggregation on top.
    */
  override def pushAggregation(agg: Aggregation): Boolean = {
    val ok = agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions.head.isInstanceOf[CountStar]
    if (ok) pushedCountStar = true
    ok
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions.head.isInstanceOf[CountStar]

  override def build(): Scan = {
    val keyLen = options.getInt("keyLen", FixedRecordSource.DefaultKeyLen)
    val valueLen = options.getInt("valueLen", FixedRecordSource.DefaultValueLen)
    val split = options.getLong("splitSize", FixedRecordSource.DefaultSplitSize)
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-fixed: missing path"))
    if (pushedCountStar)
      new FixedRecordCountScan(path, keyLen + valueLen)
    else
      new FixedRecordScan(path, keyLen, valueLen, split, required)
  }
}

/** The metadata-only scan a pushed-down global COUNT(*) builds: the
  * pushdown is COMPLETE (counts from file lengths are exact, Spark
  * plans no re-aggregation), so the scan emits exactly ONE row holding
  * the directory total, summed from the listing at plan time — no file
  * is ever opened.
  */
final class FixedRecordCountScan(path: String, recordLen: Int)
    extends Scan with Batch {

  override def readSchema(): StructType = StructType(Seq(
    StructField("count_star", org.apache.spark.sql.types.LongType,
      nullable = false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-fixed COUNT(*) metadata-only pushdown path=$path record=$recordLen"

  override def planInputPartitions(): Array[InputPartition] = {
    val total = FixedRecordSource.listDataFiles(path).map { f =>
      require(f.getLen % recordLen == 0,
        s"${f.getPath}: length ${f.getLen} not a multiple of record length $recordLen")
      f.getLen / recordLen
    }.sum
    Array(FixedRecordCountPartition(total))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    FixedRecordCountReaderFactory
}

final case class FixedRecordCountPartition(count: Long) extends InputPartition

object FixedRecordCountReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val n = partition.asInstanceOf[FixedRecordCountPartition].count
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = if (emitted) false else { emitted = true; true }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](n))
      override def close(): Unit = ()
    }
  }
}

final class FixedRecordScan(path: String, keyLen: Int, valueLen: Int,
    splitSize: Long, required: StructType) extends Scan with Batch
    with SupportsReportStatistics {

  private val recordLen = keyLen + valueLen

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-fixed path=$path record=$recordLen cols=${required.fieldNames.mkString(",")}"

  /** EXACT stats from the listing (fixed-length records: rows =
    * bytes / recordLen) — without this a DSv2 relation reports
    * `defaultSizeInBytes` (effectively infinite), so a kilobyte-sized
    * dimension table written graft-fixed would never qualify for a
    * broadcast join. With it, Catalyst's autoBroadcastJoinThreshold
    * sees the true size and picks BHJ over SMJ by itself — the join
    * planning a 100 TB fact ⋈ small-dim pipeline depends on.
    */
  override def estimateStatistics(): Statistics = {
    val bytes = FixedRecordSource.listDataFiles(path).map(_.getLen).sum
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes / recordLen)
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    // the session's Hadoop conf, not a bare Configuration — spark.hadoop.*
    // (s3a credentials, HA nameservices, ...) must reach the filesystem
    val fs = p.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile)
          .filterNot(f => f.getPath.getName.startsWith("_") ||
            f.getPath.getName.startsWith(".")) // "." = in-progress staging
          .sortBy(_.getPath.toString)
      else Array(fs.getFileStatus(p))
    // whole-record-aligned byte ranges; one reader never straddles files
    val alignedSplit = math.max(recordLen.toLong,
      splitSize / recordLen * recordLen)
    files.flatMap { f =>
      val len = f.getLen
      require(len % recordLen == 0,
        s"${f.getPath}: length $len not a multiple of record length $recordLen")
      (0L until len by alignedSplit).map { start =>
        FixedRecordPartition(f.getPath.toString, start,
          math.min(alignedSplit, len - start))
      }
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FixedRecordReaderFactory(keyLen, valueLen, required.fieldNames,
      new org.apache.spark.util.SerializableConfiguration(
        SparkSession.active.sparkContext.hadoopConfiguration))
}

final case class FixedRecordPartition(file: String, start: Long, length: Long)
    extends InputPartition

final class FixedRecordReaderFactory(keyLen: Int, valueLen: Int,
    columns: Array[String],
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[FixedRecordPartition]
    val recordLen = keyLen + valueLen
    new PartitionReader[InternalRow] {
      private val p = new Path(part.file)
      private val in = p.getFileSystem(conf.value).open(p)
      in.seek(part.start)
      private var remaining = part.length / recordLen
      private val buf = new Array[Byte](recordLen)
      private var row: InternalRow = _

      override def next(): Boolean = {
        if (remaining <= 0) return false
        in.readFully(buf)
        remaining -= 1
        // prune at the reader: only requested columns are materialized
        val values = columns.map {
          case "key" => java.util.Arrays.copyOfRange(buf, 0, keyLen): Any
          case "value" => java.util.Arrays.copyOfRange(buf, keyLen, recordLen): Any
          case c => throw new IllegalArgumentException(s"unknown column $c")
        }
        row = new GenericInternalRow(values)
        true
      }

      override def get(): InternalRow = row
      override def close(): Unit = in.close()
    }
  }
}
