package graft.sources

import java.util
import org.apache.hadoop.conf.Configuration
import scala.language.existentials
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.example.data.Group
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-changelog` — a DataSource V2 micro-batch streaming source that
  * replays a parquet-backed changelog in monotone offset ranges.
  *
  * This is the in-repo stand-in for the reference's Oracle AQ/JMS dequeue
  * boundary (O10, jms_publisher.clj:169-194), redesigned for Spark's pull
  * model (SURVEY.md §1.3): instead of a push listener with ack/redelivery,
  * the source polls the changelog's max offset per trigger, plans the
  * (start, end] range as parallel partition reads, and relies on
  * checkpointed offsets for exactly-once range accounting — the same
  * replayable-source + checkpoint contract that replaces JMS no-ack
  * redelivery. Admission control (`maxRowsPerBatch`) mirrors the
  * reference's channel-buffer backpressure (jms_publisher.clj:207).
  *
  * Options: `path` (parquet file/dir), `offsetColumn` (monotone BIGINT,
  * default `event_id`), `valueColumn` (payload, default `props`),
  * `maxRowsPerBatch` (admission control, default unlimited),
  * `numPartitions` (range splits per batch, default 4).
  *
  * Emitted schema: (offset BIGINT, value STRING).
  */
class ChangelogSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-changelog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = ChangelogSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ChangelogTable(new CaseInsensitiveStringMap(properties))
}

object ChangelogSource {
  val Schema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("value", StringType)))

  /** List the parquet data files under `path` (or `path` itself). */
  def dataFiles(path: String): Seq[String] = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, new Configuration())
    if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).map(_.getPath).filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
    else Seq(path)
  }
}

final case class ChangelogConfig(path: String, offsetColumn: String, valueColumn: String,
                                 maxRowsPerBatch: Long, numPartitions: Int) extends Serializable

class ChangelogTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  private val cfg = ChangelogConfig(
    path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-changelog requires a 'path' option")),
    offsetColumn = options.getOrDefault("offsetColumn", "event_id"),
    valueColumn = options.getOrDefault("valueColumn", "props"),
    maxRowsPerBatch = options.getLong("maxRowsPerBatch", Long.MaxValue),
    numPartitions = options.getInt("numPartitions", 4))
  require(cfg.numPartitions >= 1,
    s"graft-changelog numPartitions must be >= 1, got ${cfg.numPartitions}")
  require(cfg.maxRowsPerBatch >= 1,
    s"graft-changelog maxRowsPerBatch must be >= 1, got ${cfg.maxRowsPerBatch}")

  override def name(): String = s"graft-changelog(${cfg.path})"
  override def schema(): StructType = ChangelogSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder { override def build(): Scan = new ChangelogScan(cfg) }
}

class ChangelogScan(cfg: ChangelogConfig) extends Scan {
  override def readSchema(): StructType = ChangelogSource.Schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ChangelogMicroBatchStream(cfg)
  override def toBatch: Batch = new Batch {
    private val bounds = ChangelogMicroBatchStream.offsetBounds(cfg)
    override def planInputPartitions(): Array[InputPartition] =
      ChangelogMicroBatchStream.splitRange(cfg, bounds._1 - 1, bounds._2)
    override def createReaderFactory(): PartitionReaderFactory = new ChangelogReaderFactory(cfg)
  }
}

/** Offset = highest replayed value of the offset column. */
case class ChangelogOffset(last: Long) extends Offset {
  override def json(): String = last.toString
}

object ChangelogMicroBatchStream {
  /** (min, max) of the offset column straight from parquet footer row-group
    * statistics — the micro-batch analogue of an AQ poll, touching only
    * metadata (no data pages, no SparkSession involvement). */
  def offsetBounds(cfg: ChangelogConfig): (Long, Long) = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    var mn = Long.MaxValue
    var mx = Long.MinValue
    ChangelogSource.dataFiles(cfg.path).foreach { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), new Configuration()))
      try {
        reader.getFooter.getBlocks.asScala.foreach { block =>
          block.getColumns.asScala
            .filter(_.getPath.toDotString == cfg.offsetColumn)
            .foreach { c =>
              val st = c.getStatistics
              require(st != null && st.hasNonNullValue,
                s"offset column ${cfg.offsetColumn} has no parquet statistics in $f")
              (st.genericGetMin, st.genericGetMax) match {
                case (lo: Number, hi: Number) =>
                  mn = math.min(mn, lo.longValue()); mx = math.max(mx, hi.longValue())
                case other =>
                  throw new IllegalArgumentException(
                    s"offset column ${cfg.offsetColumn} is not numeric: $other")
              }
            }
        }
      } finally reader.close()
    }
    if (mx == Long.MinValue) (0L, -1L) else (mn, mx)
  }

  /** Split (start, end] into up to numPartitions contiguous ranges. The
    * clamp to >= 1 guards a non-positive numPartitions reaching this from a
    * hand-built config: zero partitions would silently drop the batch while
    * the checkpoint advanced past it. */
  def splitRange(cfg: ChangelogConfig, start: Long, end: Long): Array[InputPartition] = {
    if (end <= start) return Array.empty
    val n = math.max(1L, math.min(cfg.numPartitions.toLong, end - start)).toInt
    val step = (end - start) / n
    (0 until n).map { i =>
      val lo = start + i * step
      val hi = if (i == n - 1) end else start + (i + 1) * step
      ChangelogInputPartition(lo, hi): InputPartition
    }.toArray
  }
}

class ChangelogMicroBatchStream(cfg: ChangelogConfig)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {
  import ChangelogMicroBatchStream._

  /** Fixed end offset for Trigger.AvailableNow: captured once so the run
    * drains exactly the log contents present at start, in rate-limited
    * batches, then stops. */
  @volatile private var availableNowEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(offsetBounds(cfg)._2)

  private def currentMax: Long = availableNowEnd.getOrElse(offsetBounds(cfg)._2)

  override def initialOffset(): Offset = ChangelogOffset(offsetBounds(cfg)._1 - 1)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(Offset, ReadLimit)")

  override def getDefaultReadLimit: ReadLimit =
    if (cfg.maxRowsPerBatch == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(cfg.maxRowsPerBatch)

  override def reportLatestOffset(): Offset = ChangelogOffset(currentMax)

  /** Advance at most maxRows offsets past `start` (offsets are dense enough
    * in a changelog that the offset delta bounds the row count). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[ChangelogOffset].last
    val avail = currentMax
    limit match {
      case mr: ReadMaxRows => ChangelogOffset(math.min(avail, from + mr.maxRows()))
      case _               => ChangelogOffset(avail)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    splitRange(cfg, start.asInstanceOf[ChangelogOffset].last, end.asInstanceOf[ChangelogOffset].last)

  override def createReaderFactory(): PartitionReaderFactory = new ChangelogReaderFactory(cfg)
  override def deserializeOffset(json: String): Offset = ChangelogOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class ChangelogInputPartition(lo: Long, hi: Long) extends InputPartition

class ChangelogReaderFactory(cfg: ChangelogConfig) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ChangelogInputPartition]
    new ChangelogPartitionReader(cfg, p.lo, p.hi)
  }
}

/** Executor-side reader: scans the parquet file(s) with the parquet-hadoop
  * Group API and emits rows with lo < offset <= hi. Row-group stats could
  * prune here; at this stand-in's scale a plain scan per range is fine and
  * keeps the code honest about where predicate pushdown would slot in.
  */
class ChangelogPartitionReader(cfg: ChangelogConfig, lo: Long, hi: Long)
    extends PartitionReader[InternalRow] {

  private val allFiles = ChangelogSource.dataFiles(cfg.path)
  private val files = allFiles.iterator
  private var reader: ParquetReader[Group] = _
  private var current: InternalRow = _

  /** The range filter is only valid for INT64 offset columns; INT32 falls
    * back to row-level filtering in next(). Sniffed per file — a changelog
    * dir may mix INT32 and INT64 offset columns across files, and applying
    * an INT64 filter to an INT32 file is a parquet type error. */
  private def offsetIsInt64(f: String): Boolean = {
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(f), new Configuration()))
    try {
      val schema = r.getFooter.getFileMetaData.getSchema
      schema.containsField(cfg.offsetColumn) &&
        schema.getType(schema.getFieldIndex(cfg.offsetColumn)).asPrimitiveType()
          .getPrimitiveTypeName ==
          org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64
    } finally r.close()
  }

  private def nextReader(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    if (!files.hasNext) return false
    // push the offset range down as a parquet filter: row groups and pages
    // whose statistics fall outside (lo, hi] are skipped without decoding
    import org.apache.parquet.filter2.compat.FilterCompat
    import org.apache.parquet.filter2.predicate.FilterApi
    val file = files.next()
    @annotation.nowarn("cat=deprecation")
    val builder = ParquetReader.builder(new GroupReadSupport(), new Path(file))
    val withFilter = if (offsetIsInt64(file)) {
      builder.withFilter(FilterCompat.get(FilterApi.and(
        FilterApi.gt(FilterApi.longColumn(cfg.offsetColumn), java.lang.Long.valueOf(lo)),
        FilterApi.ltEq(FilterApi.longColumn(cfg.offsetColumn), java.lang.Long.valueOf(hi)))))
    } else builder
    reader = withFilter.build()
    true
  }

  override def next(): Boolean = {
    while (true) {
      if (reader == null && !nextReader()) return false
      val g = reader.read()
      if (g == null) {
        if (!nextReader()) return false
      } else {
        val schema = g.getType
        val offIdx = schema.getFieldIndex(cfg.offsetColumn)
        val off = schema.getType(offIdx).asPrimitiveType().getPrimitiveTypeName match {
          case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT32 =>
            g.getInteger(offIdx, 0).toLong
          case _ => g.getLong(offIdx, 0)
        }
        if (off > lo && off <= hi) {
          val valIdx = schema.getFieldIndex(cfg.valueColumn)
          val value = if (g.getFieldRepetitionCount(valIdx) == 0) null
            else UTF8String.fromString(g.getValueToString(valIdx, 0))
          current = new GenericInternalRow(Array[Any](off, value))
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = if (reader != null) reader.close()
}
