package graft.sources

import java.sql.{Connection, DriverManager, ResultSet}
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-jdbc-changelog` — a DataSource V2 micro-batch source that polls a
  * JDBC table for rows above the last replayed offset.
  *
  * This is the second in-repo stand-in for the reference's Oracle AQ/JMS
  * dequeue boundary (O10, SURVEY §2.1; reference jms_publisher.clj:169-194,
  * whose dead `QueueReader` protocol + yesql dep reveal the legacy
  * polling-SQL architecture this source deliberately resembles — see
  * SURVEY §0.1): where [[ChangelogSourceProvider]]
  * replays a parquet-backed log, this polls a database table the way the
  * reference's dequeue loop polls Oracle — `max(offset)` per trigger plans
  * the (start, end] range, executors read their sub-range with a pushed
  * `WHERE offset > ? AND offset <= ?` predicate (index-range scan on the
  * offset column in a real deployment), and checkpointed offsets give
  * exactly-once range accounting. Admission control (`maxRowsPerBatch`)
  * mirrors the reference's channel-buffer backpressure
  * (jms_publisher.clj:207).
  *
  * Options: `url` (JDBC url; tested against the bundled embedded Derby),
  * `dbtable` (table name), `offsetColumn` (monotone numeric, default
  * `event_id`), `valueColumn` (payload, default `props`),
  * `maxRowsPerBatch`, `numPartitions` (range splits per batch, default 4).
  *
  * Emitted schema: (offset BIGINT, value STRING) — same as the parquet
  * changelog source, so the two are drop-in interchangeable upstream of
  * `Pipelines.dmlTransform`.
  */
class JdbcChangelogSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-jdbc-changelog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = ChangelogSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new JdbcChangelogTable(new CaseInsensitiveStringMap(properties))
}

final case class JdbcChangelogConfig(url: String, table: String, offsetColumn: String,
                                     valueColumn: String, maxRowsPerBatch: Long,
                                     numPartitions: Int) extends Serializable

object JdbcChangelog {
  private def withConnection[A](url: String)(f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  /** (min, max) of the offset column — one aggregate query, the JDBC
    * analogue of the parquet-footer poll (metadata-cheap on an indexed
    * offset column). Empty table → (0, -1). */
  def offsetBounds(cfg: JdbcChangelogConfig): (Long, Long) =
    withConnection(cfg.url) { c =>
      val rs = c.createStatement().executeQuery(
        s"SELECT MIN(${cfg.offsetColumn}), MAX(${cfg.offsetColumn}) FROM ${cfg.table}")
      try {
        rs.next()
        val mn = rs.getLong(1); val mnNull = rs.wasNull()
        val mx = rs.getLong(2); val mxNull = rs.wasNull()
        if (mnNull || mxNull) (0L, -1L) else (mn, mx)
      } finally rs.close()
    }
}

class JdbcChangelogTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  private val cfg = JdbcChangelogConfig(
    url = Option(options.get("url")).getOrElse(
      throw new IllegalArgumentException("graft-jdbc-changelog requires a 'url' option")),
    table = Option(options.get("dbtable")).getOrElse(
      throw new IllegalArgumentException("graft-jdbc-changelog requires a 'dbtable' option")),
    offsetColumn = options.getOrDefault("offsetColumn", "event_id"),
    valueColumn = options.getOrDefault("valueColumn", "props"),
    maxRowsPerBatch = options.getLong("maxRowsPerBatch", Long.MaxValue),
    numPartitions = options.getInt("numPartitions", 4))
  require(cfg.numPartitions >= 1,
    s"graft-jdbc-changelog numPartitions must be >= 1, got ${cfg.numPartitions}")
  require(cfg.maxRowsPerBatch >= 1,
    s"graft-jdbc-changelog maxRowsPerBatch must be >= 1, got ${cfg.maxRowsPerBatch}")
  // identifier sanity: these names are interpolated into SQL
  Seq(cfg.table, cfg.offsetColumn, cfg.valueColumn).foreach { id =>
    require(id.matches("[A-Za-z_][A-Za-z0-9_.]*"),
      s"graft-jdbc-changelog: '$id' is not a plain SQL identifier")
  }

  override def name(): String = s"graft-jdbc-changelog(${cfg.table})"
  override def schema(): StructType = ChangelogSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder { override def build(): Scan = new JdbcChangelogScan(cfg) }
}

class JdbcChangelogScan(cfg: JdbcChangelogConfig) extends Scan {
  override def readSchema(): StructType = ChangelogSource.Schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new JdbcChangelogMicroBatchStream(cfg)
  override def toBatch: Batch = new Batch {
    private val bounds = JdbcChangelog.offsetBounds(cfg)
    override def planInputPartitions(): Array[InputPartition] =
      JdbcChangelogMicroBatchStream.splitRange(cfg, bounds._1 - 1, bounds._2)
    override def createReaderFactory(): PartitionReaderFactory = new JdbcChangelogReaderFactory(cfg)
  }
}

object JdbcChangelogMicroBatchStream {
  /** Split (start, end] into up to numPartitions contiguous ranges (clamped
    * to >= 1 — see ChangelogMicroBatchStream.splitRange). */
  def splitRange(cfg: JdbcChangelogConfig, start: Long, end: Long): Array[InputPartition] = {
    if (end <= start) return Array.empty
    val n = math.max(1L, math.min(cfg.numPartitions.toLong, end - start)).toInt
    val step = (end - start) / n
    (0 until n).map { i =>
      val lo = start + i * step
      val hi = if (i == n - 1) end else start + (i + 1) * step
      ChangelogInputPartition(lo, hi, Nil): InputPartition // files unused: JDBC reader queries by range
    }.toArray
  }
}

class JdbcChangelogMicroBatchStream(cfg: JdbcChangelogConfig)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {
  import JdbcChangelogMicroBatchStream._

  @volatile private var availableNowEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(JdbcChangelog.offsetBounds(cfg)._2)

  private def currentMax: Long = availableNowEnd.getOrElse(JdbcChangelog.offsetBounds(cfg)._2)

  override def initialOffset(): Offset = ChangelogOffset(JdbcChangelog.offsetBounds(cfg)._1 - 1)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(Offset, ReadLimit)")

  override def getDefaultReadLimit: ReadLimit =
    if (cfg.maxRowsPerBatch == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(cfg.maxRowsPerBatch)

  override def reportLatestOffset(): Offset = ChangelogOffset(currentMax)

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

  override def createReaderFactory(): PartitionReaderFactory = new JdbcChangelogReaderFactory(cfg)
  override def deserializeOffset(json: String): Offset = ChangelogOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class JdbcChangelogReaderFactory(cfg: JdbcChangelogConfig) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ChangelogInputPartition]
    new JdbcChangelogPartitionReader(cfg, p.lo, p.hi)
  }
}

/** Executor-side reader: one range-predicated SELECT per partition. The
  * WHERE clause is the pushdown — on an indexed offset column this is an
  * index range scan, not a table scan. */
class JdbcChangelogPartitionReader(cfg: JdbcChangelogConfig, lo: Long, hi: Long)
    extends PartitionReader[InternalRow] {

  private val conn = DriverManager.getConnection(cfg.url)
  private val stmt = conn.prepareStatement(
    s"SELECT ${cfg.offsetColumn}, ${cfg.valueColumn} FROM ${cfg.table} " +
      s"WHERE ${cfg.offsetColumn} > ? AND ${cfg.offsetColumn} <= ? ORDER BY ${cfg.offsetColumn}")
  stmt.setLong(1, lo); stmt.setLong(2, hi)
  private val rs: ResultSet = stmt.executeQuery()
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (!rs.next()) return false
    val off = rs.getLong(1)
    val v = rs.getString(2)
    current = new GenericInternalRow(Array[Any](off,
      if (rs.wasNull()) null else UTF8String.fromString(v)))
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = { rs.close(); stmt.close(); conn.close() }
}
