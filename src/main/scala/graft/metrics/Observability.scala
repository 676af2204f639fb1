package graft.metrics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** O17 — metrics parity with the reference (jms_publisher.clj:22-26,
  * kafka_queue_writer.clj:21-31): `dequeue-count`, `enqueue-count`,
  * `enqueue-time` via `df.observe` (zero-cost accumulators evaluated inside
  * the plan — no extra pass) and a QueryExecutionListener that collects the
  * observed values per named observation.
  */
object Observability {

  /** Tag a dataframe with reference-named counters. `enqueue-time` in the
    * reference is a wall-clock timer around the producer send; here the
    * batch equivalent is carried by the listener's durationNs. */
  def observed(df: DataFrame, name: String = "graft"): DataFrame =
    df.observe(name, count(lit(1)).as("enqueue-count"),
      sum(when(col(df.columns.head).isNull, 0L).otherwise(1L)).as("dequeue-count"))

  /** Collects observation results keyed by observation name. */
  final class MetricsCollector extends QueryExecutionListener {
    val metrics = new ConcurrentHashMap[String, Map[String, Any]]()
    val durationsNs = new ConcurrentHashMap[String, Long]()

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      durationsNs.put(funcName, durationNs)
      qe.observedMetrics.foreach { case (name, row) =>
        val asMap = row.schema.fieldNames.zip(row.toSeq).toMap
        metrics.put(name, asMap)
      }
    }
    override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()

    def get(name: String): Option[Map[String, Any]] = Option(metrics.get(name))
    def all: Map[String, Map[String, Any]] = metrics.asScala.toMap
  }

  /** Register a collector on the session; caller unregisters via the
    * returned handle when done. */
  def attach(spark: SparkSession): MetricsCollector = {
    val c = new MetricsCollector
    spark.listenerManager.register(c)
    c
  }

  def detach(spark: SparkSession, c: MetricsCollector): Unit =
    spark.listenerManager.unregister(c)

  /** Streaming-side counters with the reference's metric names
    * (jms_publisher.clj:25-26, kafka_queue_writer.clj:21-31): per query
    * name, cumulative `dequeue-count` (input rows), `enqueue-count` (sink
    * rows) and last `enqueue-time` (batch duration ms — the micro-batch
    * analogue of the per-send timer). */
  final class StreamingMetrics extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val dequeueCount = new ConcurrentHashMap[String, Long]()
    val enqueueCount = new ConcurrentHashMap[String, Long]()
    val lastEnqueueTimeMs = new ConcurrentHashMap[String, Long]()

    override def onQueryStarted(event: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(event: QueryProgressEvent): Unit = {
      val p = event.progress
      val name = Option(p.name).getOrElse(p.id.toString)
      dequeueCount.merge(name, p.numInputRows, (a, b) => a + b)
      val sinkRows = p.sink.numOutputRows
      if (sinkRows >= 0) enqueueCount.merge(name, sinkRows, (a, b) => a + b)
      Option(p.durationMs.get("triggerExecution")).foreach(d => lastEnqueueTimeMs.put(name, d))
    }
  }

  def attachStreaming(spark: SparkSession): StreamingMetrics = {
    val m = new StreamingMetrics
    spark.streams.addListener(m)
    m
  }

  def detachStreaming(spark: SparkSession, m: StreamingMetrics): Unit =
    spark.streams.removeListener(m)

  /** O17 — periodic metrics reporter (main.clj:45-53 analogue: the
    * reference ships metrics to a Kafka topic every 10 s). Snapshots the
    * streaming counters to JSON-lines files under `outDir` on a daemon
    * timer; in production the same snapshot row goes to a Kafka sink via
    * KafkaBridge. `activeQueues` is the publisher-count gauge
    * (jms_publisher.clj:22-23) — wire it to
    * `orchestrator.activeQueues.size`. `indexGauges` pushes the
    * maintained indexes' lifecycle stats (version / flushes /
    * delta_versions / delta_bytes / last_flush_ms / pins / broadcast-guard
    * counters) through the SAME periodic surface, keyed by a
    * caller-chosen index name — an unattended maintainer is then
    * monitorable from the metrics stream alone, with no need to poll the
    * index object (pick an interval at or under the flush cadence so
    * every flush lands in at least one snapshot). Returns a handle whose
    * close() stops the timer. */
  def startReporter(m: StreamingMetrics, outDir: String,
                    intervalMs: Long = 10000L,
                    activeQueues: () => Int = () => -1,
                    indexGauges: () => Map[String, Map[String, Long]] = () => Map.empty): AutoCloseable = {
    new java.io.File(outDir).mkdirs()
    val timer = new java.util.Timer("graft-metrics-reporter", true)
    timer.scheduleAtFixedRate(new java.util.TimerTask {
      override def run(): Unit = {
        val ts = System.currentTimeMillis()
        val gauge = activeQueues()
        val head = if (gauge >= 0)
          Seq(s"""{"ts":$ts,"active-queues":$gauge}""") else Seq.empty
        val idx = try indexGauges() catch { case _: Exception => Map.empty[String, Map[String, Long]] }
        val idxLines = idx.toSeq.sortBy(_._1).map { case (name, st) =>
          val fields = st.toSeq.sortBy(_._1)
            .map { case (k, v) => s""""$k":$v""" }.mkString(",")
          s"""{"ts":$ts,"index":"$name",$fields}"""
        }
        val lines = head ++ idxLines ++ m.dequeueCount.asScala.map { case (q, n) =>
          val enq = m.enqueueCount.getOrDefault(q, 0L)
          val dur = m.lastEnqueueTimeMs.getOrDefault(q, -1L)
          s"""{"ts":$ts,"query":"$q","dequeue-count":$n,"enqueue-count":$enq,"enqueue-time":$dur}"""
        }
        if (lines.nonEmpty) {
          val p = java.nio.file.Paths.get(outDir, s"metrics-$ts.jsonl")
          java.nio.file.Files.write(p, lines.mkString("\n").getBytes)
          ()
        }
      }
    }, intervalMs, intervalMs)
    () => timer.cancel()
  }

  /** O18 — rate-limited error logging (jms_publisher.clj:17,84-99): an
    * action per key runs at most once per interval; suppressed calls are
    * counted and reported on the next emitted one. `now` injectable for
    * tests. */
  final class RateLimiter(intervalMs: Long, now: () => Long = System.currentTimeMillis) {
    private val lastEmit = new ConcurrentHashMap[String, Long]()
    private val suppressed = new ConcurrentHashMap[String, Long]()

    /** Returns Some(suppressedSinceLastEmit) when the caller should emit. */
    def tryAcquire(key: String): Option[Long] = {
      val t = now()
      // note: CHM[String, Long] unboxes a missing value to 0 — check
      // presence explicitly
      val seen = lastEmit.containsKey(key)
      if (!seen || t - lastEmit.get(key) >= intervalMs) {
        lastEmit.put(key, t)
        Some(Option(suppressed.remove(key)).getOrElse(0L))
      } else {
        suppressed.merge(key, 1L, (a, b) => a + b)
        None
      }
    }
  }
}
