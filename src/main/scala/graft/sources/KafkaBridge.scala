package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** Kafka wiring with reference-parity semantics (O1/O3/O14). The
  * spark-sql-kafka connector is not bundled in this zero-egress container,
  * so these builders are exercised on a real cluster classpath; everything
  * here is configuration + plan construction (lazy until `.start()`).
  *
  *  - control topic source: replay from earliest — the snapshot∪tail
  *    unification of kafka_ccd_store.clj:28-42,75-94 (one stream, no race);
  *  - queue sink: keyed produce to the topic named after the queue with lz4
  *    compression (kafka_queue_writer.clj:45-51,82-98); micro-batching
  *    amortizes the produce round-trip the reference paid per record.
  */
object KafkaBridge {

  /** Default control topic name (reference README.md:103-104). */
  val DefaultControlTopic = "change-data-capture"

  val CcdSchema: StructType = StructType(Seq(
    StructField("status", StringType),
    StructField("queue", StringType),
    StructField("tableName", StringType),
    StructField("error", StringType)))

  /** CCD control-plane stream: (key, status, queue, offset) from the
    * control topic, earliest-first so compaction reconstructs the current
    * state on every start (O1+O3 unified). */
  def controlStream(spark: SparkSession, brokers: String,
                    topic: String = DefaultControlTopic): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(col("key").cast("string").as("key"),
        from_json(col("value").cast("string"), CcdSchema).as("ccd"),
        col("offset"))
      .select(col("key"), col("ccd.status").as("status"),
        col("ccd.queue").as("queue"), col("offset"), col("ccd.error").as("error"))

  /** Keyed queue sink (O14): topic = queue name, lz4, checkpointed
    * at-least-once. Expects (key STRING, value STRING) rows — the output of
    * Pipelines.dmlTransform. */
  /** The queue-sink option map (reference kafka_queue_writer.clj:45-51):
    * topic = queue name, lz4 producer compression, checkpointed. Exposed
    * separately so the wiring is unit-assertable without a broker. */
  def queueWriterOptions(queue: String, brokers: String,
                         checkpointDir: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> brokers,
    "topic" -> queue,
    "kafka.compression.type" -> "lz4",
    "checkpointLocation" -> checkpointDir)

  def queueWriter(df: DataFrame, queue: String, brokers: String,
                  checkpointDir: String): DataStreamWriter[Row] =
    df.select(col("key").cast("binary").as("key"),
        col("value").cast("binary").as("value"))
      .writeStream.format("kafka")
      .options(queueWriterOptions(queue, brokers, checkpointDir))

  /** JSON payload for the error-status write-back CCD (reference
    * README.md:19-22): posted to the control topic keyed by the CCD key so
    * compaction replaces the activating record. */
  def errorCcdJson(ccd: graft.streaming.Pipelines.Ccd): String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val err = ccd.error.map(e => s""","error":"${esc(e)}"""").getOrElse("")
    s"""{"status":"${esc(ccd.status)}","queue":"${esc(ccd.queue)}"$err}"""
  }

  /** Error write-back sink for GraftSystem.errorSink: a single-row batch
    * produce of the error CCD to the control topic (O14's batch twin). */
  def controlErrorSink(spark: SparkSession, brokers: String,
                       topic: String = DefaultControlTopic)
                      (ccd: graft.streaming.Pipelines.Ccd): Unit = {
    import spark.implicits._
    Seq((ccd.key, errorCcdJson(ccd))).toDF("key", "value")
      .select(col("key").cast("binary").as("key"), col("value").cast("binary").as("value"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .save()
  }
}
