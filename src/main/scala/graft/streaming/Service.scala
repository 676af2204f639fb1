package graft.streaming

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.streaming.Pipelines.Ccd

/** Service assembly (the reference's `main.clj` boot path, O19): wire a
  * file-backed control topic to a [[GraftSystem]] whose per-queue data
  * planes read the `graft-changelog` DSv2 source.
  *
  *  - Control plane: a parquet directory streamed as CCDs — appending a new
  *    CCD file activates/deactivates queues at the next trigger, replay
  *    from the beginning reconstructs state (the snapshot∪tail unification).
  *  - Data plane: queue `S.Q` reads the changelog at `dataRoot/S.Q`,
  *    derives DML keys, writes keyed main + dead-letter parquet under
  *    `outRoot/S.Q/`.
  *  - Error write-back: exhausted queue restarts append a
  *    `status="error"` CCD parquet file back into the control directory —
  *    the running control stream discovers the new file and deactivates the
  *    queue, closing the loop the reference documents (README.md:19-22).
  *    On Kafka deployments swap the control reader/sink for KafkaBridge.
  */
object Service {

  final case class Config(controlDir: String, dataRoot: String, outRoot: String,
                          checkpointRoot: String,
                          offsetColumn: String = "event_id",
                          valueColumn: String = "props",
                          controlTrigger: Trigger = Trigger.ProcessingTime("1 second"),
                          queueTrigger: Trigger = Trigger.ProcessingTime("1 second"),
                          metricsDir: Option[String] = None,
                          metricsIntervalMs: Long = 10000L)

  val CcdSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("queue", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("error", StringType, nullable = true)))

  /** Append one CCD to the file-backed control topic (used both by
    * operators to (de)activate queues and by the error write-back). */
  def appendControl(spark: SparkSession, controlDir: String, ccd: Ccd): Unit = {
    import spark.implicits._
    Seq(ccd).toDF()
      .select(col("key"), col("status"), col("queue"), col("offset"), col("error"))
      .write.mode(SaveMode.Append).parquet(controlDir)
  }

  /** Post removal requests onto the control topic (the reference's
    * CCD-status-drives-behavior pattern, kafka_ccd_store.clj:28-42,
    * applied to takedowns): one `status = "takedown"` CCD per doc, the
    * doc id riding `offset`. The running composition routes them to the
    * queue's OWN batch loop ([[assembleComposition]]'s `takedown`
    * seam), so the delete executes under the composition's writer lease
    * and batch ids instead of an out-of-band API call racing the
    * writer. Idempotent under boot's control-log replay. */
  def appendTakedown(spark: SparkSession, controlDir: String,
                     queue: String, docIds: Seq[Long]): Unit = {
    import spark.implicits._
    docIds.map(id => Ccd(s"takedown:$queue:$id", "takedown", queue, id, None))
      .toDF()
      .select(col("key"), col("status"), col("queue"), col("offset"), col("error"))
      .write.mode(SaveMode.Append).parquet(controlDir)
  }

  /** Shared boot for the per-doc streaming COMPOSITIONS (curation,
    * retrieval indexing): a control-driven [[GraftSystem]] whose per-queue
    * data planes read `(doc_id, text)` changelogs and hand each
    * micro-batch to `handler`, acks landing under
    * `outRoot/<queue>/<ackSubdir>`. One wiring (changelog options, error
    * write-back, metrics attach + teardown order, control boot) so a fix
    * to it cannot diverge between the services that share it.
    *
    * `takedown` wires the control-topic removal path: `status =
    * "takedown"` CCDs ([[appendTakedown]]) park per-queue, and the
    * queue's NEXT micro-batch executes them first — on the handler
    * thread, under the composition's writer lease, with the batch's own
    * id, BEFORE the batch's ingest (so a same-batch re-ingest of a
    * taken-down id resolves ingest-wins, the documented delete
    * semantics). A fully quiescent queue (no further data) holds its
    * requests parked — the API-form takedown stays available for that
    * operational corner.
    *
    * Delivery semantics: AT-LEAST-ONCE with replay suppression. A failed
    * execution re-parks its ids (the Supervisor's restarted incarnation
    * re-drains them — a transient fault never silently loses a
    * takedown). Executed ids are recorded in a per-queue done-log under
    * the checkpoint root and skipped when boot's full control-log replay
    * re-delivers the request — without the log, every reboot would
    * re-tombstone the whole takedown history, and a doc legitimately
    * re-ingested after its takedown (possible for sources whose offsets
    * are not the doc ids) would be re-deleted on every restart. The one
    * remaining re-execution window is a crash between the delete and its
    * done-log append — one extra idempotent tombstone, which the
    * (_tier, _b) resolution absorbs. */
  private[streaming] def assembleComposition(
      spark: SparkSession, controlDir: String, dataRoot: String,
      outRoot: String, checkpointRoot: String, trigger: Trigger,
      metricsDir: Option[String], metricsIntervalMs: Long,
      ackSubdir: String,
      handler: (org.apache.spark.sql.DataFrame, Long,
                org.apache.spark.sql.DataFrame => Unit) => Unit,
      gauges: () => Map[String, Map[String, Long]],
      takedown: Option[(Seq[Long], Long) => Unit] = None): (GraftSystem, StreamingQuery) = {
    val pendingTakedowns =
      new java.util.concurrent.ConcurrentHashMap[String,
        java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]]()
    val hconf = spark.sparkContext.hadoopConfiguration
    def doneLogPath(queue: String) = new org.apache.hadoop.fs.Path(
      s"$checkpointRoot/_takedowns_done/${queue.replaceAll("[^A-Za-z0-9._-]", "_")}")
    // (queue, doc_id) pairs already executed — seeded from the done-log at
    // first touch, grown in-memory as executions land
    val executed = java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Long)]()
    val doneLoaded = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def loadDone(queue: String): Unit =
      if (doneLoaded.add(queue)) {
        val p = doneLogPath(queue)
        val fs = p.getFileSystem(hconf)
        if (fs.exists(p)) {
          val in = new java.io.BufferedReader(
            new java.io.InputStreamReader(fs.open(p), java.nio.charset.StandardCharsets.UTF_8))
          // a torn trailing line (crash mid-rewrite) drops that id from
          // the suppression set — it re-executes once, the safe direction
          try Iterator.continually(in.readLine()).takeWhile(_ != null)
            .filter(_.matches("\\d+"))
            .foreach(l => executed.add((queue, l.toLong)))
          finally in.close()
        }
      }
    def appendDone(queue: String, ids: Seq[Long]): Unit = {
      // full rewrite, not append (the local checksummed FS rejects
      // append): the done set is control-plane sized — |takedowns ever|
      // per queue — and rewrites happen once per executing micro-batch
      ids.foreach(i => executed.add((queue, i)))
      import scala.jdk.CollectionConverters._
      val all = executed.asScala.collect { case (q, i) if q == queue => i }.toSeq.sorted
      val p = doneLogPath(queue)
      val fs = p.getFileSystem(hconf)
      val out = fs.create(p, true)
      try out.write(all.map(i => s"$i\n").mkString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    def drainPending(queue: String): Seq[Long] =
      Option(pendingTakedowns.get(queue)).map { q =>
        Iterator.continually(q.poll()).takeWhile(_ ne null)
          .map(_.longValue).toSeq
      }.getOrElse(Seq.empty)
    def reparkPending(queue: String, ids: Seq[Long]): Unit =
      ids.foreach(i => pendingTakedowns
        .computeIfAbsent(queue,
          _ => new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]())
        .add(java.lang.Long.valueOf(i)))
    val system = new GraftSystem(
      dataSourceFor = queue =>
        spark.readStream.format("graft-changelog")
          .option("path", s"$dataRoot/$queue")
          .option("offsetColumn", "doc_id")
          .option("valueColumn", "text")
          .load()
          .select(col("offset").as("doc_id"), col("value").as("text")),
      outRoot = outRoot,
      checkpointRoot = checkpointRoot,
      queueTrigger = trigger,
      errorSink = ccd => appendControl(spark, controlDir, ccd),
      transform = identity,
      batchHandler = (queue, dir, batch, id) => {
        takedown.foreach { exec =>
          val ids = drainPending(queue)
          if (ids.nonEmpty) {
            // a failed execution must not LOSE the requests: re-park them
            // for the Supervisor-restarted incarnation's next drain, then
            // let the batch fail (its checkpoint replays the data side)
            try exec(ids, id)
            catch { case e: Throwable => reparkPending(queue, ids); throw e }
            appendDone(queue, ids)
          }
        }
        handler(batch, id,
          out => out.write.mode("append").parquet(s"$dir/$ackSubdir"))
      },
      takedownSink = ccd => {
        if (takedown.nonEmpty) {
          loadDone(ccd.queue)
          if (!executed.contains((ccd.queue, ccd.offset))) {
            pendingTakedowns
              .computeIfAbsent(ccd.queue,
                _ => new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]())
              .add(java.lang.Long.valueOf(ccd.offset))
            ()
          }
        }
      })
    metricsDir.foreach { mdir =>
      val m = graft.metrics.Observability.attachStreaming(spark)
      val reporter = graft.metrics.Observability.startReporter(
        m, mdir, metricsIntervalMs,
        () => system.orchestrator.activeQueues.size,
        indexGauges = gauges)
      system.onStop(reporter)
      system.onStop(() => graft.metrics.Observability.detachStreaming(spark, m))
    }
    import spark.implicits._
    val control = spark.readStream.schema(CcdSchema).parquet(controlDir)
      .as[Pipelines.Ccd]
    (system, system.start(control, trigger))
  }

  /** Build and start the system; returns it with the running control query.
    * Caller owns shutdown: `controlQuery.stop(); system.stop()` (or just
    * `system.stop()`, which stops both — main.clj:62 analogue). */
  def assemble(spark: SparkSession, cfg: Config): (GraftSystem, StreamingQuery) = {
    val system = new GraftSystem(
      dataSourceFor = queue =>
        spark.readStream.format("graft-changelog")
          .option("path", s"${cfg.dataRoot}/$queue")
          .option("offsetColumn", cfg.offsetColumn)
          .option("valueColumn", cfg.valueColumn)
          .load()
          .select(col("value")),
      outRoot = cfg.outRoot,
      checkpointRoot = cfg.checkpointRoot,
      queueTrigger = cfg.queueTrigger,
      errorSink = ccd => appendControl(spark, cfg.controlDir, ccd))
    // O17 boot wiring (main.clj:45-53 analogue): the reference's -main starts
    // the 10 s metrics reporter as part of assembly; here the streaming
    // listener + jsonl reporter attach when metricsDir is set, with the
    // active-queue gauge read from the orchestrator. Torn down by
    // system.stop() after the queries.
    cfg.metricsDir.foreach { dir =>
      val m = graft.metrics.Observability.attachStreaming(spark)
      val reporter = graft.metrics.Observability.startReporter(
        m, dir, cfg.metricsIntervalMs,
        () => system.orchestrator.activeQueues.size)
      system.onStop(reporter)
      system.onStop(() => graft.metrics.Observability.detachStreaming(spark, m))
    }
    // lifecycle: a stopped system releases the session's derived-artifact
    // caches (signatures, models, merge tables, …) so a service that
    // co-hosts batch analytics over many corpus versions doesn't hold
    // them past its own life (GraftCaches round-9 contract)
    system.onStop(() => graft.GraftCaches.release(spark))
    import spark.implicits._
    val control = spark.readStream.schema(CcdSchema).parquet(cfg.controlDir).as[Ccd]
    val q = system.start(control, cfg.controlTrigger)
    (system, q)
  }
}

/** CLI boot:
  * `ServiceMain <controlDir> <dataRoot> <outRoot> <checkpointRoot> [metricsDir]`
  * — runs until terminated; a JVM shutdown hook stops the system in
  * dependency order. The 10 s metrics reporter (main.clj:45-53) writes
  * jsonl snapshots under `metricsDir` (default `<outRoot>/_metrics`). */
object ServiceMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ServiceMain <controlDir> <dataRoot> <outRoot> <checkpointRoot> [metricsDir]")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val metricsDir = if (args.length >= 5) args(4) else s"${args(2)}/_metrics"
    val (system, control) = Service.assemble(spark,
      Service.Config(args(0), args(1), args(2), args(3),
        metricsDir = Some(metricsDir)))
    sys.addShutdownHook { system.stop() }
    control.awaitTermination()
  }
}
