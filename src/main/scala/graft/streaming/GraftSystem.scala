package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.streaming.Pipelines.Ccd

/** O19 — system assembly (reference system.clj:15-29 + main.clj:58-62):
  * wire the control plane (CCD stream → compaction → orchestrator) to the
  * data plane (per-queue DML pipeline → keyed sink) and manage lifecycle.
  *
  * `dataSourceFor(queue)` supplies the per-queue streaming DataFrame with a
  * `value` payload column (in production: the graft-changelog source or a
  * Kafka topic; in tests: a MemoryStream). Each activated queue gets its
  * own checkpointed query writing keyed output under `outRoot/<queue>/main`
  * with malformed payloads dead-lettered — the EP3 hot path
  * (jms_publisher.clj:138-194) as one declarative pipeline per queue.
  *
  * Each queue query is supervised (cubic-backoff restarts); when
  * `maxRestartsPerQueue` consecutive restarts are exhausted the system
  * writes a `status = "error"` CCD (with the failure detail) back through
  * `errorSink` — in production a producer to the control topic
  * (KafkaBridge.errorCcdJson), in tests the control MemoryStream — so the
  * control plane observes the failure and deactivates the queue (reference
  * README.md:19-22, the documented error write-back the reference never
  * implemented in code).
  */
class GraftSystem(dataSourceFor: String => DataFrame,
                  outRoot: String, checkpointRoot: String,
                  queueTrigger: Trigger = Trigger.ProcessingTime("1 second"),
                  maxRestartsPerQueue: Int = graft.ops.Backoff.MaxRetries,
                  restartSleep: Long => Unit = Thread.sleep,
                  errorSink: Ccd => Unit = _ => (),
                  transform: DataFrame => DataFrame = GraftSystem.dmlTransform,
                  batchHandler: (String, String, DataFrame, Long) => Unit =
                    GraftSystem.keyedParquetHandler,
                  takedownSink: Ccd => Unit = _ => ()) {

  private def sanitize(queue: String): String = queue.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Build and start one incarnation of the data-plane query. The default
    * `transform`/`batchHandler` pair is the reference EP3 hot path (DML
    * envelope → key derivation → keyed main + dead-letter parquet);
    * services with richer per-batch logic — the curation composition's
    * gate → dedup → near-dup → split chain ([[CurationService]]) — plug
    * in their own pair and inherit the whole control plane: activation,
    * supervision, error write-back, shutdown order. */
  private[graft] def startQueueOnce(queue: String): StreamingQuery = {
    val dir = s"$outRoot/${sanitize(queue)}"
    transform(dataSourceFor(queue))
      .writeStream
      .queryName(s"graft-queue-$queue")
      .option("checkpointLocation", s"$checkpointRoot/${sanitize(queue)}")
      .trigger(queueTrigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batchHandler(queue, dir, batch, id)
      }
      .start()
  }

  /** The CCD posted back on unrecoverable failure: same key as the CCD
    * that activated the queue, offset above the latest seen so compaction
    * picks it, and the failure message in `error`. */
  private def exhausted(queue: String, e: Throwable): Unit = {
    val (key, offset) = orchestrator.compactedState.find(_._2.queue == queue)
      .map { case (k, c) => (k, c.offset + 1) }
      .getOrElse((queue, Long.MaxValue))
    errorSink(Ccd(key, "error", queue, offset,
      Some(Option(e.getMessage).getOrElse(e.getClass.getName))))
  }

  /** Supervised per-queue start: the orchestrator holds the wrapper, so
    * deactivation stops both the watchdog and the live incarnation. */
  private[graft] def startQueue(queue: String): StreamingQuery =
    new Supervisor.SupervisedQueueQuery(queue, () => startQueueOnce(queue),
      maxRestartsPerQueue, restartSleep, exhausted)

  val orchestrator = new QueueOrchestrator(startQueue, takedownSink)

  @volatile private var controlQuery: Option[StreamingQuery] = None
  @volatile private var controlCkptKey: Option[String] = None

  private val closers = new java.util.concurrent.ConcurrentLinkedQueue[AutoCloseable]()

  /** Register a resource (metrics reporter, listener detach, …) to be closed
    * by [[stop]] after the queries are down. */
  def onStop(c: AutoCloseable): Unit = { closers.add(c); () }

  /** Start the whole system from a CCD control stream.
    *
    * Boot = FULL control-log replay: the control checkpoint is cleared
    * here, every boot. The orchestrator's compacted state is in-memory
    * and dies with the process, so resuming the control source past the
    * already-seen CCDs would leave every queue inactive after a driver
    * restart — the CCDs that encode which queues should be running
    * would never be re-read. Replaying instead reconstructs the active
    * set from the log itself (the snapshot∪tail unification), and the
    * last-write-wins compaction makes the replay idempotent, so the
    * cleared checkpoint costs nothing but a control-sized re-read. The
    * per-QUEUE checkpoints are untouched — data-plane exactly-once is
    * theirs.
    *
    * REQUIREMENT this replay imposes on the control source: it must
    * retain its FULL history (the compacted control-topic / complete
    * parquet-log shape). Against a retention-trimmed source the replay
    * reconstructs only the surviving suffix and every queue whose
    * activating CCD aged out stays inactive at boot — compact the
    * control log instead of trimming it.
    *
    * Guarded against double-start: a second start() while the control
    * query is live — on this system or on ANOTHER system sharing the
    * same checkpointRoot in this JVM — would delete a RUNNING query's
    * checkpoint out from under it; both shapes throw instead. */
  def start(controlStream: Dataset[Ccd],
            controlTrigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery = {
    val ckpt = GraftSystem.normalizedControlCkpt(checkpointRoot,
      controlStream.sparkSession.sparkContext.hadoopConfiguration)
    if (controlQuery.exists(_.isActive))
      throw new IllegalStateException(
        s"this GraftSystem's control query is still running (checkpoint $ckpt); " +
          "stop() the system before starting it again — clearing a live " +
          "query's checkpoint corrupts it")
    val q = GraftSystem.controlRegistry.synchronized {
      Option(GraftSystem.controlRegistry.get(ckpt)).filter(_.isActive) match {
        case Some(_) => throw new IllegalStateException(
          s"another GraftSystem's control query is live on checkpoint $ckpt; " +
            "two systems must not share a checkpointRoot — stop the other " +
            "system or use a distinct root")
        case None =>
          val p = new org.apache.hadoop.fs.Path(ckpt)
          val fs = p.getFileSystem(
            controlStream.sparkSession.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
          val started = orchestrator.run(controlStream, ckpt, controlTrigger)
          GraftSystem.controlRegistry.put(ckpt, started)
          started
      }
    }
    controlQuery = Some(q)
    controlCkptKey = Some(ckpt)
    q
  }

  /** Graceful shutdown in dependency order (main.clj:62 analogue). */
  def stop(): Unit = {
    controlQuery.foreach { q =>
      q.stop()
      // drop our registry entry so stopped queries aren't pinned for the
      // JVM lifetime (remove only OUR mapping — a newer system may have
      // re-registered the path already); the key is the NORMALIZED form
      // start() registered under
      controlCkptKey.foreach(k => GraftSystem.controlRegistry.remove(k, q))
    }
    orchestrator.stopAll()
    closers.forEach(c => try c.close() catch { case _: Exception => () })
    closers.clear()
  }
}

object GraftSystem {
  /** JVM-global control-checkpoint registry (the [[Pipelines.rootLock]]
    * pattern): start() refuses to clear a checkpoint another system's
    * LIVE control query is using. Entries for stopped queries are
    * overwritten by the next start on the same path. */
  private val controlRegistry =
    new java.util.concurrent.ConcurrentHashMap[String, StreamingQuery]()

  /** Canonical registry key for a control checkpoint: the path qualified
    * against its FileSystem (scheme + authority, `.`/`..`/double-slash
    * collapsed), so two systems addressing one directory via different
    * spellings — trailing slash, relative vs absolute — collide in the
    * registry instead of bypassing the live-query guard and deleting a
    * running query's checkpoint. */
  private[streaming] def normalizedControlCkpt(
      checkpointRoot: String,
      conf: org.apache.hadoop.conf.Configuration): String = {
    val p = new org.apache.hadoop.fs.Path(checkpointRoot, "_control")
    val fs = p.getFileSystem(conf)
    p.makeQualified(fs.getUri, fs.getWorkingDirectory).toString
  }

  /** The reference EP3 transform: DML envelope → derived key. */
  val dmlTransform: DataFrame => DataFrame = Pipelines.dmlTransform(_, "value")

  /** The reference EP3 sink: keyed main + dead-letter parquet under the
    * queue's output dir (jms_publisher.clj:138-194 as one declarative
    * pipeline per queue). */
  val keyedParquetHandler: (String, String, DataFrame, Long) => Unit =
    (_, dir, batch, _) => {
      val cached = batch.persist()
      try {
        val (ok, dead) = graft.ops.CoreOps.splitMalformed(cached, "key")
        ok.select(col("key"), col("value")).write.mode("append").parquet(s"$dir/main")
        dead.select(col("value")).write.mode("append").parquet(s"$dir/dead_letter")
      } finally { cached.unpersist(); () }
    }
}
