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

  /** One parked removal request: `key` is the CCD's unique request
    * identity (what the done-log records); the payload is either one doc
    * id or, for the bulk form, a pointer to an id-set parquet. */
  private final case class TakedownReq(key: String, id: Long, idsPath: Option[String])

  /** Default takedown request identity: wall-clock millis in the high
    * bits with 20 RANDOM low bits. nanoTime (the round-15 default) is an
    * arbitrary-origin monotonic clock — it repeats across reboots and
    * across machines, and a (queue, id, requestId) collision with an
    * already-executed request makes the done-log suppress a legitimate
    * NEW takedown, the exact compliance failure the per-request identity
    * exists to prevent. Wall-clock+random makes a cross-process or
    * cross-reboot collision need the same millisecond AND the same
    * 1-in-10^6 draw. Callers needing exactly-once submission across
    * their own retries still pass a stable id explicitly. */
  private[graft] def freshRequestId(): Long =
    (System.currentTimeMillis() << 20) |
      (java.util.concurrent.ThreadLocalRandom.current().nextInt() & 0xFFFFF)

  val CcdSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("queue", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("error", StringType, nullable = true)))

  /** Append one CCD to the file-backed control topic (used both by
    * operators to (de)activate queues and by the error write-back). */
  def appendControl(spark: SparkSession, controlDir: String, ccd: Ccd): Unit =
    appendControlBatch(spark, controlDir, Seq(ccd))

  /** Append SEVERAL CCDs as ONE control file — one micro-batch by
    * construction, which is the ordering primitive the takedown dance
    * relies on: the orchestrator routes `takedown` requests BEFORE
    * lifecycle CCDs within a batch, so [requests..., activate] in one
    * append parks the requests strictly before the activated queue's
    * first data batch exists. */
  def appendControlBatch(spark: SparkSession, controlDir: String,
                         ccds: Seq[Ccd]): Unit = {
    import spark.implicits._
    // coalesce(1): the "one append = one file" claim above is only true
    // with an explicit single partition — a Seq of N CCDs parallelizes as
    // up to N tasks, and N part files can be LISTED mid-job-commit by the
    // running control FileStreamSource, splitting [requests..., activate]
    // across micro-batches with the activate possibly surfacing first
    // (breaking the park-before-first-batch ordering the takedown dance
    // needs). One file is also one atomically-visible listing unit.
    ccds.toDF()
      .select(col("key"), col("status"), col("queue"), col("offset"), col("error"))
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(controlDir)
  }

  /** The per-id takedown request CCD — ONE place owns the key format
    * (the done-log suppression identity; see [[appendTakedown]]). */
  def takedownCcd(queue: String, docId: Long, requestId: Long): Ccd =
    Ccd(s"takedown:$queue:$docId:$requestId", "takedown", queue, docId, None)

  /** The bulk takedown request CCD (id-set parquet pointer) — see
    * [[appendTakedownBulk]] for the id-set file's lifecycle contract. */
  def takedownBulkCcd(queue: String, idSetPath: String, requestId: Long): Ccd =
    Ccd(s"takedown-bulk:$queue:$requestId", "takedown", queue, -1L, Some(idSetPath))

  /** Post removal requests onto the control topic (the reference's
    * CCD-status-drives-behavior pattern, kafka_ccd_store.clj:28-42,
    * applied to takedowns): one `status = "takedown"` CCD per doc, the
    * doc id riding `offset`. The running composition routes them to the
    * queue's OWN batch loop ([[assembleComposition]]'s `takedown`
    * seam), so the delete executes under the composition's writer lease
    * and batch ids instead of an out-of-band API call racing the
    * writer. Idempotent under boot's control-log replay.
    *
    * `requestId` makes the CCD key a UNIQUE request identity — the
    * done-log suppresses exactly the replay of THIS request, never a
    * later legitimate takedown of the same doc id (re-ingest after
    * takedown is supported, so "same id again" is a real case). The
    * default is collision-resistant across processes and reboots
    * ([[freshRequestId]]); callers that need exactly-once submission
    * across THEIR OWN retries pass a stable id instead (two appends
    * with the same requestId and doc set are one request). */
  def appendTakedown(spark: SparkSession, controlDir: String,
                     queue: String, docIds: Seq[Long],
                     requestId: Long = freshRequestId()): Unit =
    appendControlBatch(spark, controlDir,
      docIds.map(id => takedownCcd(queue, id, requestId)))

  /** BULK removal request (a source-level re-licensing event removing
    * 10^6+ docs): ONE control record carrying a POINTER to an id-set
    * parquet (`doc_id` long column) instead of one CCD per id — the
    * control topic grows by O(1) records and the done-log by one line
    * regardless of |ids|. The executing batch reads the id set as a
    * DataFrame and hands it to the composition's `takedown` seam, so
    * the ids never materialize on the driver. The id-set file must
    * stay readable until the request lands in the done-log (it is
    * re-read on boot replay of an unexecuted request); treat it like
    * the control log itself — immutable once posted. */
  def appendTakedownBulk(spark: SparkSession, controlDir: String,
                         queue: String, idSetPath: String,
                         requestId: Long = freshRequestId()): Unit =
    appendControlBatch(spark, controlDir,
      Seq(takedownBulkCcd(queue, idSetPath, requestId)))

  /** Shared decisions-polling scaffold for the assembled-path drivers
    * (the x100 oracle row and the assembled soak): ONE place owns the
    * deadline and poll interval, so tuning them for a slower host can't
    * leave one caller behind. Returns whether `done` held before the
    * deadline; the caller formats its own failure (the oracle row
    * `require`s, the soak attaches its op log). */
  private[streaming] val PollDeadlineMs = 300000L
  private[streaming] val PollIntervalMs = 200L
  private[streaming] def pollUntil(done: () => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + PollDeadlineMs
    while (!done() && System.currentTimeMillis() < deadline)
      Thread.sleep(PollIntervalMs)
    done()
  }

  /** Boot compacts the control log once it passes this many data files —
    * the same bounded-growth discipline as the done-log's segment merge.
    * Below the bound a full replay is already O(small). */
  val MaxControlFilesAtBoot = 64

  /** Compact the file-backed control topic IN PLACE (the reference's own
    * O2 last-value-per-key insight applied to its control plane): fold
    * every lifecycle CCD to its latest-by-offset row per key, keep only
    * the takedown requests NOT yet in the done-log (executed and
    * dead-lettered requests replay as no-ops anyway — boot suppresses
    * them by key), write the survivors as one new file set, and delete
    * the files that were folded. Boot's full control-log replay then
    * reads O(current state + unexecuted requests) instead of O(every CCD
    * since genesis) — without this the control topic only ever grows and
    * years of operation price every restart at O(|history|).
    *
    * Behavior-identical to replaying the uncompacted log: the
    * orchestrator's fold keeps exactly the max-offset row per key (equal
    * offsets: first-delivered wins — appendControl offsets are monotonic
    * per key by contract, so a tie is a caller bug either way), takedown
    * routing is per unique request key, and the done-log already decides
    * executed-ness. Crash-safe in the duplicate-tolerant direction: the
    * compacted file lands BEFORE the folded files are deleted, and a
    * crash between the two leaves duplicates that the same fold absorbs
    * on the next boot (LWW for lifecycle; per-key done-log suppression /
    * same-batch distinct for takedowns). MUST NOT run under a LIVE
    * control stream (deleting files out from under the source's listing
    * fails the query) — boot calls it before starting the stream, the
    * one place the single-service-per-control-dir contract guarantees
    * quiescence. Returns true when a compaction ran. */
  def compactControlLog(spark: SparkSession, controlDir: String,
                        checkpointRoot: String,
                        maxFiles: Int = MaxControlFilesAtBoot): Boolean = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(controlDir)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = dir.getFileSystem(hconf)
    if (!fs.exists(dir)) return false
    val files = fs.listStatus(dir).filter(st => st.isFile &&
      !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
    if (files.length <= maxFiles) return false
    val paths = files.map(_.getPath.toString).toSeq
    val ccds = spark.read.schema(CcdSchema).parquet(paths: _*)
    val lifecycle = ccds.filter(col("status") =!= "takedown")
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("key")).orderBy(col("offset").desc)))
      .filter(col("_rk") === 1).drop("_rk")
    // Executed-ness resolves via an ANTI-JOIN against the done-log's
    // (queue, key) pairs, parallelized from the suppression set the
    // done-log already holds in memory — NOT by collecting every
    // takedown pair appended since the last compaction and folding them
    // into one giant In(...) literal: heavy per-id appendTakedown
    // traffic (one CCD per doc id) between compactions would make that
    // collect and the expression tree driver-sized at boot. Driver cost
    // here is O(distinct queues + the in-memory done set); the takedown
    // side stays distributed.
    val doneLog = new TakedownDoneLog(hconf, checkpointRoot)
    val tdQueues = ccds.filter(col("status") === "takedown")
      .select(col("queue")).distinct().collect().map(_.getString(0))
    val donePairs = doneLog.executedPairs(tdQueues.toSeq)
    import spark.implicits._
    val doneDf = spark.sparkContext.parallelize(donePairs,
      math.max(1, donePairs.size / 100000 + 1)).toDF("queue", "key")
    val takedowns = ccds.filter(col("status") === "takedown")
      .dropDuplicates("key")
      .join(doneDf, Seq("queue", "key"), "left_anti")
      .select(ccds.columns.map(col).toIndexedSeq: _*)
    // land the compacted file FIRST (via a sibling tmp dir — a subdir of
    // the control dir would read as a partition), then drop the inputs
    val tmp = new Path(controlDir + ".compact_tmp")
    fs.delete(tmp, true)
    lifecycle.unionByName(takedowns).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.listStatus(tmp).filter(st => st.isFile &&
        !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
      .foreach { st =>
        val dest = new Path(dir, "compact-" + st.getPath.getName)
        if (!fs.rename(st.getPath, dest))
          throw new java.io.IOException(
            s"control-log compaction rename failed: ${st.getPath} -> $dest")
      }
    files.foreach(st => fs.delete(st.getPath, false))
    fs.delete(tmp, true)
    Pipelines.log.info(s"compacted control log at $controlDir: " +
      s"${files.length} files -> O(state)")
    true
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
    * execution re-parks its requests (the Supervisor's restarted
    * incarnation re-drains them — a transient fault never silently loses
    * a takedown). Executed requests are recorded BY THEIR UNIQUE CCD KEY
    * in a per-queue done-log under the checkpoint root and skipped when
    * boot's full control-log replay re-delivers them — without the log,
    * every reboot would re-tombstone the whole takedown history, and a
    * doc legitimately re-ingested after its takedown would be re-deleted
    * on every restart. Suppression is per REQUEST, not per doc id: a
    * second legitimate takedown of a re-ingested doc carries a fresh
    * requestId and executes (the round-14 per-id suppression silently
    * no-op'd it — a compliance path must not). The done-log is a
    * directory of immutable SEGMENTS, one per executing batch, each
    * written temp-then-rename (atomic — a crash can lose only the
    * in-flight segment, whose requests re-execute once, the safe
    * direction; it can never lose history, which a torn full-rewrite
    * could). Segments merge into one when their count passes a fixed
    * bound, so per-batch done-log work is O(new requests), not
    * O(all requests ever). The one remaining re-execution window is a
    * crash between the delete and its done-log segment rename — one
    * extra idempotent tombstone, which the (_tier, _b) resolution
    * absorbs. */
  private[streaming] def assembleComposition(
      spark: SparkSession, controlDir: String, dataRoot: String,
      outRoot: String, checkpointRoot: String, trigger: Trigger,
      metricsDir: Option[String], metricsIntervalMs: Long,
      ackSubdir: String,
      handler: (org.apache.spark.sql.DataFrame, Long,
                org.apache.spark.sql.DataFrame => Unit) => Unit,
      gauges: () => Map[String, Map[String, Long]],
      takedown: Option[(org.apache.spark.sql.DataFrame, Long) => Unit] = None)
      : (GraftSystem, StreamingQuery) = {
    val pendingTakedowns =
      new java.util.concurrent.ConcurrentHashMap[String,
        java.util.concurrent.ConcurrentLinkedQueue[TakedownReq]]()
    val doneLog = new TakedownDoneLog(
      spark.sparkContext.hadoopConfiguration, checkpointRoot)
    def drainPending(queue: String): Seq[TakedownReq] =
      Option(pendingTakedowns.get(queue)).map { q =>
        Iterator.continually(q.poll()).takeWhile(_ ne null).toSeq
      }.getOrElse(Seq.empty)
    def reparkPending(queue: String, reqs: Seq[TakedownReq]): Unit =
      reqs.foreach(r => pendingTakedowns
        .computeIfAbsent(queue,
          _ => new java.util.concurrent.ConcurrentLinkedQueue[TakedownReq]())
        .add(r))
    // Bounded retries for UNREADABLE bulk id-sets: the id-set parquet is
    // contractually immutable until the request lands in the done-log,
    // but a violated contract (file deleted early, bad path) must not
    // wedge the queue forever — without a bound, idsOf throws every
    // batch, the request re-parks, and ingest on that queue halts until
    // manual surgery. After MaxBulkReadAttempts failed probes the request
    // is DEAD-LETTERED: an `status = "error"` CCD under the request's own
    // key (so operators see it in the compacted control state; the
    // queue's lifecycle key is untouched and ingest continues) and a
    // done-log entry (so boot replay never re-parks it).
    val MaxBulkReadAttempts = 3
    val bulkReadFailures = new java.util.concurrent.ConcurrentHashMap[String, Int]()
    def triageBulk(queue: String, reqs: Seq[TakedownReq]): Seq[TakedownReq] =
      reqs.filter { r =>
        r.idsPath.forall { path =>
          try { spark.read.parquet(path); true }
          catch {
            case scala.util.control.NonFatal(e) =>
              val n = bulkReadFailures.merge(r.key, 1, _ + _)
              if (n >= MaxBulkReadAttempts) {
                appendControl(spark, controlDir, Ccd(r.key, "error", queue, r.id,
                  Some(s"bulk id-set unreadable after $n attempts ($path): " +
                    s"${e.getMessage}")))
                doneLog.record(queue, Seq(r.key))
                bulkReadFailures.remove(r.key)
                Pipelines.log.error(
                  s"dead-lettered bulk takedown ${r.key}: id-set $path unreadable " +
                    s"after $n attempts — posted error CCD, queue $queue unaffected", e)
              } else reparkPending(queue, Seq(r))
              false
          }
        }
      }
    def idsOf(reqs: Seq[TakedownReq]): org.apache.spark.sql.DataFrame = {
      import spark.implicits._
      val inline = reqs.collect { case TakedownReq(_, id, None) => id }
      val dfs =
        (if (inline.nonEmpty) Seq(inline.toDF("doc_id")) else Seq.empty) ++
        reqs.collect { case TakedownReq(_, _, Some(path)) =>
          spark.read.parquet(path).select(col("doc_id").cast("long").as("doc_id"))
        }
      // doc ids are ≥ 0 by contract (negative values are the indexes'
      // tombstone sentinels); a malformed bulk CCD (offset -1, no path)
      // or a bad id-set row must not stage a sentinel-id tombstone
      dfs.reduce(_.unionByName(_)).filter(col("doc_id") >= 0).distinct()
    }
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
          val drained = drainPending(queue)
          if (drained.nonEmpty) {
            // a failure ANYWHERE past the drain must not LOSE the requests
            // — including a throw inside triage's own dead-letter branch
            // (appendControl/doneLog on a failing disk), which without
            // this guard would silently defer the OTHER drained requests
            // until a full service reboot (Supervisor restarts do not
            // replay the control log). Re-park everything not yet
            // done-logged (triage's mid-flight re-parks/dead-letters make
            // some re-parking redundant, never harmful: idsOf distincts,
            // the done-log suppresses) and let the batch fail — the
            // restarted incarnation's next drain retries.
            try {
              val reqs = triageBulk(queue, drained)
              if (reqs.nonEmpty) {
                exec(idsOf(reqs), id)
                doneLog.record(queue, reqs.map(_.key))
              }
            } catch {
              case e: Throwable =>
                // skip keys triage already re-parked mid-flight (a second
                // copy would double-count bulkReadFailures and eventually
                // dead-letter the same request twice) and keys already
                // done-logged (executed or dead-lettered)
                import scala.jdk.CollectionConverters._
                val queued = Option(pendingTakedowns.get(queue))
                  .map(_.iterator().asScala.map(_.key).toSet)
                  .getOrElse(Set.empty[String])
                // doneLog.contains is non-throwing here only because
                // takedownSink loaded this queue's segments before any
                // request could be parked (load-before-park). The guard
                // must survive a FAILING DISK regardless of that
                // invariant holding for future caller paths: if the
                // done-log check itself throws, fall back to re-parking
                // everything not currently queued — a re-parked done key
                // is redundant (the done-log suppresses it at the next
                // drain), a LOST key is a dropped takedown. NonFatal
                // only: it still covers the failing-disk IOExceptions
                // this guard targets, while an interrupt or a VM error
                // (OOM, stack overflow) mid-check propagates instead of
                // being converted into a silent "not done".
                val done = (k: String) =>
                  try doneLog.contains(queue, k)
                  catch { case scala.util.control.NonFatal(_) => false }
                reparkPending(queue, drained.filterNot(r =>
                  queued.contains(r.key) || done(r.key)))
                throw e
            }
          }
        }
        handler(batch, id,
          out => out.write.mode("append").parquet(s"$dir/$ackSubdir"))
      },
      takedownSink = ccd => {
        if (takedown.nonEmpty) {
          if (!doneLog.contains(ccd.queue, ccd.key)) {
            pendingTakedowns
              .computeIfAbsent(ccd.queue,
                _ => new java.util.concurrent.ConcurrentLinkedQueue[TakedownReq]())
              .add(TakedownReq(ccd.key, ccd.offset,
                if (ccd.offset < 0) ccd.error else None))
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
    // boot-time log compaction: runs BEFORE the control stream starts
    // (the only quiescent moment the single-service contract guarantees)
    compactControlLog(spark, controlDir, checkpointRoot)
    val control = spark.readStream.schema(CcdSchema).parquet(controlDir)
      .as[Pipelines.Ccd]
    (system, system.start(control, trigger))
  }

  /** The opt-in BACKGROUND maintenance executor the compositions share
    * (retrieval's drift+compaction sweep, curation's compaction sweep):
    * one daemon thread firing `sweep` at `periodMs`, so the sweeping
    * queue's trigger never pays fold/retrain wall-clock — at a 10^10-row
    * base the in-loop fold is hours of that queue's OWN ingest stall per
    * major. The indexes' busy-signal/stand-down machinery (shared
    * rebuild flags) makes the concurrent sweep safe against the writer
    * and against a second sweep; a throwing sweep degrades to a
    * rate-limited log (O18) — the executor must survive transient
    * faults. Stops with the system, before the service leases release. */
  private[streaming] def startBackgroundMaintenance(
      system: GraftSystem, periodMs: Long, sweep: () => Unit): Unit = {
    val exec = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "graft-maintenance"); t.setDaemon(true); t
      })
    val limiter = new graft.metrics.Observability.RateLimiter(60000L)
    exec.scheduleWithFixedDelay(
      () => guardedSweep(sweep, () => exec.isShutdown, limiter),
      periodMs, periodMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    system.onStop(() => { exec.shutdownNow(); () })
  }

  /** One guarded maintenance-sweep invocation — the fault discipline the
    * periodic executor runs under, factored out so each arm is directly
    * testable. The InterruptedException shutdownNow raises during an
    * in-flight sweep is orderly teardown, not a failed sweep; a
    * NON-shutdown interrupt (some other actor poking the thread) must
    * not kill the periodic task — restore the flag and keep sweeping.
    * Transient (NonFatal) faults log rate-limited and keep the task
    * alive. An OOM/LinkageError still propagates (a JVM in that state
    * should not keep the executor spinning) — but it is logged FIRST,
    * unconditionally: a propagating throwable lands in the
    * never-inspected scheduled Future, so without that line the
    * maintenance task would die SILENTLY while ingest runs on with no
    * compaction/drift sweeps. */
  private[graft] def guardedSweep(
      sweep: () => Unit, isShutdown: () => Boolean,
      limiter: graft.metrics.Observability.RateLimiter): Unit =
    try sweep()
    catch {
      case _: InterruptedException if isShutdown() => ()
      case e: InterruptedException =>
        Thread.currentThread().interrupt()
        limiter.tryAcquire("maintenance").foreach(suppressed =>
          Pipelines.log.error(
            s"background maintenance sweep interrupted outside shutdown " +
              s"(task kept alive; $suppressed earlier failures " +
              s"suppressed): ${e.getMessage}", e))
      case scala.util.control.NonFatal(e) =>
        limiter.tryAcquire("maintenance").foreach(suppressed =>
          Pipelines.log.error(
            s"background maintenance sweep failed (ingest unaffected; " +
              s"$suppressed earlier failures suppressed): ${e.getMessage}", e))
      case e: Throwable =>
        Pipelines.log.error(
          "background maintenance sweep hit a FATAL error — the " +
            "periodic task is cancelled and will NOT run again until " +
            s"service restart: ${e.getMessage}", e)
        throw e
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
    // boot-time log compaction (see compactControlLog): the plain O19
    // service writes no done-log, so its takedown CCDs — if any — all
    // read as pending and survive the fold
    compactControlLog(spark, cfg.controlDir, cfg.checkpointRoot)
    val control = spark.readStream.schema(CcdSchema).parquet(cfg.controlDir).as[Ccd]
    val q = system.start(control, cfg.controlTrigger)
    (system, q)
  }
}

/** The executed-takedowns ledger behind [[Service.assembleComposition]]'s
  * replay suppression: per queue, a directory of immutable line-oriented
  * SEGMENTS under `checkpointRoot/_takedowns_done/<queue>`, one line per
  * executed request KEY (the CCD's unique identity — suppression matches
  * exactly the replayed request, never a later legitimate takedown of the
  * same doc id). Each executing micro-batch appends ONE segment, written
  * temp-then-rename: atomic, so a crash can lose only the in-flight
  * segment (its requests re-execute once — idempotent, the safe
  * direction), never the history a torn in-place rewrite could. When the
  * segment count passes `maxSegments` they merge into one, so per-batch
  * work is O(new requests) and the file count stays bounded — a
  * GDPR-volume takedown stream never makes every batch rewrite the full
  * log. Reads the round-14 single-FILE layout (lines = doc ids, whose
  * keys were `takedown:<queue>:<id>`) on first touch so an upgrade
  * doesn't re-execute pre-upgrade history. Single-writer per composition
  * (the batch handlers), like everything else under the checkpoint root.
  *
  * The suppression set (disk and memory) is O(|REQUESTS ever|), which is
  * control-plane-sized by design: a volume removal rides
  * [[Service.appendTakedownBulk]] as ONE request — one key here —
  * regardless of |ids|; per-doc CCDs at 10^6-id scale would flood the
  * control topic itself long before this set mattered. */
private[graft] final class TakedownDoneLog(
    hconf: org.apache.hadoop.conf.Configuration, checkpointRoot: String,
    maxSegments: Int = 64) {
  import org.apache.hadoop.fs.{FileSystem, Path}

  // (queue, request key) pairs already executed — seeded from disk at
  // first touch, grown in-memory as executions land
  private val executed = java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()
  private val loaded = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def dirOf(queue: String) = new Path(
    s"$checkpointRoot/_takedowns_done/${queue.replaceAll("[^A-Za-z0-9._-]", "_")}")
  // migration parking spot for the round-14 single-file layout: the old
  // FILE occupies the path the segment DIRECTORY needs, so record() moves
  // it aside rather than deleting it unread — a crash mid-migration must
  // not lose the pre-upgrade suppression history (load() reads this too)
  private def legacyAside(queue: String) = new Path(dirOf(queue).toString + ".legacy")
  private def segNum(name: String): Option[Long] =
    if (name.startsWith("seg-")) name.stripPrefix("seg-").toLongOption else None
  private def readLines(fs: FileSystem, p: Path)(f: String => Unit): Unit = {
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(p), java.nio.charset.StandardCharsets.UTF_8))
    try Iterator.continually(in.readLine()).takeWhile(_ != null)
      .filter(_.nonEmpty).foreach(f)
    finally in.close()
  }
  private def writeSeg(fs: FileSystem, dir: Path, n: Long, keys: Seq[String]): Unit = {
    val tmpP = new Path(dir, ".tmp-seg")
    val out = fs.create(tmpP, true)
    try out.write(keys.map(k => s"$k\n").mkString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // a silently-failed rename would leave these keys non-durable while
    // record() proceeds (and a later merge deletes old segments from the
    // in-memory set) — fail the batch loudly instead; the re-park/replay
    // machinery handles it
    val seg = new Path(dir, f"seg-$n%09d")
    if (!fs.rename(tmpP, seg))
      throw new java.io.IOException(s"done-log segment rename failed: $tmpP -> $seg")
  }
  private def readLegacy(fs: FileSystem, p: Path, queue: String)(f: String => Unit): Unit =
    readLines(fs, p)(l => if (l.matches("\\d+")) f(s"takedown:$queue:$l"))

  private def load(queue: String): Unit =
    if (loaded.add(queue)) {
      val p = dirOf(queue)
      val fs = p.getFileSystem(hconf)
      if (fs.exists(p)) {
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).filter(st => segNum(st.getPath.getName).nonEmpty)
            .foreach(st => readLines(fs, st.getPath)(k => executed.add((queue, k))))
        else
          readLegacy(fs, p, queue)(k => executed.add((queue, k)))
      }
      // a crash mid-migration leaves the legacy file parked aside with its
      // keys not yet in a segment — still part of the suppression set
      val aside = legacyAside(queue)
      if (fs.exists(aside))
        readLegacy(fs, aside, queue)(k => executed.add((queue, k)))
    }

  /** Was this exact request already executed? (Seeds from disk on the
    * queue's first touch.) */
  def contains(queue: String, key: String): Boolean = {
    load(queue)
    executed.contains((queue, key))
  }

  /** All executed request keys for `queue` (seeded from disk on first
    * touch) — the set boot-time control-log compaction anti-joins
    * against. Returns the in-memory suppression set's view: no new
    * driver footprint beyond what [[contains]] already holds. */
  def executedKeys(queue: String): Seq[String] = {
    load(queue)
    import scala.jdk.CollectionConverters._
    executed.asScala.collect { case (q, k) if q == queue => k }.toSeq
  }

  /** All executed (queue, key) pairs for `queues` in ONE pass over the
    * in-memory set — boot compaction's anti-join feed. Per-queue
    * [[executedKeys]] would rescan the whole cross-queue set per queue
    * (O(queues × total done keys) exactly when heavy per-id takedown
    * traffic makes the set large). */
  def executedPairs(queues: Seq[String]): Seq[(String, String)] = {
    queues.foreach(load)
    val qs = queues.toSet
    import scala.jdk.CollectionConverters._
    executed.asScala.iterator.filter(p => qs.contains(p._1)).toSeq
  }

  /** Record executed request keys: one new immutable segment, then a
    * merge when the count passes `maxSegments`. */
  def record(queue: String, keys: Seq[String]): Unit = {
    load(queue)
    val dir = dirOf(queue)
    val fs = dir.getFileSystem(hconf)
    // round-14 single-file layout occupies the directory's path: park it
    // ASIDE (never delete-unread — a crash between here and the segment
    // rename must not lose the pre-upgrade history; load() reads the
    // aside file too), fold its keys into the first segment, and drop
    // the aside only once that segment is durably renamed in
    val aside = legacyAside(queue)
    if (fs.exists(dir) && !fs.getFileStatus(dir).isDirectory &&
        !fs.rename(dir, aside))
      throw new java.io.IOException(
        s"done-log legacy migration rename failed: $dir -> $aside")
    val legacyKeys =
      if (fs.exists(aside)) {
        val b = Seq.newBuilder[String]
        readLegacy(fs, aside, queue)(b += _)
        b.result()
      } else Seq.empty
    fs.mkdirs(dir)
    val segs = fs.listStatus(dir).flatMap(st => segNum(st.getPath.getName)).sorted
    val next = segs.lastOption.getOrElse(-1L) + 1
    writeSeg(fs, dir, next, legacyKeys ++ keys)
    // the in-memory set grows only AFTER the segment is durably renamed:
    // adding first would make contains() true for keys whose record()
    // then failed, so the takedown drain's re-park filter would drop
    // exactly the requests that most need a retry — a suppression entry
    // that exists nowhere durable, silently lost at the next reboot
    keys.foreach(k => executed.add((queue, k)))
    if (fs.exists(aside)) fs.delete(aside, false) // now durable in the segment
    if (segs.length + 1 > maxSegments) {
      // merge: one segment holding the full executed set, then drop the
      // inputs — a crash between the rename and the deletes leaves
      // duplicate keys across segments, which the set load absorbs
      import scala.jdk.CollectionConverters._
      val all = executed.asScala.collect { case (q, k) if q == queue => k }.toSeq.sorted
      writeSeg(fs, dir, next + 1, all)
      (segs :+ next).foreach(n => fs.delete(new Path(dir, f"seg-$n%09d"), false))
    }
  }

  /** Segment-file count for a queue (tests/inspection). */
  def segmentCount(queue: String): Int = {
    val dir = dirOf(queue)
    val fs = dir.getFileSystem(hconf)
    if (fs.exists(dir) && fs.getFileStatus(dir).isDirectory)
      fs.listStatus(dir).count(st => segNum(st.getPath.getName).nonEmpty)
    else 0
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
