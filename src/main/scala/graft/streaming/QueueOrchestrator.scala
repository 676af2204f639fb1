package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.streaming.Pipelines.Ccd

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** O9/O19 — dynamic per-queue stream fan-out (reference EP2,
  * jms_publisher.clj:199-232): consume the CCD control stream, and for each
  * queue whose latest CCD is `active`, keep exactly one live data-plane
  * query running; stop queries for queues that leave the active set.
  *
  * Design (SURVEY.md §3 EP2): one Structured Streaming query over the whole
  * control log (snapshot∪tail unified by replay — the reference's race is
  * impossible by construction); per micro-batch the driver folds the batch
  * into a compacted key→latest-CCD map (the control plane is control-sized:
  * |queues| entries, the same data the reference keeps in an atom —
  * kafka_ccd_store.clj:28-42) and diffs the active set against the
  * registry. Start is idempotent (registry keyed by queue, mirroring
  * jms_publisher.clj:210); deactivation stops the query. Spark multiplexes
  * data-plane work across executors, so "one query per queue" costs a
  * driver thread + a checkpoint, not an OS-level listener.
  */
class QueueOrchestrator(startQueue: String => StreamingQuery,
                        onTakedown: Ccd => Unit = _ => ()) {

  private val registry = new ConcurrentHashMap[String, StreamingQuery]()
  /** key → latest-by-offset CCD (last-write-wins compaction, O2). */
  private val state = mutable.Map[String, Ccd]()

  /** Queues with a running data-plane query. */
  def activeQueues: Set[String] = registry.keySet().asScala.toSet

  /** Latest compacted control state (for tests/inspection). */
  def compactedState: Map[String, Ccd] = synchronized { state.toMap }

  /** Fold a control-batch into the compacted state, then reconcile.
    * `status = "takedown"` CCDs are REQUEST records, not queue
    * lifecycle: they route to `onTakedown` (offset-ordered for
    * determinism) and never enter the compacted state — a removal
    * request is an event to execute, not a latest-wins condition to
    * hold, and compacting every request forever would grow the
    * control-sized state map with the takedown history. Boot's full
    * control-log replay re-delivers them; execution must therefore be
    * idempotent (re-staging a tombstone is). */
  private[graft] def processBatch(batch: Seq[Ccd]): Unit = synchronized {
    val (requests, lifecycle) = batch.partition(_.status == "takedown")
    requests.sortBy(_.offset).foreach(onTakedown)
    lifecycle.foreach { ccd =>
      state.get(ccd.key) match {
        case Some(prev) if prev.offset >= ccd.offset => // stale, ignore
        case _ => state.update(ccd.key, ccd)
      }
    }
    val active = state.values.filter(_.status == "active").map(_.queue).toSet
    active.diff(activeQueues).foreach { q =>
      registry.computeIfAbsent(q, queue => startQueue(queue)); ()
    }
    activeQueues.diff(active).foreach { q =>
      Option(registry.remove(q)).foreach(_.stop())
    }
  }

  /** Attach to a CCD control stream; returns the control StreamingQuery.
    * On restart the checkpointed control log replays, compaction
    * reconstructs the state, and reconcile restarts exactly the active
    * queues. */
  def run(controlStream: Dataset[Ccd], checkpointDir: String,
          trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery = {
    val enc = controlStream.encoder
    controlStream.toDF()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch.as[Ccd](enc).collect().toSeq)
      }
      .start()
  }

  /** Stop all managed queries (shutdown hook path, main.clj:62 analogue). */
  def stopAll(): Unit = {
    registry.values().asScala.foreach(_.stop())
    registry.clear()
  }
}
