package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.streaming.{Pipelines, QueueOrchestrator}
import graft.streaming.Pipelines.Ccd

/** EP2 control plane: activation starts a per-queue query exactly once,
  * stale offsets lose, deactivation stops the query (reference
  * jms_publisher.clj:199-232 semantics, race-free by replay design). */
class OrchestratorSpec extends SparkSpec {

  /** A lightweight always-running data-plane query stand-in: a rate stream
    * to a noop-ish memory sink (we only care about lifecycle). */
  private def dummyQuery(name: String): StreamingQuery =
    spark.readStream.format("rate").option("rowsPerSecond", "1").load()
      .writeStream.format("memory").queryName(s"dummy_${name.replace('.', '_')}")
      .option("checkpointLocation", Files.createTempDirectory("orch_q").toString)
      .start()

  test("orchestrator lifecycle: idempotent start, stale-offset ignore, stop on deactivate") {
    val started = new ConcurrentLinkedQueue[String]()
    val orch = new QueueOrchestrator(q => { started.add(q); dummyQuery(q) })
    try {
      orch.processBatch(Seq(
        Ccd("k1", "active", "LP.Q1", 1), Ccd("k2", "pending", "LP.Q2", 1)))
      assert(orch.activeQueues == Set("LP.Q1"))
      // k2 activates; re-activation of k1 must not start a second query
      orch.processBatch(Seq(Ccd("k2", "active", "LP.Q2", 5), Ccd("k1", "active", "LP.Q1", 6)))
      assert(orch.activeQueues == Set("LP.Q1", "LP.Q2"))
      assert(started.size() == 2, s"start must be idempotent, saw $started")
      // stale error for k1 (offset 3 < 6) must be ignored
      orch.processBatch(Seq(Ccd("k1", "error", "LP.Q1", 3)))
      assert(orch.activeQueues == Set("LP.Q1", "LP.Q2"))
      // real error at offset 9 stops Q1
      orch.processBatch(Seq(Ccd("k1", "error", "LP.Q1", 9)))
      assert(orch.activeQueues == Set("LP.Q2"))
      assert(orch.compactedState("k1").status == "error")
    } finally orch.stopAll()
    assert(orch.activeQueues.isEmpty)
  }

  test("re-activation after error restarts the queue (operator fixes and reposts active)") {
    val started = new ConcurrentLinkedQueue[String]()
    val orch = new QueueOrchestrator(q => { started.add(q); dummyQuery(q) })
    try {
      orch.processBatch(Seq(Ccd("k1", "active", "LP.Q1", 1)))
      orch.processBatch(Seq(Ccd("k1", "error", "LP.Q1", 2, Some("boom"))))
      assert(orch.activeQueues.isEmpty)
      // operator fixes the underlying issue and re-activates at a higher offset
      orch.processBatch(Seq(Ccd("k1", "active", "LP.Q1", 3)))
      assert(orch.activeQueues == Set("LP.Q1"))
      assert(started.size() == 2, "re-activation must start a fresh query")
    } finally orch.stopAll()
  }

  test("orchestrator end-to-end over a streamed control log") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext
    val started = new ConcurrentLinkedQueue[String]()
    val orch = new QueueOrchestrator(q => { started.add(q); dummyQuery(q) })
    val in = MemoryStream[Ccd]
    in.addData(Ccd("k1", "active", "LP.Q1", 0), Ccd("k2", "active", "LP.Q2", 1),
      Ccd("k2", "error", "LP.Q2", 2))
    val control = orch.run(in.toDS(),
      Files.createTempDirectory("orch_ctl").toString, Trigger.AvailableNow())
    try {
      control.awaitTermination()
      assert(orch.activeQueues == Set("LP.Q1"))
      assert(started.asScala.toSet == Set("LP.Q1"))
    } finally { control.stop(); orch.stopAll() }
  }

  private implicit class QAsScala[A](q: ConcurrentLinkedQueue[A]) {
    def asScala: Iterator[A] = { import scala.jdk.CollectionConverters._; q.iterator().asScala }
  }
}
