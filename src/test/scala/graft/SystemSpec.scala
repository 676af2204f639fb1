package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.GraftSystem
import graft.streaming.Pipelines.Ccd

/** Shared mutable state for udf closures (same-JVM local mode). */
object SystemSpecState {
  val transientFails = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Full-system test: control plane activates queues, each queue's data
  * plane derives keys and dead-letters malformed payloads into its own
  * sink — EP2 + EP3 composed, the reference's whole dataflow. */
class SystemSpec extends SparkSpec {

  test("control activation drives per-queue data pipelines end to end") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext
    val outRoot = Files.createTempDirectory("sys_out").toString
    val ckptRoot = Files.createTempDirectory("sys_ckpt").toString

    // per-queue data sources: Q1 gets 2 good + 1 malformed payload, Q2 gets 1
    val q1Data = MemoryStream[String]
    val q2Data = MemoryStream[String]
    q1Data.addData(
      """{"id":{"a":1},"type":"insert","table":"t1","data":{}}""",
      """{"id":{"a":2},"type":"update","table":"t1","data":{}}""",
      "NOT JSON AT ALL")
    q2Data.addData("""{"id":{"b":"x"},"type":"delete","table":"t2","data":{}}""")
    val sources = Map("LP.Q1" -> q1Data, "LP.Q2" -> q2Data)

    val system = new GraftSystem(
      q => sources(q).toDF().toDF("value"),
      outRoot, ckptRoot, queueTrigger = Trigger.AvailableNow())

    val control = MemoryStream[Ccd]
    // Q1 active; Q2 stays pending -> only Q1's pipeline must run
    control.addData(Ccd("k1", "active", "LP.Q1", 0), Ccd("k2", "pending", "LP.Q2", 1))
    val ctl = system.start(control.toDS(), Trigger.AvailableNow())
    try {
      ctl.awaitTermination()
      assert(system.orchestrator.activeQueues == Set("LP.Q1"))
      // wait for the Q1 data-plane query (AvailableNow) to drain
      sparkS.streams.active.filter(_.name == "graft-queue-LP.Q1").foreach(_.awaitTermination())
      val main = sparkS.read.parquet(s"$outRoot/LP.Q1/main")
      assert(main.count() == 2)
      assert(main.select("key").collect().map(_.getString(0)).toSet ==
        Set("""["a",1]""", """["a",2]"""))
      assert(sparkS.read.parquet(s"$outRoot/LP.Q1/dead_letter").count() == 1)
      assert(!new java.io.File(s"$outRoot/LP.Q2").exists(), "inactive queue must not run")
    } finally system.stop()
  }

  test("transient failure: the supervised queue restarts, recovers, and delivers (no error CCD)") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext
    val outRoot = Files.createTempDirectory("sys_rec_out").toString
    val ckptRoot = Files.createTempDirectory("sys_rec_ckpt").toString
    SystemSpecState.transientFails.set(1) // fail exactly the first batch attempt
    val flaky = org.apache.spark.sql.functions.udf((s: String) =>
      if (SystemSpecState.transientFails.getAndDecrement() > 0)
        throw new RuntimeException("transient fault") else s)
    val data = MemoryStream[String]
    data.addData("""{"id":{"a":1},"type":"insert","table":"t","data":{}}""")
    val control = MemoryStream[Ccd]
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Ccd]()
    val system = new GraftSystem(
      _ => data.toDF().select(flaky(org.apache.spark.sql.functions.col("value")).as("value")),
      outRoot, ckptRoot, queueTrigger = Trigger.AvailableNow(),
      maxRestartsPerQueue = 3, restartSleep = _ => (),
      errorSink = ccd => { errors.add(ccd); () })
    control.addData(Ccd("k1", "active", "LP.FLAKY", 0))
    val ctl = system.start(control.toDS(), Trigger.AvailableNow())
    try {
      ctl.awaitTermination()
      // wait for the restarted incarnation to drain and write
      val deadline = System.currentTimeMillis() + 90000
      def delivered =
        try sparkS.read.parquet(s"$outRoot/LP.FLAKY/main").count() == 1
        catch { case _: Exception => false } // dir absent or no footer yet
      while (!delivered && System.currentTimeMillis() < deadline) Thread.sleep(200)
      assert(delivered, "restarted queue must deliver the batch")
      assert(errors.isEmpty, s"a recovered queue must not post an error CCD: $errors")
      assert(system.orchestrator.activeQueues == Set("LP.FLAKY"))
    } finally { ctl.stop(); system.stop() }
  }

  test("poison queue: exhausted restarts write an error CCD back; the queue is deactivated, not restarted") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext
    val outRoot = Files.createTempDirectory("sys_err_out").toString
    val ckptRoot = Files.createTempDirectory("sys_err_ckpt").toString

    // a data source whose evaluation always fails mid-batch
    val poison = org.apache.spark.sql.functions.udf((s: String) =>
      if (s != null) throw new RuntimeException("poison payload") else s)
    val data = MemoryStream[String]
    data.addData("""{"id":{"a":1},"type":"insert","table":"t","data":{}}""")
    val sourceCalls = new java.util.concurrent.atomic.AtomicInteger(0)

    val control = MemoryStream[Ccd]
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Ccd]()
    val system: GraftSystem = new GraftSystem(
      q => { sourceCalls.incrementAndGet()
             data.toDF().select(poison(org.apache.spark.sql.functions.col("value")).as("value")) },
      outRoot, ckptRoot, queueTrigger = Trigger.AvailableNow(),
      maxRestartsPerQueue = 1, restartSleep = _ => (),
      errorSink = ccd => { errors.add(ccd); control.addData(ccd); () })

    control.addData(Ccd("k1", "active", "LP.POISON", 0))
    val ctl = system.start(control.toDS(), Trigger.ProcessingTime("100 milliseconds"))
    try {
      // wait for: activation -> initial run + 1 restart fail -> error CCD
      var tries = 0
      while (errors.isEmpty && tries < 100) { Thread.sleep(100); tries += 1 }
      assert(!errors.isEmpty, "exhausted supervision must emit an error CCD")
      val ccd = errors.peek()
      assert(ccd.status == "error" && ccd.queue == "LP.POISON" && ccd.key == "k1")
      assert(ccd.offset > 0, "error CCD must win last-write-wins compaction")
      assert(ccd.error.exists(_.contains("poison")), s"error detail expected: ${ccd.error}")
      // the control plane must process the write-back and deactivate
      tries = 0
      while (system.orchestrator.activeQueues.nonEmpty && tries < 100) { Thread.sleep(100); tries += 1 }
      assert(system.orchestrator.activeQueues.isEmpty, "poison queue must be deactivated")
      assert(system.orchestrator.compactedState("k1").status == "error")
      val callsAtDeactivation = sourceCalls.get()
      Thread.sleep(500)
      assert(sourceCalls.get() == callsAtDeactivation, "queue must not restart after deactivation")
    } finally { ctl.stop(); system.stop() }
  }
}
