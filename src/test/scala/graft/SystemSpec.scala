package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.GraftSystem
import graft.streaming.Pipelines.Ccd

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
}
