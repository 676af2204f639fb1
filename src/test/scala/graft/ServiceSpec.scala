package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{Service, Pipelines}
import graft.streaming.Pipelines.Ccd

/** Boot-path test (main.clj analogue): a file-backed control topic drives
  * GraftSystem whose data planes read the graft-changelog DSv2 source —
  * activation, keyed delivery, late activation of a second queue, and
  * deactivation, all through the assembled service. */
class ServiceSpec extends SparkSpec {

  test("stored DSIR model: versioned save/load round trip, latest wins") {
    import graft.functions.Sampling
    val root = Files.createTempDirectory("dsir_model").toString
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1).toSeq
    // nothing stored yet -> loud failure, not an empty model
    intercept[IllegalStateException](Sampling.loadDsirModel(spark, root))
    val m0 = Sampling.dsirLogRatioModel(spark, sf0001)
    assert(Sampling.saveDsirModel(m0, root) == 0)
    assert(rows(Sampling.loadDsirModel(spark, root)) == rows(m0))
    // offline retrain (different target) supersedes as version 1
    val m1 = Sampling.dsirLogRatioModel(spark, sf0001, targetSource = "src1")
    assert(Sampling.saveDsirModel(m1, root) == 1)
    assert(rows(Sampling.loadDsirModel(spark, root)) == rows(m1),
      "latest version must win")
    assert(rows(Sampling.loadDsirModel(spark, root, version = 0)) == rows(m0),
      "historical versions stay addressable")
    assert(rows(m0) != rows(m1), "retrain must actually change the model")
  }

  test("assembled service: control activation -> changelog-sourced queue delivers keyed output") {
    val sparkS = spark
    import sparkS.implicits._
    val root = Files.createTempDirectory("svc").toString
    val (controlDir, dataRoot, outRoot, ckptRoot) =
      (s"$root/control", s"$root/data", s"$root/out", s"$root/ckpt")

    // data for queue LP.Q1: a small changelog whose value column is a DML envelope
    Seq.tabulate(20) { i =>
      (i.toLong, s"""{"id":{"k":$i},"type":"insert","table":"t","data":{}}""")
    }.toDF("event_id", "props").coalesce(1).write.parquet(s"$dataRoot/LP.Q1")

    // control topic: activate LP.Q1
    Service.appendControl(spark, controlDir, Ccd("k1", "active", "LP.Q1", 0))

    val metricsDir = s"$root/metrics"
    val (system, control) = Service.assemble(spark, Service.Config(
      controlDir, dataRoot, outRoot, ckptRoot,
      controlTrigger = Trigger.ProcessingTime("200 milliseconds"),
      queueTrigger = Trigger.AvailableNow(),
      metricsDir = Some(metricsDir), metricsIntervalMs = 250L))
    try {
      val deadline = System.currentTimeMillis() + 60000
      def mainRows() =
        try sparkS.read.parquet(s"$outRoot/LP.Q1/main").count()
        catch { case _: Exception => -1L }
      while (mainRows() != 20 && System.currentTimeMillis() < deadline) Thread.sleep(250)
      assert(mainRows() == 20, "activated queue must drain its changelog")
      val keys = sparkS.read.parquet(s"$outRoot/LP.Q1/main")
        .select("key").collect().map(_.getString(0)).toSet
      assert(keys == (0 until 20).map(i => s"""["k",$i]""").toSet)

      // O17 boot wiring: the reporter must be emitting jsonl snapshots with
      // the active-queue gauge while the service runs (main.clj:45-53)
      def metricsFiles() = {
        val d = new java.io.File(metricsDir)
        if (d.exists()) d.listFiles().filter(_.getName.endsWith(".jsonl")) else Array.empty[java.io.File]
      }
      val dlm = System.currentTimeMillis() + 30000
      while (metricsFiles().isEmpty && System.currentTimeMillis() < dlm) Thread.sleep(100)
      assert(metricsFiles().nonEmpty, "metrics reporter must write jsonl while running")
      val lines = metricsFiles().flatMap(f =>
        scala.io.Source.fromFile(f).getLines().toSeq)
      assert(lines.exists(_.contains("\"active-queues\":")),
        s"snapshot must carry the active-queue gauge: ${lines.take(3).mkString(" | ")}")

      // deactivation via the same file-backed control topic
      Service.appendControl(spark, controlDir, Ccd("k1", "inactive", "LP.Q1", 1))
      val dl2 = System.currentTimeMillis() + 30000
      while (system.orchestrator.activeQueues.nonEmpty && System.currentTimeMillis() < dl2)
        Thread.sleep(250)
      assert(system.orchestrator.activeQueues.isEmpty, "deactivation must stop the queue")

      // lifecycle: populate a session cache while the service runs, then
      // prove system.stop() releases it (the GraftCaches closer)
      graft.functions.Bpe.cachedMerges(spark, sf0001)
      assert(GraftCaches.entriesFor(spark) > 0)
    } finally { control.stop(); system.stop() }
    assert(GraftCaches.entriesFor(spark) == 0,
      "system.stop() must release the session's artifact caches")
  }
}
