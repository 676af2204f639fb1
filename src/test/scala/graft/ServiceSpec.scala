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

  test("curation service e2e: control-driven multi-batch ingest, kill/restart mid-flush, decisions match batch x71") {
    import graft.streaming.CurationService
    val sparkS = spark
    import sparkS.implicits._
    val root = Files.createTempDirectory("cursvc").toString
    val (controlDir, dataRoot, outRoot, ckptRoot) =
      (s"$root/control", s"$root/data", s"$root/out", s"$root/ckpt")
    val queue = "CUR.DOCS"
    val docsDir = s"$dataRoot/$queue"
    val decisionsDir = s"$outRoot/$queue/decisions"

    // 32-token family texts (over Curation.MinTokens = 30); a near-dup
    // variant swaps the last three words (trigram Jaccard ≈ 0.7 ≥ 0.5)
    def fam(k: Int): String = (0 until 32).map(i => s"fam${k}w$i").mkString(" ")
    def famVar(k: Int): String =
      ((0 until 29).map(i => s"fam${k}w$i") ++ (0 until 3).map(i => s"vfam${k}x$i")).mkString(" ")

    def append(rows: (Long, String)*): Unit =
      rows.toSeq.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(docsDir)

    def decisions(): Map[Long, (String, Option[Long], Option[String])] =
      try sparkS.read.parquet(decisionsDir).distinct().collect()
        .map(r => r.getLong(0) -> ((r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getString(3))))).toMap
      catch { case _: Exception => Map.empty }
    def awaitDecided(ids: Long*): Unit = {
      val deadline = System.currentTimeMillis() + 180000
      while (!ids.forall(decisions().contains) && System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      assert(ids.forall(decisions().contains),
        s"missing decisions for ${ids.filterNot(decisions().contains)}: ${decisions()}")
    }

    // flushEvery = 2: batches 0,2,4 stage without flushing — the state the
    // mid-flush kill interrupts
    val svc = new CurationService(sparkS, s"$root/exact", s"$root/near", flushEvery = 2)
    svc.initEmpty()
    Service.appendControl(spark, controlDir, Ccd("c1", "active", queue, 0))
    // batch 0: two kept families + a gate reject
    append(1000L -> fam(0), 1001L -> "too short", 1002L -> fam(1))
    var (system, control) = CurationService.assemble(sparkS, svc,
      controlDir, dataRoot, outRoot, ckptRoot,
      trigger = Trigger.ProcessingTime("200 milliseconds"))
    try {
      awaitDecided(1000L, 1001L, 1002L)
      // batch 1: novel family; its flush boundary publishes A/B/C
      append(1005L -> fam(2))
      awaitDecided(1005L)
      // batch 2: exact + near dups of the now-FLUSHED family A, plus a
      // novel family D that will sit STAGED when the kill lands (doc ids
      // keep increasing — the changelog offset contract)
      append(1006L -> fam(0), 1007L -> famVar(0), 1008L -> fam(3))
      awaitDecided(1006L, 1007L, 1008L)
    } finally { control.stop(); system.stop() }
    svc.close()

    // ---- kill/restart MID-FLUSH: family D is staged but unflushed ----
    assert(new java.io.File(s"$root/exact/staging").exists() ||
      new java.io.File(s"$root/near/sig_staging").exists(),
      "the kill must land with staged-but-unflushed acceptances")
    val svc2 = new CurationService(sparkS, s"$root/exact", s"$root/near", flushEvery = 2)
    val (system2, control2) = CurationService.assemble(sparkS, svc2,
      controlDir, dataRoot, outRoot, ckptRoot,
      trigger = Trigger.ProcessingTime("200 milliseconds"))
    try {
      // batch 3: in-batch near-dup pair E + in-batch exact pair F; its
      // flush boundary folds the pre-kill staged family D too
      append(1009L -> fam(4), 1010L -> famVar(4), 1011L -> fam(5), 1012L -> fam(5))
      awaitDecided(1009L, 1010L, 1011L, 1012L)
      // batch 4: dups of family D — only correct if the restart preserved
      // and folded D's staged acceptance
      append(1013L -> famVar(3), 1014L -> fam(3))
      awaitDecided(1013L, 1014L)
    } finally { control2.stop(); system2.stop() }

    // ---- parity with the batch x71 recompute on the TOTAL corpus ----
    val d = decisions()
    val expectKeeper = Map(
      1006L -> 1000L, 1007L -> 1000L, // flushed-family dups
      1010L -> 1009L, 1012L -> 1011L, // in-batch near/exact pairs
      1013L -> 1008L, 1014L -> 1008L) // dups of the mid-flush-staged family
    for ((id, keeper) <- expectKeeper)
      assert(d(id)._2.contains(keeper),
        s"doc $id must defer to keeper $keeper, got ${d(id)}")
    assert(d(1001L)._1 == "gated_out")
    val allDocs = Seq(
      1000L -> fam(0), 1001L -> "too short", 1002L -> fam(1), 1005L -> fam(2),
      1006L -> fam(0), 1007L -> famVar(0), 1008L -> fam(3),
      1009L -> fam(4), 1010L -> famVar(4), 1011L -> fam(5), 1012L -> fam(5),
      1013L -> famVar(3), 1014L -> fam(3))
    val batchTruth = graft.functions.Curation.x71PretrainPipelineOf(sparkS,
      allDocs.toDF("doc_id", "text").withColumn("source", lit("s")),
      s"$root|x71truth")
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val keptService = d.collect { case (id, ("kept", _, Some(split))) => id -> split }
    assert(keptService == batchTruth,
      s"streamed kept set must equal the batch x71 recompute:\n$keptService\nvs\n$batchTruth")
    // rejected service docs carry NO split — near-dups can never straddle
    // the split because only canonicals are split at all
    assert(d.forall { case (_, (st, _, sp)) => (st == "kept") == sp.nonEmpty })
    GraftCaches.release(sparkS, s"$root|x71truth")
    svc2.close()
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
      val deadline = System.currentTimeMillis() + 180000
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
      val dlm = System.currentTimeMillis() + 90000
      while (metricsFiles().isEmpty && System.currentTimeMillis() < dlm) Thread.sleep(100)
      assert(metricsFiles().nonEmpty, "metrics reporter must write jsonl while running")
      val lines = metricsFiles().flatMap(f =>
        scala.io.Source.fromFile(f).getLines().toSeq)
      assert(lines.exists(_.contains("\"active-queues\":")),
        s"snapshot must carry the active-queue gauge: ${lines.take(3).mkString(" | ")}")

      // deactivation via the same file-backed control topic
      Service.appendControl(spark, controlDir, Ccd("k1", "inactive", "LP.Q1", 1))
      val dl2 = System.currentTimeMillis() + 90000
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
