package graft

import org.apache.spark.sql.functions._

/** Round-17: compliance-path and serving-path hardening.
  *
  *  - The maintained near-dup index's TAKEDOWN physically GCs the deleted
  *    docs' rows from BOTH stored relations at the major (the x91 oracle
  *    pins the served screen; this spec pins the physical layout claims
  *    the oracle can't see).
  *  - Reopened maintainers (x92/x93) resume the exact stored state: the
  *    restart path re-derives version, floor, and delta tier from the
  *    layout alone.
  *  - Ivfadc.search with an UNDERSTATED knownQueryCount degrades to the
  *    full-scan plan (bounded driver materialization) with identical
  *    results — the public-API misuse cannot OOM the driver.
  *  - The maintenance sweep's fault discipline: non-shutdown interrupts
  *    and transient faults keep the periodic task alive; fatal errors
  *    propagate (after logging).
  *  - The done-log exposes its executed-key view for compaction's
  *    anti-join (the driver-sized In(...) replacement).
  */
class RoundSeventeenSpec extends SparkSpec {
  import graft.streaming.{Pipelines, Service}

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // --------------------------------------------- near-dup takedown GC

  test("MaintainedNearDupIndex takedown: the major physically drops the deleted docs from BOTH stored relations, and the post-major screen finds no ghost candidates") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text"))
    val root = tmp("graft_r17_ndtd")
    val corpus = docs.filter(col("source") =!= "src19")
      .select(col("doc_id"), col("text"))
    val seeder = new Pipelines.MaintainedNearDupIndex(spark, root, flushEvery = 100)
    try seeder.initIndex(corpus) finally seeder.close()
    val delIds = docs.filter(col("source") =!= "src19")
      .filter(pmod(col("doc_id"), lit(10)) === 3)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(delIds.nonEmpty, "fixture must yield a non-empty delete slice")
    val deleter = new Pipelines.MaintainedNearDupIndex(spark, root, flushEvery = 1)
    try {
      deleter.deleteDocs(docs.filter(col("source") =!= "src19")
        .filter(pmod(col("doc_id"), lit(10)) === 3).select(col("doc_id")), 0)
      assert(deleter.stats("version") == 1L, "flushEvery=1 + maxDeltas=0 must major at the delete flush")
      assert(deleter.stats("n_deleted") == delIds.size.toLong)
      assert(deleter.stats("delta_versions") == 0L, "a major leaves no live tier")
    } finally deleter.close()
    // PHYSICAL claims the oracle can't observe: no deleted doc's rows —
    // and no tombstone sentinels — survive in the compacted pair
    val sig = spark.read.parquet(s"$root/sig_v1")
    val tg = spark.read.parquet(s"$root/tg_v1")
    assert(sig.filter(col("band") === -1).count() == 0, "no tombstone rows in the base")
    val sigIds = sig.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val tgIds = tg.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(sigIds.intersect(delIds).isEmpty, "deleted docs' signatures must be GC'd")
    assert(tgIds.intersect(delIds).isEmpty, "deleted docs' shingles must be GC'd")
    assert(sigIds.nonEmpty && tgIds.nonEmpty, "live docs must survive the fold")
    // and the reopened screen never reports a deleted doc as best match
    val idx = new Pipelines.MaintainedNearDupIndex(spark, root, flushEvery = 100)
    try {
      val outDir = s"$root/screen_out"
      idx.screenBatch(docs.filter(col("source") === "src19")
        .select(col("doc_id"), col("text")), 0)(
        out => out.write.mode("overwrite").parquet(outDir))
      val ghosts = spark.read.parquet(outDir)
        .filter(col("best_corpus_id").isin(delIds.toSeq.map(Long.box): _*))
        .count()
      assert(ghosts == 0, s"$ghosts screens matched a taken-down doc")
    } finally idx.close()
  }

  // ------------------------------------------------ reopened maintainers

  test("reopened text + ANN maintainers resume version, floor, and delta tier from the stored layout alone (the x92/x93 restart contract)") {
    val docs = graft.Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    val troot = tmp("graft_r17_treopen")
    val b1 = new graft.streaming.MaintainedTextIndex(spark, troot, flushEvery = 1, maxDeltas = 2)
    val statsBefore = try {
      b1.initIndex(docs.filter(pmod(col("doc_id"), lit(4)) < 2))
      b1.ingestBatch(docs.filter(pmod(col("doc_id"), lit(4)) === 2), 0)(_ => ())
      b1.ingestBatch(docs.filter(pmod(col("doc_id"), lit(4)) === 3), 1)(_ => ())
      b1.stats
    } finally b1.close()
    val r1 = new graft.streaming.MaintainedTextIndex(spark, troot, flushEvery = 1, maxDeltas = 2)
    try {
      val s = r1.stats
      for (k <- Seq("version", "delta_versions", "n_docs", "sum_dl"))
        assert(s(k) == statsBefore(k), s"$k drifted across reopen: ${s(k)} vs ${statsBefore(k)}")
    } finally r1.close()

    val emb = graft.Tables.embeddings(spark, sf0001)
    val aroot = tmp("graft_r17_areopen")
    val b2 = new graft.streaming.MaintainedAnnIndex(spark, aroot, flushEvery = 1, maxDeltas = 2)
    val annBefore = try {
      b2.initIndex(emb.filter(pmod(col("vec_id"), lit(4)) < 2))
      b2.ingestBatch(emb.filter(pmod(col("vec_id"), lit(4)) === 2), 0)(_ => ())
      b2.ingestBatch(emb.filter(pmod(col("vec_id"), lit(4)) === 3), 1)(_ => ())
      b2.stats
    } finally b2.close()
    val r2 = new graft.streaming.MaintainedAnnIndex(spark, aroot, flushEvery = 1, maxDeltas = 2)
    try {
      val s = r2.stats
      for (k <- Seq("version", "model_version", "delta_versions"))
        assert(s(k) == annBefore(k), s"$k drifted across reopen: ${s(k)} vs ${annBefore(k)}")
    } finally r2.close()
  }

  // --------------------------------- Ivfadc understated knownQueryCount

  test("Ivfadc.search: an understated knownQueryCount degrades to the full-scan plan with identical results (bounded driver materialization, no prune desync)") {
    import graft.functions.Ivfadc
    val emb = graft.Tables.embeddings(spark, sf0001)
    val model = Ivfadc.train(emb.filter(col("vec_id") < 200), nlist = 4, m = 4, k = 8)
    val encoded = Ivfadc.encode(emb, model)
    // enough queries that |probe rows| = nq*nprobe exceeds the truthful
    // bound MaxPruneQueries*nprobe — the lying-count path MUST fall back
    val nq = Ivfadc.MaxPruneQueries + 50
    val queries = emb.filter(col("vec_id") < nq)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Int)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSeq.sorted
    val honest = rows(Ivfadc.search(encoded, queries, model, k = 3, nprobe = 2))
    val lied = rows(Ivfadc.search(encoded, queries, model, k = 3, nprobe = 2,
      knownQueryCount = Some(1L)))
    assert(lied == honest, "understated count must not change results")
  }

  // ----------------------------------------- maintenance sweep guard

  test("guardedSweep: non-shutdown interrupts and transient faults keep the task alive (flag restored); fatal errors propagate") {
    val limiter = new graft.metrics.Observability.RateLimiter(0L)
    // transient fault: swallowed
    Service.guardedSweep(() => throw new RuntimeException("transient"),
      () => false, limiter)
    // shutdown interrupt: orderly, swallowed, flag NOT restored
    Thread.interrupted() // clear
    Service.guardedSweep(() => throw new InterruptedException("shutdown"),
      () => true, limiter)
    assert(!Thread.currentThread().isInterrupted)
    // NON-shutdown interrupt: swallowed (task stays alive) and the
    // interrupt flag is restored for the executor's own bookkeeping
    Service.guardedSweep(() => throw new InterruptedException("poke"),
      () => false, limiter)
    assert(Thread.interrupted(), "non-shutdown interrupt must restore the flag")
    // fatal: propagates (after logging)
    intercept[LinkageError] {
      Service.guardedSweep(() => throw new LinkageError("fatal"),
        () => false, limiter)
    }
  }

  // ------------------------------------------------ torn-lease healing

  test("WriterLease: a torn renewal (interrupted write -> unreadable fresh file) heals for its own owner but still refuses an unknown writer's") {
    val root = tmp("graft_r17_lease")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
    val leasePath = new org.apache.hadoop.fs.Path(s"$root/_writer_lease")
    def tear(): Unit = {
      // simulate shutdownNow catching checkAndRenew mid-truncate: the
      // lease file exists, is empty/unparsable, and has a FRESH mtime
      val out = fs.create(leasePath, true)
      out.close()
    }
    val mine = new graft.streaming.Pipelines.WriterLease(fs, root, 60000L, "me#1")
    mine.acquire()
    tear()
    // heal: the owner's next mutation rewrites its own torn file instead
    // of throwing "unreadable but freshly written" (the r17 suite flake)
    mine.checkAndRenew()
    // and a restart-in-place acquire (fresh instance, same owner) heals too
    tear()
    val mine2 = new graft.streaming.Pipelines.WriterLease(fs, root, 60000L, "me#1")
    mine2.acquire()
    mine2.checkAndRenew()
    // a DIFFERENT owner must still refuse the fresh-unreadable file: it
    // cannot know the torn bytes are not a live foreign lease
    tear()
    val other = new graft.streaming.Pipelines.WriterLease(fs, root, 60000L, "other#2")
    val e = intercept[IllegalStateException] { other.acquire() }
    assert(e.getMessage.contains("unreadable but freshly written"))
    // release of the torn-own file cleans it up without throwing
    mine2.release()
    assert(!fs.exists(leasePath), "release must clean the owner's torn file")
    // and release DROPS the owner's lastLeaseWrite record: after a clean
    // release a foreign process may legitimately hold this root, so a
    // fresh-unreadable file (its crash-torn renewal) must NOT read as
    // our own torn write — healing would steal a live foreign lease
    tear()
    val late = new graft.streaming.Pipelines.WriterLease(fs, root, 60000L, "me#1")
    val e2 = intercept[IllegalStateException] { late.acquire() }
    assert(e2.getMessage.contains("unreadable but freshly written"),
      "post-release, the same owner must refuse an unknown fresh-unreadable lease")
  }

  // ------------------------------------------------ done-log key view

  test("TakedownDoneLog.executedKeys returns the queue's recorded keys (compaction's anti-join feed), and compaction drops exactly the done requests") {
    val sparkS = spark
    import sparkS.implicits._
    val root = tmp("graft_r17_dlog")
    val (controlDir, ckpt) = (s"$root/control", s"$root/ckpt")
    // two lifecycle keys (LWW fold) + three takedowns, one executed
    Service.appendControl(spark, controlDir, Pipelines.Ccd("q1", "active", "Q.A", 0))
    Service.appendControl(spark, controlDir, Pipelines.Ccd("q1", "stopped", "Q.A", 1))
    Service.appendTakedown(spark, controlDir, "Q.A", Seq(11L), requestId = 101L)
    Service.appendTakedown(spark, controlDir, "Q.A", Seq(12L), requestId = 102L)
    Service.appendTakedown(spark, controlDir, "Q.A", Seq(13L), requestId = 103L)
    val doneKey = "takedown:Q.A:11:101"
    val dlog = new graft.streaming.TakedownDoneLog(
      spark.sparkContext.hadoopConfiguration, ckpt)
    dlog.record("Q.A", Seq(doneKey))
    assert(dlog.executedKeys("Q.A") == Seq(doneKey))
    assert(dlog.executedKeys("Q.OTHER").isEmpty)
    assert(dlog.executedPairs(Seq("Q.A", "Q.OTHER")) == Seq(("Q.A", doneKey)))
    assert(Service.compactControlLog(spark, controlDir, ckpt, maxFiles = 1))
    val after = spark.read.schema(Service.CcdSchema).parquet(controlDir)
    assert(after.filter(col("status") === "takedown").count() == 2,
      "the executed takedown must compact away; pending ones survive")
    val lc = after.filter(col("status") =!= "takedown").collect()
    assert(lc.length == 1 && lc.head.getAs[String]("status") == "stopped",
      "lifecycle folds last-value-per-key")
  }
}
