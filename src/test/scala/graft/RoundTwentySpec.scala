package graft

import org.apache.spark.sql.functions._

/** Round-20: the assembled retrieval boot's chaos coverage and the
  * control-plane fixes the r19 review asked for.
  *
  *  - The assembled-RETRIEVAL soak arm ([[graft.streaming.Soak
  *    .assembledRetrievalSoak]]) drives [[graft.streaming
  *    .RetrievalService.assemble]] — not `processBatch` — through
  *    randomized control-topic batches, takedown CCDs via the
  *    deactivate → requests+reactivate handover, kills at the
  *    foreachBatch seam, and clean reboots, with parity vs the batch
  *    recompute on BOTH pillars (text, dense, and fused). The seeded
  *    run pinned here exercises every op class (the x103 oracle row's
  *    soak companion, as x100 paired with the r19 assembled arm).
  *  - `Service.appendControlBatch` coalesces to ONE parquet part file:
  *    the [requests..., activate] ordering primitive relies on one
  *    append being one atomically-listed file — N part files could list
  *    mid-job-commit and split the batch across control micro-batches
  *    with the activate surfacing first.
  *  - The text index's serve-time stats memo holds a small bounded MAP
  *    (not one slot): a long-lived reader pinned at an older snapshot
  *    interleaved with current-version resolves must not alternate the
  *    key and re-pay the corpus-thin base scan per call.
  */
class RoundTwentySpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("assembled retrieval soak: kills, reboots, both takedown forms, both-pillar parity (seed 202020)") {
    val root = tmp("r20_rasm_soak")
    val res = graft.streaming.Soak.assembledRetrievalSoak(spark, root,
      seed = 202020L, batches = 10)
    assert(res.parityChecks >= 3,
      s"the final barrier must check all three parities: ${res.parityChecks}")
    assert(res.opCounts.getOrElse("batch_killed_replayed", 0L) >= 1L,
      s"the seed must exercise a mid-flight kill: ${res.opCounts}")
    assert(res.opCounts.getOrElse("takedown", 0L) +
      res.opCounts.getOrElse("takedown_bulk", 0L) >= 1L,
      s"the seed must exercise a control-topic takedown: ${res.opCounts}")
    assert(res.opCounts.getOrElse("reboot", 0L) >= 1L,
      s"the seed must exercise a clean reboot: ${res.opCounts}")
  }

  // ------------------- keepVersions: the reader retention SLA, measured

  test("keepVersions=2: a pinned reader plan survives ONE major; past the window it fails LOUDLY; keepVersions=3 widens it") {
    import graft.streaming.MaintainedTextIndex
    val terms = graft.functions.Search.QueryTerms
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    def slice(m: Int) = docs.filter(pmod(col("doc_id"), lit(4)) === m)

    // keepVersions = 2 (the default): flushEvery 1 + maxDeltas 0 makes
    // every ingest flush a MAJOR, so each ingest advances the base version.
    // The SLOW READER under measurement holds UN-EVALUATED plans — a plan
    // already evaluated once keeps serving from its own shuffle outputs
    // (a per-JVM artifact, measured here first: that pin never even
    // touches the deleted files), so the retention window is about the
    // FIRST evaluation's file reads.
    val root = tmp("r20_retention2")
    val w = new MaintainedTextIndex(spark, root, flushEvery = 1, maxDeltas = 0)
    try {
      w.initIndex(slice(0))                       // base v0
      val reader = MaintainedTextIndex.openReader(spark, root)
      val baseline = reader.search(terms, 20).collect().toSeq
      val pinnedWithin = reader.search(terms, 20) // plans bound to v0's files,
      val pinnedPast = reader.search(terms, 20)   // NOT yet evaluated
      w.ingestBatch(slice(1), 0)(_ => ())         // major -> v1; v0 retained
      assert(pinnedWithin.collect().toSeq == baseline,
        "one major inside the keepVersions window: the pinned plan's first " +
          "evaluation must still read v0 unchanged")
      w.ingestBatch(slice(2), 1)(_ => ())         // major -> v2; v0 GC'd
      assert(!new java.io.File(s"$root/post_v0").exists(),
        "two majors at keepVersions=2 must GC base v0")
      // past the window: the pin must fail LOUDLY (missing files), never
      // silently serve wrong rows
      intercept[Exception] { pinnedPast.collect() }
      // and a FRESH resolve serves the current corpus fine
      assert(reader.search(terms, 20).count() > 0)
    } finally w.close()

    // keepVersions = 3: the same two majors keep the v0 pin's FIRST
    // evaluation readable — the knob IS the SLA for readers slower than
    // one major cycle
    val root3 = tmp("r20_retention3")
    val w3 = new MaintainedTextIndex(spark, root3, flushEvery = 1,
      maxDeltas = 0, keepVersions = 3)
    try {
      w3.initIndex(slice(0))
      val reader3 = MaintainedTextIndex.openReader(spark, root3)
      val baseline3 = reader3.search(terms, 20).collect().toSeq
      val pinned3 = reader3.search(terms, 20)     // not evaluated yet
      w3.ingestBatch(slice(1), 0)(_ => ())
      w3.ingestBatch(slice(2), 1)(_ => ())
      assert(new java.io.File(s"$root3/post_v0").exists(),
        "keepVersions=3 must retain base v0 across two majors")
      assert(pinned3.collect().toSeq == baseline3,
        "keepVersions=3 must hold the v0 pin across two majors")
    } finally w3.close()
  }

  test("appendControlBatch lands N CCDs as ONE parquet part file (the atomic-listing unit)") {
    val sparkS = spark
    val dir = tmp("r20_ctrl_one_file")
    val ccds = (0 until 16).map(i =>
      graft.streaming.Pipelines.Ccd(s"k$i", "active", s"Q.$i", i.toLong))
    graft.streaming.Service.appendControlBatch(sparkS, dir, ccds)
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(parts.length == 1,
      s"one control append must be one listing unit, got ${parts.length} files")
    assert(sparkS.read.parquet(dir).count() == 16L)
  }
}
