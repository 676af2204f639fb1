package graft

import org.apache.spark.sql.functions._

/** Round-18: the lease-free READ-ONLY serving handles (the
  * one-writer-N-readers deployment gap the round-17 verdict named as the
  * one genuine capability hole).
  *
  *  - A reader opens WITHOUT the writer lease: constructing one does not
  *    block (or get blocked by) a live writer, and the single-writer
  *    contract is untouched — a second WRITER is still rejected while
  *    the first holds the lease, reader present or not.
  *  - Readers are compile-time read-only (the wrapper exposes only the
  *    serving surface) AND runtime read-only: every mutator on the
  *    underlying read-only handle throws UnsupportedOperationException.
  *  - Reader FRESHNESS: each read re-resolves the committed snapshot, so
  *    a reader opened at version v serves v+1's state after the writer
  *    publishes a major — without re-opening the handle. On the ANN
  *    pillar the re-resolve must re-bind the MODEL version too.
  *  - The `keepVersions` retention knob widens GC for slow readers: a
  *    writer with keepVersions = 3 leaves three base versions on disk
  *    where the default leaves two (the declared-row oracles pin what
  *    readers serve; this spec pins the layout the oracles can't see).
  *
  * The four declared rows x96-x99 hash-verify the reader results against
  * the pillars' standing oracles; the cross-PROCESS story (a second JVM
  * reading while the first holds the lease, during live ingest) is
  * measured by LeaseProbe's reader steps.
  */
class RoundEighteenSpec extends SparkSpec {
  import graft.streaming.{MaintainedAnnIndex, MaintainedTextIndex, Pipelines}

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def docs = graft.Tables.documents(spark, sf0001)
    .select(col("doc_id"), col("text"))

  // ------------------------------------------------- lease coexistence

  test("a reader opens under a LIVE writer lease without disturbing it; a second writer stays rejected; mutators on the read-only handle throw") {
    val root = tmp("graft_r18_lease")
    val writer = new MaintainedTextIndex(spark, root, flushEvery = 1)
    try {
      writer.initIndex(docs.filter(pmod(col("doc_id"), lit(2)) === 0))
      // reader construction takes nothing — no throw, lease untouched
      val reader = MaintainedTextIndex.openReader(spark, root)
      assert(reader.stats("version") == 0L)
      // the single-writer contract is still enforced AROUND the reader:
      // a foreign-owner writer is rejected while the first holds
      val e = intercept[IllegalStateException] {
        new MaintainedTextIndex(spark, root, flushEvery = 1,
          writerId = "rival#9999")
      }
      assert(e.getMessage.contains("single-writer"))
      // and the live writer still mutates freely with the reader open
      writer.ingestBatch(docs.filter(pmod(col("doc_id"), lit(2)) === 1), 0)(_ => ())
      // runtime mutator guard on the underlying read-only handle: a
      // read-only-constructed MaintainedTextIndex refuses every mutator
      val raw = new MaintainedTextIndex(spark, root, flushEvery = 1,
        readOnly = true)
      val ops: Seq[(String, () => Unit)] = Seq(
        "initIndex" -> (() => raw.initIndex(docs)),
        "ingestBatch" -> (() => raw.ingestBatch(docs, 99)(_ => ())),
        "deleteDocs" -> (() => raw.deleteDocs(docs.select(col("doc_id")), 99)),
        "flush" -> (() => raw.flush()),
        "compactBase" -> (() => { raw.compactBase(); () }))
      ops.foreach { case (name, op) =>
        val ex = intercept[UnsupportedOperationException](op())
        assert(ex.getMessage.contains("read-only"), s"$name must refuse")
      }
    } finally writer.close()
  }

  // --------------------------------------------------- text freshness

  test("text reader freshness: a reader opened at v0 serves the post-major corpus without reopening") {
    val root = tmp("graft_r18_tfresh")
    val writer = new MaintainedTextIndex(spark, root, flushEvery = 1)
    try {
      writer.initIndex(docs.filter(pmod(col("doc_id"), lit(2)) === 0))
      val reader = MaintainedTextIndex.openReader(spark, root)
      val n0 = reader.stats("n_docs")
      assert(reader.stats("version") == 0L)
      // maxDeltas = 0 → this flush is a MAJOR: version advances to 1
      writer.ingestBatch(docs.filter(pmod(col("doc_id"), lit(2)) === 1), 0)(_ => ())
      assert(reader.stats("version") == 1L,
        "the reader must re-resolve the committed version per read")
      assert(reader.stats("n_docs") > n0)
      // served results re-resolve too: identical to the writer's serve
      val viaReader = reader.search(graft.functions.Search.QueryTerms, 20)
        .collect().map(_.toSeq)
      val viaWriter = writer.search(graft.functions.Search.QueryTerms, 20)
        .collect().map(_.toSeq)
      assert(viaReader.toSeq == viaWriter.toSeq)
    } finally writer.close()
  }

  // ---------------------------------------------------- ANN freshness

  test("ANN reader freshness: the re-resolve re-binds the MODEL version after a retrain") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val root = tmp("graft_r18_afresh")
    val writer = new MaintainedAnnIndex(spark, root, flushEvery = 1, maxDeltas = 2)
    try {
      writer.initIndex(emb.filter(pmod(col("vec_id"), lit(2)) === 0))
      val reader = MaintainedAnnIndex.openReader(spark, root)
      assert(reader.stats("model_version") == 0L)
      writer.ingestBatch(emb.filter(pmod(col("vec_id"), lit(2)) === 1), 0)(_ => ())
      writer.retrainModel(emb, nlistOverride = Some(8), pqOverride = Some((8, 16)))
      assert(reader.stats("model_version") == 1L,
        "the reader must re-bind the model marker with the new codes")
      val viaReader = reader.searchRerank(emb, emb.filter(col("vec_id") < 8),
          kTop = 3, nprobe = 3, knownQueryCount = Some(8L))
        .orderBy(col("query_id"), col("rk")).collect().map(_.toSeq)
      val viaWriter = writer.searchRerank(emb, emb.filter(col("vec_id") < 8),
          kTop = 3, nprobe = 3, knownQueryCount = Some(8L))
        .orderBy(col("query_id"), col("rk")).collect().map(_.toSeq)
      assert(viaReader.toSeq == viaWriter.toSeq)
    } finally writer.close()
  }

  // ----------------------------------------------- retention knob

  test("keepVersions widens base retention: keepVersions = 3 leaves three text base versions where the default leaves two") {
    def majorCount(root: String): Int = {
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      graft.VersionedDirs.all(fs, root, "post_v").size
    }
    def drive(root: String, keep: Int): Unit = {
      val w = new MaintainedTextIndex(spark, root, flushEvery = 1,
        keepVersions = keep)
      try {
        w.initIndex(docs.filter(pmod(col("doc_id"), lit(4)) === 0))
        // three majors (maxDeltas = 0): versions 1, 2, 3
        w.ingestBatch(docs.filter(pmod(col("doc_id"), lit(4)) === 1), 0)(_ => ())
        w.ingestBatch(docs.filter(pmod(col("doc_id"), lit(4)) === 2), 1)(_ => ())
        w.ingestBatch(docs.filter(pmod(col("doc_id"), lit(4)) === 3), 2)(_ => ())
        assert(w.stats("version") == 3L)
      } finally w.close()
    }
    val rootDefault = tmp("graft_r18_keep2")
    drive(rootDefault, 2)
    assert(majorCount(rootDefault) == 2, "default: current + previous")
    val rootWide = tmp("graft_r18_keep3")
    drive(rootWide, 3)
    assert(majorCount(rootWide) == 3, "keepVersions = 3: one more cycle of grace")
  }

  test("keepVersions widens the DELTA grace too: a delta folded one major ago survives a second major under keepVersions = 3") {
    // the reader SLA must hold for the TIER, not just the base: a reader
    // pinned on the oldest kept base still resolves ITS delta pairs
    def deltasLeft(root: String): Set[Int] = {
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      graft.VersionedDirs.all(fs, root, "dpost_v").toSet
    }
    def drive(root: String, keep: Int): Unit = {
      val w = new MaintainedTextIndex(spark, root, flushEvery = 1,
        maxDeltas = 4, keepVersions = keep)
      try {
        w.initIndex(docs.filter(pmod(col("doc_id"), lit(4)) === 0))
        w.ingestBatch(docs.filter(pmod(col("doc_id"), lit(4)) === 1), 0)(_ => ()) // minor: dpost_v0
        assert(w.compactBase(), "first major must fold")
        w.ingestBatch(docs.filter(pmod(col("doc_id"), lit(4)) === 2), 1)(_ => ()) // minor: dpost_v1
        assert(w.compactBase(), "second major must fold")
      } finally w.close()
    }
    val rootDefault = tmp("graft_r18_dgrace2")
    drive(rootDefault, 2)
    assert(!deltasLeft(rootDefault).contains(0),
      "default: the second major sweeps the delta folded by the first (one-cycle grace)")
    val rootWide = tmp("graft_r18_dgrace3")
    drive(rootWide, 3)
    assert(deltasLeft(rootWide).contains(0),
      "keepVersions = 3: the oldest kept base's tier survives the second major")
  }

  test("keepVersions on the ANN pillar also retains each kept codes version's bound model") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val root = tmp("graft_r18_akeep")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val w = new MaintainedAnnIndex(spark, root, flushEvery = 1,
      keepVersions = 3)
    try {
      w.initIndex(emb.filter(pmod(col("vec_id"), lit(4)) === 0))
      // retrain bumps the model AND the codes version; two more majors
      // roll the codes forward — model_v0 must survive as long as a kept
      // codes version still binds it
      w.retrainModel(emb.filter(pmod(col("vec_id"), lit(4)) <= 1),
        nlistOverride = Some(8), pqOverride = Some((8, 16)))
      w.ingestBatch(emb.filter(pmod(col("vec_id"), lit(4)) === 2), 0)(_ => ())
      w.ingestBatch(emb.filter(pmod(col("vec_id"), lit(4)) === 3), 1)(_ => ())
      val codes = graft.VersionedDirs.all(fs, root, "codes_v")
      assert(codes.size == 3, s"keepVersions = 3 must retain 3 codes versions, got $codes")
      // every kept codes version's bound model is still on disk (the
      // marker file is read directly — the codec is private to streaming)
      def boundModel(v: Int): Option[Int] = {
        val p = java.nio.file.Paths.get(root, s"codes_v$v", "_graft_model")
        if (java.nio.file.Files.exists(p))
          Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim.toInt)
        else None
      }
      val bound: Set[Int] = codes.flatMap(boundModel).toSet
      val models: Set[Int] = graft.VersionedDirs.all(fs, root, "model_v").toSet
      assert(bound.nonEmpty && bound.subsetOf(models),
        s"bound models $bound must all be retained (on disk: $models)")
    } finally w.close()
  }

  // ------------------------------------- concurrent reader consistency

  test("concurrent reads on ONE reader handle during writer majors each serve SOME committed snapshot exactly (no torn version/floor pairs)") {
    val root = tmp("graft_r18_race")
    // keepVersions = 4: all versions this test publishes stay on disk,
    // so a read pinned on v0 can never lose files to GC mid-collect —
    // the test isolates the TEAR property, not the retention SLA (the
    // delta-grace test above owns that)
    val writer = new MaintainedTextIndex(spark, root, flushEvery = 1,
      keepVersions = 4)
    try {
      // writer publishes only MAJORS (maxDeltas = 0), so the committed
      // states are exactly v0..v3 with empty tiers; every concurrent
      // read must equal ONE of those four serves bit-for-bit — a torn
      // (version, floor) pair yields a fifth result no state produces
      val slices = (0 to 3).map(i => docs.filter(pmod(col("doc_id"), lit(4)) === i))
      writer.initIndex(slices(0))
      val terms = graft.functions.Search.QueryTerms
      val valid = scala.collection.mutable.Set[Seq[Seq[Any]]]()
      def record(): Unit = valid +=
        writer.search(terms, 20).collect().map(_.toSeq).toSeq
      record()
      val reader = MaintainedTextIndex.openReader(spark, root)
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Seq[Seq[Any]]]()
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 3).map(i => new Thread(() => {
        try while (!stop.get())
          seen.add(reader.search(terms, 20).collect().map(_.toSeq).toSeq)
        catch { case t: Throwable => errs.add(t) }
      }, s"r18-race-$i"))
      threads.foreach(_.start())
      try {
        (1 to 3).foreach { b =>
          writer.ingestBatch(slices(b), b - 1)(_ => ()) // each flush = a major
          record()
        }
        // let readers observe the final state too
        Thread.sleep(500)
      } finally { stop.set(true); threads.foreach(_.join(30000)) }
      assert(errs.isEmpty, s"concurrent reads must not fail: ${errs.peek()}")
      import scala.jdk.CollectionConverters._
      val invalid = seen.asScala.filterNot(valid.contains)
      assert(invalid.isEmpty,
        s"every concurrent read must equal a committed snapshot's serve; " +
          s"got ${invalid.size} torn result(s) out of ${seen.size} distinct")
      assert(seen.size >= 1)
    } finally writer.close()
  }

  test("concurrent serves on the WRITER handle during its own majors each serve SOME committed snapshot exactly (atomic publish)") {
    // the shadow-fold design advertises serve-during-compaction from the
    // WRITER handle too — its (version, floor) publish must be atomic
    // w.r.t. a concurrent serve's snapshot capture, not just the
    // read-only handle's
    val root = tmp("graft_r18_wrace")
    val writer = new MaintainedTextIndex(spark, root, flushEvery = 1,
      keepVersions = 4)
    try {
      val slices = (0 to 3).map(i => docs.filter(pmod(col("doc_id"), lit(4)) === i))
      writer.initIndex(slices(0))
      val terms = graft.functions.Search.QueryTerms
      val valid = scala.collection.mutable.Set[Seq[Seq[Any]]]()
      def record(): Unit = valid +=
        writer.search(terms, 20).collect().map(_.toSeq).toSeq
      record()
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Seq[Seq[Any]]]()
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 3).map(i => new Thread(() => {
        try while (!stop.get())
          seen.add(writer.search(terms, 20).collect().map(_.toSeq).toSeq)
        catch { case t: Throwable => errs.add(t) }
      }, s"r18-wrace-$i"))
      threads.foreach(_.start())
      try {
        (1 to 3).foreach { b =>
          writer.ingestBatch(slices(b), b - 1)(_ => ()) // each flush = a major
          record()
        }
        Thread.sleep(500)
      } finally { stop.set(true); threads.foreach(_.join(30000)) }
      assert(errs.isEmpty, s"concurrent writer-handle serves must not fail: ${errs.peek()}")
      import scala.jdk.CollectionConverters._
      val invalid = seen.asScala.filterNot(valid.contains)
      assert(invalid.isEmpty,
        s"every concurrent writer-handle serve must equal a committed snapshot's serve; " +
          s"got ${invalid.size} torn result(s) out of ${seen.size} distinct")
    } finally writer.close()
  }

  // ------------------------------------------ hybrid reader composition

  test("the hybrid RRF serve composes from two READER handles and matches the writer-handle serve row-for-row") {
    import graft.streaming.HybridRetrieval
    val emb = graft.Tables.embeddings(spark, sf0001)
    val troot = tmp("graft_r18_hyb_t")
    val aroot = tmp("graft_r18_hyb_a")
    val text = new MaintainedTextIndex(spark, troot, flushEvery = 1, maxDeltas = 2)
    val ann = new MaintainedAnnIndex(spark, aroot, flushEvery = 1, maxDeltas = 2)
    try {
      text.initIndex(docs.filter(pmod(col("doc_id"), lit(2)) === 0))
      text.ingestBatch(docs.filter(pmod(col("doc_id"), lit(2)) === 1), 0)(_ => ())
      ann.initIndex(emb.filter(pmod(col("vec_id"), lit(2)) === 0))
      ann.ingestBatch(emb.filter(pmod(col("vec_id"), lit(2)) === 1), 0)(_ => ())
      // readers open while BOTH writer leases are live
      val rt = MaintainedTextIndex.openReader(spark, troot)
      val ra = MaintainedAnnIndex.openReader(spark, aroot)
      val q = emb.filter(col("vec_id") === 0)
      val viaReaders = HybridRetrieval.searchRrf(rt, ra, emb,
          graft.functions.Search.QueryTerms, q, k = 10, depth = 20, nprobe = 3)
        .collect().map(_.toSeq)
      val viaWriters = HybridRetrieval.searchRrf(text, ann, emb,
          graft.functions.Search.QueryTerms, q, k = 10, depth = 20, nprobe = 3)
        .collect().map(_.toSeq)
      assert(viaReaders.toSeq == viaWriters.toSeq)
      assert(viaReaders.nonEmpty)
      // the other two reader overloads, same parity bar (the forwarding
      // calls pass 7-8 positional same-typed args — pin them all)
      import spark.implicits._
      val qMany = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"),
          typedLit(graft.functions.Search.QueryTerms).as("terms"),
          col("embedding"))
      val manyR = HybridRetrieval.searchRrfMany(rt, ra, emb, qMany,
          10, 20, 3, Some(3L))
        .orderBy(col("query_id"), col("rrf").desc, col("id")).collect().map(_.toSeq)
      val manyW = HybridRetrieval.searchRrfMany(text, ann, emb, qMany,
          10, 20, 3, Some(3L))
        .orderBy(col("query_id"), col("rrf").desc, col("id")).collect().map(_.toSeq)
      assert(manyR.toSeq == manyW.toSeq && manyR.nonEmpty)
      val adcR = HybridRetrieval.searchRrfAdc(rt, ra,
          graft.functions.Search.QueryTerms, q, 10, 20, 3)
        .collect().map(_.toSeq)
      val adcW = HybridRetrieval.searchRrfAdc(text, ann,
          graft.functions.Search.QueryTerms, q, k = 10, depth = 20, nprobe = 3)
        .collect().map(_.toSeq)
      assert(adcR.toSeq == adcW.toSeq && adcR.nonEmpty)
      val adcManyR = HybridRetrieval.searchRrfAdcMany(rt, ra, qMany,
          10, 20, 3, Some(3L))
        .orderBy(col("query_id"), col("rrf").desc, col("id")).collect().map(_.toSeq)
      val adcManyW = HybridRetrieval.searchRrfAdcMany(text, ann, qMany,
          10, 20, 3, Some(3L))
        .orderBy(col("query_id"), col("rrf").desc, col("id")).collect().map(_.toSeq)
      assert(adcManyR.toSeq == adcManyW.toSeq && adcManyR.nonEmpty)
    } finally { text.close(); ann.close() }
  }

  // -------------------------------------- freshness-aware serve wiring

  test("searchRerankFresh widens nprobe exactly while drift exceeds the threshold, and counts the boosted serves") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val root = tmp("graft_r18_fresh")
    val w = new MaintainedAnnIndex(spark, root, flushEvery = 1, maxDeltas = 2)
    try {
      w.initIndex(emb.filter(pmod(col("vec_id"), lit(2)) === 0))
      w.ingestBatch(emb.filter(pmod(col("vec_id"), lit(2)) === 1), 0)(_ => ())
      val q = emb.filter(col("vec_id") < 8)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy(col("query_id"), col("rk")).collect().map(_.toSeq).toSeq
      // threshold -1: drift (>= 0 by construction) always exceeds it →
      // the serve must equal a plain searchRerank at the BOOSTED nprobe
      val boosted = rows(w.searchRerankFresh(emb, q, kTop = 3, nprobe = 2,
        driftThresholdMicro = -1L, boostedNprobe = 6, knownQueryCount = Some(8L)))
      assert(boosted == rows(w.searchRerank(emb, q, kTop = 3, nprobe = 6,
        knownQueryCount = Some(8L))))
      assert(w.stats("boosted_serves") == 1L)
      // a threshold drift can never reach → the base operating point
      val base = rows(w.searchRerankFresh(emb, q, kTop = 3, nprobe = 2,
        driftThresholdMicro = Long.MaxValue, boostedNprobe = 6,
        knownQueryCount = Some(8L)))
      assert(base == rows(w.searchRerank(emb, q, kTop = 3, nprobe = 2,
        knownQueryCount = Some(8L))))
      assert(w.stats("boosted_serves") == 1L, "unboosted serves must not count")
    } finally w.close()
  }

  // ------------------------------------------------- chaos soak (CI pin)

  test("seeded chaos soak: 12 randomized kill-injected windows keep the text index parity-exact vs the batch scorer") {
    // fixed seed so CI replays the exact interleaving; SoakProbe runs the
    // longer randomized form (SCALING §15 records the measured census)
    val root = tmp("graft_r18_soak")
    val res = graft.streaming.Soak.textSoak(spark,
      graft.Tables.documents(spark, sf0001).select(col("doc_id"), col("text")),
      root, seed = 181818L, windows = 12)
    assert(res.parityChecks >= 1, "the soak must have checked parity at least once beyond the final")
    assert(res.opCounts.values.sum >= 12L)
  }

  test("seeded ANN chaos soak: 12 windows incl. retrain + prepare-crash kills keep the tiered serve parity-exact vs the batch topology") {
    val root = tmp("graft_r18_asoak")
    val res = graft.streaming.Soak.annSoak(spark,
      graft.Tables.embeddings(spark, sf0001), root, seed = 181818L, windows = 12)
    assert(res.parityChecks >= 1)
    assert(res.opCounts.values.sum >= 12L)
  }

  test("seeded exact-dedup chaos soak: 12 windows keep currentIndex set-equal to the epoch-rule model at every fold") {
    val root = tmp("graft_r18_dsoak")
    val res = graft.streaming.Soak.dedupSoak(spark,
      graft.Tables.documents(spark, sf0001).select(col("doc_id"), col("text")),
      root, seed = 181818L, windows = 12)
    assert(res.parityChecks >= 1)
  }

  test("seeded RETRIEVAL-composition chaos soak: 12 windows incl. retrains keep the hybrid serve equal to the fused batch recomputes") {
    val root = tmp("graft_r18_rsoak")
    val res = graft.streaming.Soak.retrievalSoak(spark,
      graft.Tables.documents(spark, sf0001).select(col("doc_id"), col("text")),
      root, seed = 181818L, windows = 12)
    assert(res.parityChecks >= 1)
  }

  test("seeded COMPOSED-SERVICE chaos soak: randomized curation batches with replay/reopen/compact kills end parity-equal to the batch x71 recompute") {
    val root = tmp("graft_r18_csoak")
    val res = graft.streaming.Soak.curationSoak(spark, root,
      seed = 181818L, batches = 10)
    assert(res.opCounts("batch") + res.opCounts("batch_replayed") == 10L)
  }

  test("seeded near-dup chaos soak: 12 windows keep the screen verdicts equal to the batch x62 recompute over the fold-visible membership") {
    val root = tmp("graft_r18_nsoak")
    val res = graft.streaming.Soak.nearDupSoak(spark,
      graft.Tables.documents(spark, sf0001).select(col("doc_id"), col("text")),
      root, seed = 181818L, windows = 12)
    assert(res.parityChecks >= 1)
  }

  // ------------------------------------- dedup/near-dup reader parity

  test("dedup and near-dup readers serve the writer's exact state while it is live") {
    val all = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text"))
    val fp = graft.functions.Text.fingerprint(col("text"))
    val droot = tmp("graft_r18_dread")
    val dw = new Pipelines.MaintainedDedupIndex(spark, droot,
      ttlMs = 60000L, flushEvery = 1)
    try {
      dw.initIndex(all.filter(col("source") =!= "src19")
        .select(fp.as("fp"), col("doc_id"))
        .groupBy(col("fp")).agg(min(col("doc_id")).as("corpus_id")))
      val dr = Pipelines.openDedupReader(spark, droot)
      assert(dr.currentIndex.count() == dw.currentIndex.count())
      val batch = all.filter(col("source") === "src19")
        .select(col("doc_id"), col("text"))
      val viaReader = dr.classify(batch).toDF().orderBy("doc_id")
        .collect().map(_.toSeq)
      val viaWriter = dw.classify(batch).toDF().orderBy("doc_id")
        .collect().map(_.toSeq)
      assert(viaReader.toSeq == viaWriter.toSeq)
      dr.releaseClassifyPins()
      dw.releaseClassifyPins()
    } finally dw.close()

    val nroot = tmp("graft_r18_nread")
    val nw = new Pipelines.MaintainedNearDupIndex(spark, nroot, flushEvery = 100)
    try {
      nw.initIndex(all.filter(col("source") =!= "src19")
        .select(col("doc_id"), col("text")))
      val nr = Pipelines.openNearDupReader(spark, nroot)
      val batch = all.filter(col("source") === "src19")
        .select(col("doc_id"), col("text"))
      // the pure reader screen equals the staging screen's sunk summary
      val viaReader = nr.screen(batch).collect().map(_.toSeq)
      val outDir = s"$nroot/screen_out"
      nw.screenBatch(batch, 0)(o => o.write.mode("overwrite").parquet(outDir))
      val viaWriter = spark.read.parquet(outDir)
        .select(col("batch_id"), col("n_matches"),
          col("best_jaccard"), col("best_corpus_id"))
        .orderBy(col("batch_id")).collect().map(_.toSeq)
      assert(viaReader.toSeq == viaWriter.toSeq)
    } finally nw.close()
  }
}
