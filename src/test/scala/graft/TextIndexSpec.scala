package graft

import org.apache.spark.sql.functions._

/** The maintained BM25 text index ([[graft.streaming.MaintainedTextIndex]])
  * — the lexical-retrieval family's incremental lifecycle: batch-parity
  * search over a grown corpus, tombstone update semantics, Lucene-style
  * additive stats healing at majors, crash-remnant invisibility, restart
  * resume, and the tier broadcast guard. */
class TextIndexSpec extends SparkSpec {
  import graft.streaming.MaintainedTextIndex

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val Terms = Seq("spark", "index", "vector")

  /** Deterministic corpus: every doc mentions a mix of the query terms
    * with varying frequencies and lengths, plus filler. */
  private def corpus(ids: Seq[Long]) = {
    val sparkS = spark
    import sparkS.implicits._
    ids.map { i =>
      val words =
        Seq.fill((i % 4 + 1).toInt)("spark") ++
          Seq.fill((i % 3).toInt)("index") ++
          Seq.fill((i % 5).toInt)("vector") ++
          Seq.fill((i % 7 + 2).toInt)(s"filler$i")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq

  test("maintained text index: incremental search is bit-identical to the batch x32 scorer on the grown corpus") {
    val root = tmp("mtix")
    val idx = new MaintainedTextIndex(spark, root, flushEvery = 1, maxDeltas = 2)
    idx.initIndex(corpus(0L until 30L))
    // two minor windows (live deltas), then a major fold
    idx.ingestBatch(corpus(30L until 40L), 0)(_ => ())
    idx.ingestBatch(corpus(40L until 50L), 1)(_ => ())
    assert(idx.stats("delta_versions") == 2L && idx.stats("version") == 0L)
    val withTier = rows(idx.search(Terms, 15))
    assert(withTier == rows(graft.functions.Search.bm25TopK(
      corpus(0L until 50L), Terms, 15)),
      "delta-tier search must match the batch scorer")
    idx.ingestBatch(corpus(50L until 60L), 2)(_ => ())
    assert(idx.stats("version") == 1L && idx.stats("delta_versions") == 0L,
      s"third window must major-fold: ${idx.stats}")
    assert(rows(idx.search(Terms, 15)) ==
      rows(graft.functions.Search.bm25TopK(corpus(0L until 60L), Terms, 15)),
      "post-major search must match the batch scorer")
    // additive stats are exact on the append-only path
    assert(idx.stats("n_docs") == 60L)
    idx.close()
  }

  test("maintained text index: updates tombstone old postings; stats exact in-window and at the major") {
    val sparkS = spark
    import sparkS.implicits._
    val root = tmp("mtix_upd")
    val idx = new MaintainedTextIndex(spark, root, flushEvery = 1, maxDeltas = 3)
    idx.initIndex(Seq(
      (1L, "spark spark unique1 filler"),
      (2L, "index filler filler"),
      (3L, "vector unique1 filler")).toDF("doc_id", "text"))
    // doc 1 re-ingested WITHOUT 'spark' and 'unique1', WITH 'vector'
    idx.ingestBatch(Seq((1L, "vector vector filler"))
      .toDF("doc_id", "text"), 0)(_ => ())
    assert(idx.stats("delta_versions") == 1L)
    def hits(term: String) =
      idx.search(Seq(term), 10).collect().map(_.getLong(0)).toSet
    assert(!hits("spark").contains(1L),
      "a term removed by the update must stop retrieving the doc")
    assert(!hits("unique1").contains(1L) && hits("unique1") == Set(3L))
    assert(hits("vector") == Set(1L, 3L),
      "the updated text's terms must retrieve the doc")
    // round 19: the additive stats resolve delta-superseded base docs at
    // SERVE time (the x101 subtraction) — the updated doc counts ONCE
    // even between majors, where rounds ≤18 accepted the Lucene-style
    // double-count (this assertion read 4L then)
    assert(idx.stats("n_docs") == 3L)
    // drive to the major: the fold GCs tombstones physically and the
    // recomputed base stats must agree with the serve-time value
    idx.ingestBatch(Seq((4L, "spark index filler")).toDF("doc_id", "text"), 1)(_ => ())
    idx.ingestBatch(Seq((5L, "index filler filler")).toDF("doc_id", "text"), 2)(_ => ())
    idx.ingestBatch(Seq((6L, "vector spark filler")).toDF("doc_id", "text"), 3)(_ => ())
    assert(idx.stats("version") == 1L && idx.stats("delta_versions") == 0L)
    assert(idx.stats("n_docs") == 6L, s"major must heal the stats: ${idx.stats}")
    val logical = Seq(
      (1L, "vector vector filler"), (2L, "index filler filler"),
      (3L, "vector unique1 filler"), (4L, "spark index filler"),
      (5L, "index filler filler"), (6L, "vector spark filler"))
      .toDF("doc_id", "text")
    assert(rows(idx.search(Terms, 10)) ==
      rows(graft.functions.Search.bm25TopK(logical, Terms, 10)),
      "post-major search must equal the batch scorer on the updated corpus")
    idx.close()
  }

  test("maintained text index: restart resumes version + tier; torn delta pairs stay invisible") {
    val root = tmp("mtix_restart")
    val idx = new MaintainedTextIndex(spark, root, flushEvery = 1, maxDeltas = 3)
    idx.initIndex(corpus(0L until 20L))
    idx.ingestBatch(corpus(20L until 25L), 0)(_ => ())
    assert(idx.stats("delta_versions") == 1L)
    idx.close()
    // crash remnant: a dpost half with no ddl half and no stats marker
    spark.read.parquet(s"$root/dpost_v0").write.parquet(s"$root/dpost_v1")
    val idx2 = new MaintainedTextIndex(spark, root, flushEvery = 1, maxDeltas = 3)
    assert(idx2.stats("version") == 0L && idx2.stats("delta_versions") == 1L,
      s"the torn pair must be invisible: ${idx2.stats}")
    assert(rows(idx2.search(Terms, 10)) ==
      rows(graft.functions.Search.bm25TopK(corpus(0L until 25L), Terms, 10)),
      "restart must serve the same logical index")
    idx2.close()
  }

  test("maintained text index: oversized tier drops the broadcast and majors early") {
    val root = tmp("mtix_guard")
    val idx = new MaintainedTextIndex(spark, root, flushEvery = 1,
      maxDeltas = 3, maxDeltaBroadcastBytes = 1L)
    idx.initIndex(corpus(0L until 20L))
    idx.ingestBatch(corpus(20L until 25L), 0)(_ => ()) // tier empty → minor
    assert(idx.stats("delta_versions") == 1L && idx.stats("delta_bytes") > 1L)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the guard governs the TIER relations (delta pairs can grow
      // without bound); the round-20 single-job scorer additionally
      // broadcasts two ≤|terms|-row relations (per-term df, the term
      // list), which are bounded by construction and exempt — so assert
      // no broadcast SUBTREE reads a delta dir, not "no broadcast at all"
      val p = idx.search(Terms, 10).queryExecution.executedPlan
      val tierBroadcasts = p.collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
            if b.toString.contains("ddl_v") || b.toString.contains("dpost_v") => b
      }
      assert(tierBroadcasts.isEmpty,
        s"oversized tier must not be broadcast:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(idx.stats("delta_fallbacks") >= 1L)
    // next flush sees the oversized tier → early major
    idx.ingestBatch(corpus(25L until 30L), 1)(_ => ())
    assert(idx.stats("version") == 1L && idx.stats("delta_versions") == 0L &&
      idx.stats("early_majors") == 1L,
      s"oversized tier must force an early major: ${idx.stats}")
    assert(rows(idx.search(Terms, 10)) ==
      rows(graft.functions.Search.bm25TopK(corpus(0L until 30L), Terms, 10)))
    idx.close()
  }

  test("maintained text index: a crash-refolded staging window does not double-count the stats") {
    val root = tmp("mtix_refold")
    val idx = new MaintainedTextIndex(spark, root, flushEvery = 100, maxDeltas = 3)
    idx.initIndex(corpus(0L until 20L))
    idx.ingestBatch(corpus(20L until 25L), 0)(_ => ()) // staged, no flush
    // snapshot staging, flush (delta 0 commits + staging deletes), then
    // restore staging — the crash-between-commit-and-delete state
    val snapPost = tmp("mtix_refold_snap") + "/post_staging"
    val snapDl = tmp("mtix_refold_snap2") + "/dl_staging"
    copyDir(s"$root/post_staging", snapPost)
    copyDir(s"$root/dl_staging", snapDl)
    idx.flush()
    assert(idx.stats("delta_versions") == 1L && idx.stats("n_docs") == 25L)
    idx.close()
    copyDir(snapPost, s"$root/post_staging")
    copyDir(snapDl, s"$root/dl_staging")
    val idx2 = new MaintainedTextIndex(spark, root, flushEvery = 100, maxDeltas = 3)
    idx2.flush() // refolds the SAME docs into delta 1
    assert(idx2.stats("delta_versions") == 2L)
    assert(idx2.stats("n_docs") == 25L,
      s"a refolded window must not double-count the stats: ${idx2.stats}")
    assert(rows(idx2.search(Terms, 10)) ==
      rows(graft.functions.Search.bm25TopK(corpus(0L until 25L), Terms, 10)),
      "search must stay batch-identical through the refold")
    idx2.close()
  }

  test("maintained text index: the stored postings serve x33's inverted index on the logical corpus") {
    val sparkS = spark
    import sparkS.implicits._
    val root = tmp("mtix_inv")
    val idx = new MaintainedTextIndex(spark, root, flushEvery = 1, maxDeltas = 3)
    idx.initIndex(corpus(0L until 20L))
    idx.ingestBatch(corpus(20L until 25L), 0)(_ => ())   // live delta
    // an update living in a second delta: the rollup must reflect it
    idx.ingestBatch(Seq((3L, "vector newword filler"))
      .toDF("doc_id", "text"), 1)(_ => ())
    assert(idx.stats("delta_versions") == 2L)
    val logical = corpus(0L until 25L).filter(col("doc_id") =!= 3L)
      .unionByName(Seq((3L, "vector newword filler")).toDF("doc_id", "text"))
    val batch = graft.functions.Search.invertedIndexOfTf(
      logical.select(col("doc_id"),
          explode(graft.functions.Text.tokens(col("text"))).as("term"))
        .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf")))
    assert(idx.invertedIndex().collect().toSeq == batch.collect().toSeq,
      "the stored-postings rollup must equal the batch x33 build")
    idx.close()
  }

  test("maintained text index: streaming foreachBatch ingestion matches the batch scorer") {
    val sparkS = spark
    import sparkS.implicits._
    val root = tmp("mtix_stream")
    val idx = new MaintainedTextIndex(spark, root, flushEvery = 2, maxDeltas = 2)
    idx.initIndex(corpus(0L until 20L))
    def tuples(ids: Seq[Long]) =
      corpus(ids).collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sparkS.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", tmp("mtix_stream_ckpt"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        idx.ingestBatch(b, id)(_ => ())
      }
      .start()
    try {
      in.addData(tuples(20L until 25L): _*)   // batch 0: staged
      q.processAllAvailable()
      assert(idx.stats("delta_versions") == 0L && idx.stats("staged_batches") == 1L)
      in.addData(tuples(25L until 30L): _*)   // batch 1: flush boundary
      q.processAllAvailable()
      assert(idx.stats("delta_versions") == 1L,
        s"the second window must flush a delta: ${idx.stats}")
    } finally q.stop()
    assert(rows(idx.search(Terms, 10)) ==
      rows(graft.functions.Search.bm25TopK(corpus(0L until 30L), Terms, 10)),
      "stream-built index must match the batch scorer")
    idx.close()
  }

  test("text index over the atomic pointer: a data-but-unmarked version is torn — restart advances, no wedge") {
    val root = tmp("mtix_torn_ptr")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val idx = new MaintainedTextIndex(spark, root, flushEvery = 1,
      pointer = Some(new graft.streaming.AtomicFileVersionPointer(
        fs, root, "post_v", "w#1")))
    idx.initIndex(corpus(0L until 20L))
    idx.ingestBatch(corpus(20L until 25L), 0)(_ => ()) // major → post_v1
    assert(idx.stats("version") == 1L)
    idx.close()
    // dead writer's crash between the post write and the floor marker:
    // post_v2 data exists under a surviving foreign claim
    new graft.streaming.AtomicFileVersionPointer(fs, root, "post_v", "dead#1")
      .advance(2)
    spark.read.parquet(s"$root/post_v1").write.parquet(s"$root/post_v2")
    val idx2 = new MaintainedTextIndex(spark, root, flushEvery = 1,
      pointer = Some(new graft.streaming.AtomicFileVersionPointer(
        fs, root, "post_v", "w#2")))
    assert(idx2.stats("version") == 1L, "the torn v2 must be invisible")
    idx2.ingestBatch(corpus(25L until 30L), 0)(_ => ()) // advance(2) must win
    assert(idx2.stats("version") == 2L,
      s"the restarted maintainer must claim past the torn version: ${idx2.stats}")
    assert(rows(idx2.search(Terms, 10)) ==
      rows(graft.functions.Search.bm25TopK(corpus(0L until 30L), Terms, 10)))
    idx2.close()
  }

  test("text-index gauges ride the O17 periodic reporter (the indexGauges contract)") {
    val root = tmp("mtix_gauges")
    val outDir = tmp("mtix_gauges_out")
    val idx = new MaintainedTextIndex(spark, root, flushEvery = 1, maxDeltas = 2)
    idx.initIndex(corpus(0L until 10L))
    val sm = new graft.metrics.Observability.StreamingMetrics
    val reporter = graft.metrics.Observability.startReporter(sm, outDir,
      intervalMs = 100L, indexGauges = () => Map("text" -> idx.stats))
    try {
      idx.ingestBatch(corpus(10L until 12L), 0)(_ => ())
      val deadline = System.currentTimeMillis() + 60000
      def lines() = Option(new java.io.File(outDir).listFiles())
        .getOrElse(Array.empty)
        .filter(_.getName.endsWith(".jsonl")).toSeq
        .flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq)
      var seen = Seq.empty[String]
      while (System.currentTimeMillis() < deadline &&
             !seen.exists(l => l.contains(""""index":"text"""") &&
               l.contains(""""flushes":1""") && l.contains(""""n_docs":12"""))) {
        Thread.sleep(50)
        seen = lines()
      }
      assert(seen.exists(l => l.contains(""""index":"text"""") &&
        l.contains(""""flushes":1""") && l.contains(""""n_docs":12""") &&
        l.contains(""""delta_versions":1""")),
        s"reporter must emit the text-index gauges; saw:\n${seen.mkString("\n")}")
    } finally reporter.close()
    idx.close()
  }

  test("hybrid RRF served from maintained artifacts matches the batch-artifact fusion") {
    val sparkS = spark
    import sparkS.implicits._
    def vecsOf(ids: Seq[Long]) = ids.map { i =>
      val c = (i % 4).toInt
      (i, Seq.tabulate(16) { j =>
        (if (j / 4 == c) 1.0 else 0.0) +
          0.05 * math.rint(math.sin(i * 31.0 + j * 7.0) * 100.0) / 100.0
      })
    }.toDF("vec_id", "embedding")
    val text = new MaintainedTextIndex(spark, tmp("hyb_text"),
      flushEvery = 1, maxDeltas = 2)
    text.initIndex(corpus(1L until 30L))
    text.ingestBatch(corpus(30L until 40L), 0)(_ => ()) // live delta
    val ann = new graft.streaming.MaintainedAnnIndex(spark, tmp("hyb_ann"),
      flushEvery = 1, nlist = 4, m = 8, k = 8, maxDeltas = 2)
    ann.initIndex(vecsOf(1L until 30L))
    ann.ingestBatch(vecsOf(30L until 40L), 0)(_ => ()) // live delta
    val allVecs = vecsOf(1L until 40L)
    val query = vecsOf(Seq(0L))
    def fused(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    val got = fused(graft.streaming.HybridRetrieval.searchRrf(
      text, ann, allVecs, Terms, query, k = 10, depth = 15, nprobe = 4))
    // the batch twin reuses the STORED model over the batch-encoded grown
    // corpus — maintained artifacts must reproduce it exactly
    val model = ann.loadModel()
    val lexB = graft.functions.Search.bm25TopK(corpus(1L until 40L), Terms, 15)
      .select(col("doc_id").as("id"),
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("bm25").desc, col("doc_id"))).as("r_lex"))
    val denseB = graft.functions.Ivfadc.searchRerank(allVecs,
        graft.functions.Ivfadc.encode(allVecs, model), query, model, 15, 4)
      .select(col("neighbor_id").as("id"), col("rk").as("r_dense"))
    val want = fused(graft.functions.Search.rrfFuse(lexB, denseB, 10))
    assert(got == want, s"maintained hybrid diverged:\n$got\nvs\n$want")
    text.close(); ann.close()
  }

  test("x79 declared slice equals the batch x32 result at sf0.001") {
    assert(rows(MaintainedTextIndex.x79IncrementalBm25(spark, sf0001)) ==
      rows(graft.functions.Search.x32Bm25TopK(spark, sf0001)))
  }
}
