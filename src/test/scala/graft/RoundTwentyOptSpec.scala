package graft

import org.apache.spark.sql.functions._

/** Round-20 optimization round: the maintained indexes' major folds and
  * tier serves were restructured from corpus-wide group/dedup shuffles to
  * the no-base-shuffle topology (delta side resolves alone, its key set
  * anti-joins the base as a broadcast, matched base rows come back through
  * a broadcast semi-join). These tests pin the restructured arithmetic on
  * the edges the oracle rows don't isolate: the fp index's cross-tier min
  * (base vs delta disagreeing on an fp's keeper), the tombstone +
  * staged-new major fold, and the near-dup fold's base/delta/staged doc
  * partitioning. */
class RoundTwentyOptSpec extends SparkSpec {
  import graft.streaming.Pipelines
  import graft.streaming.Pipelines.DedupDecision

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("fp index: cross-tier min resolves base-vs-delta keeper disagreement (the least() path)") {
    val sparkS = spark
    import sparkS.implicits._
    val root = tmp("r20_fpmin")
    val idx = new Pipelines.MaintainedDedupIndex(sparkS, root, ttlMs = 1000,
      flushEvery = 1, maxDeltas = 4)
    idx.initIndex(Seq(("fpA", 5L), ("fpB", 10L)).toDF("fp", "corpus_id"))
    // hand-write a delta carrying a SMALLER keeper for fpB (the
    // out-of-order-ingest shape the min-fold contract covers) plus a new fp
    Seq(("fpB", 3L), ("fpC", 7L)).toDF("fp", "corpus_id")
      .coalesce(1).write.parquet(s"$root/delta_v0")
    val got = idx.currentIndex.orderBy("fp")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("fpA", 5L), ("fpB", 3L), ("fpC", 7L)),
      s"cross-tier min broke: $got")
    idx.close()
  }

  test("fp index: major fold = base passthrough + tombstone GC + staged new (no corpus shuffle topology)") {
    val sparkS = spark
    import sparkS.implicits._
    val root = tmp("r20_fpfold")
    val idx = new Pipelines.MaintainedDedupIndex(sparkS, root, ttlMs = 1000,
      flushEvery = 1, maxDeltas = 1)
    idx.initIndex(Seq(("fpA", 5L), ("fpB", 10L), ("fpD", 40L))
      .toDF("fp", "corpus_id"))
    // batch 0: tombstone fpA -> minor delta (tier size 1 = maxDeltas)
    idx.deleteFps(Seq("fpA").toDF("fp"), 0L)
    assert(idx.stats("delta_versions") == 1L)
    // batch 1: accept fpC -> staged; flush fires the MAJOR (tier at cap):
    // fold = base {A,B,D} + delta {A: -1} + staged {C: 7}
    idx.finalizeBatch(
      Seq(DedupDecision(7L, "fpC", "new", None)).toDS(), 1L)(_.collect())
    assert(idx.stats("delta_versions") == 0L, "major must clear the tier")
    val got = idx.currentIndex.orderBy("fp")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("fpB", 10L), ("fpC", 7L), ("fpD", 40L)),
      s"major fold broke: $got")
    idx.close()
  }

  test("near-dup index: major fold keeps base survivors, staged novels, and GCs staged deletes") {
    val sparkS = spark
    import sparkS.implicits._
    val root = tmp("r20_ndfold")
    val idx = new Pipelines.MaintainedNearDupIndex(sparkS, root, flushEvery = 1)
    def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")
    idx.initIndex(docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "one two three four five six seven eight nine ten"))
    // batch 0 (maxDeltas = 0 -> every flush majors): a novel doc folds in
    idx.screenBatch(docs(
      3L -> "completely different text about spark optimization rounds"), 0L)(_.collect())
    // batch 1: delete doc 1, then a re-screen of doc-1-like text must
    // read as novel post-major (the doc left both stored relations)
    idx.deleteDocs(Seq(1L).toDF("doc_id"), 1L)
    val sigDocs = idx.currentSignatures.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val tgDocs = idx.currentShingles.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(sigDocs == Set(2L, 3L) && tgDocs == Set(2L, 3L),
      s"fold broke: sig=$sigDocs tg=$tgDocs")
    val rescreen = idx.screen(docs(
      9L -> "alpha beta gamma delta epsilon zeta eta theta"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rescreen == Seq((9L, 0L)),
      s"deleted doc's text must re-screen as novel: $rescreen")
    idx.close()
  }
}
