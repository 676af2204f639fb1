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

  test("adc_table / adc_score natives are bit-identical to the HOF forms") {
    val sparkS = spark
    import sparkS.implicits._
    graft.plans.GraftExtensions.register(sparkS)
    // deterministic codebook m=4, k=8, dsub=2 and 64 query rows
    val m = 4; val k = 8; val dsub = 2
    val cb: Array[Array[Array[Double]]] = Array.tabulate(m, k, dsub)((j, i, p) =>
      math.rint(math.sin(j * 13.0 + i * 7.0 + p * 3.0) * 1000.0) / 1000.0)
    val cbLit = typedlit(cb.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq)
    val qs = (0L until 64L).map(i =>
      (i, Seq.tabulate(m * dsub)(p =>
        math.rint(math.cos(i * 31.0 + p * 11.0) * 1000.0) / 1000.0),
       Seq.tabulate(m)(j => ((i + j) % k).toInt)))
      .toDF("id", "q", "codes")
    // HOF references — the exact pre-round-20 formulations
    def sqDistH(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.Similarity.dotNative(a, a) -
        lit(2.0) * graft.functions.Similarity.dotNative(a, b) +
        graft.functions.Similarity.dotNative(b, b)
    def subvecH(e: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column) =
      slice(e.cast("array<double>"), j * dsub + 1, lit(dsub))
    val tabH = transform(sequence(lit(0), lit(m - 1)),
      j => transform(element_at(cbLit, j + 1), c => sqDistH(subvecH(col("q"), j), c)))
    val tabN = call_function("adc_table", col("q"), cbLit)
    val scoreH = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, j) => acc + element_at(element_at(col("tab"), j + 1),
        element_at(col("codes"), j + 1) + 1))
    val both = qs.select(col("id"), col("codes"), tabH.as("tab"), tabN.as("tabN"))
    assert(both.filter(col("tab") =!= col("tabN")).isEmpty,
      "adc_table must be bit-identical to the HOF form")
    val scored = both
      .select(col("id"), scoreH.as("sH"),
        call_function("adc_score", col("tab"), col("codes")).as("sN"))
    assert(scored.filter(col("sH") =!= col("sN")).isEmpty,
      "adc_score must be bit-identical to the HOF fold")
    // degenerate inputs: short codes / out-of-range code yield null
    val bad = Seq((Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0), Seq(0, 1)),
      (Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0), Seq(0, 1, 2, 99)))
      .toDF("q", "codes")
      .select(call_function("adc_score",
        call_function("adc_table", col("q"), cbLit), col("codes")).as("sn"))
    assert(bad.filter(col("sn").isNotNull).isEmpty,
      "degenerate codes must score null, like the HOF's poisoned fold")
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
