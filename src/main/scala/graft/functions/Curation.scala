package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** x39 — the corpus-curation pipeline as ONE composed plan: quality gate →
  * language ID → exact-dedup canonical keep → deterministic split. This is
  * the flagship composition for the LLM-data side (the reference-semantics
  * flagship is t1_slice): each stage is an already-verified operator
  * (x02/x03/x01/x19) and the pipeline shows they fuse into a single
  * Catalyst plan — one token staging, one fingerprint shuffle (the dedup
  * window), everything else map-only. At 100 TB this whole curation pass
  * costs one corpus scan plus the fp exchange.
  */
object Curation {

  /** Minimum whitespace tokens for a doc to survive the quality gate. */
  val MinTokens = 30

  /** Stopword-ratio band: below = word-soup/garbled, above = template glue. */
  val MinStopRatio = 0.02
  val MaxStopRatio = 0.25

  def x39CurationPipeline(s: SparkSession, dir: String): DataFrame = {
    val stop = Seq("the", "a", "and", "of", "to", "in")
    val staged = documents(s, dir)
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"),
        col("toks"),
        size(col("toks")).as("n_ws_tokens"),
        // ANSI guard: zero-token docs (empty/null text) would throw on the
        // int division; they are gated out by MinTokens anyway, so 0.0
        when(size(col("toks")) > 0,
          size(filter(col("toks"), t => t.isin(stop.map(x => x: Any): _*)))
            / size(col("toks"))).otherwise(lit(0.0)).as("stop_ratio"),
        Text.fingerprint(col("text")).as("fp"))
    // quality-filter BEFORE the dedup window: docs in one fp group have
    // identical normalized text, hence identical token/stopword metrics, so
    // a group passes or fails the gate as a unit — filtering first is
    // semantically identical and shrinks the only shuffle (fp) by the
    // rejection rate (Catalyst cannot push a non-partition-key predicate
    // below a window on its own)
    staged
      .filter(col("n_ws_tokens") >= MinTokens &&
        col("stop_ratio") >= MinStopRatio && col("stop_ratio") <= MaxStopRatio)
      .withColumn("keep_id", min(col("doc_id")).over(Window.partitionBy(col("fp"))))
      .filter(col("doc_id") === col("keep_id"))
      .select(col("doc_id"),
        Text.langGuess(col("toks")).as("guess_lang"),
        col("n_ws_tokens"),
        round(col("stop_ratio"), 4).as("stop_ratio"),
        when(Sampling.hashBucket(col("doc_id")) < 80, "train")
          .when(Sampling.hashBucket(col("doc_id")) < 90, "validation")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  /** x71 — the FULL pretraining-data pipeline as one composed plan:
    * quality gate (x39's MinTokens rule) → exact-dedup canonical (x01's
    * min-id-per-fingerprint, applied among gated docs) → NEAR-dup cluster
    * canonical (one survivor per x26 connected component, min gated id) →
    * leakage-free split (x52's rule: bucket by md5 of the CLUSTER key so
    * near-dups can never straddle train/test). x39 stops at exact dedup;
    * this is the version a real pretraining corpus ships through.
    *
    * Layer ordering (the SCALING.md §5 lesson, applied): the near-dup
    * cluster layer runs over the EXACT-DEDUP SURVIVORS (`kept1`), not the
    * raw corpus — identical text means identical signatures and shingles,
    * so a dropped exact twin contributes no pair its keeper doesn't, and
    * excluding twins up front keeps the LSH candidate bill LSH-sized
    * instead of clone-dense (the difference between ~15 s and ~243 s at
    * the 100k-doc 20-clone probe, and the difference between a bounded
    * and a quadratic pair set at 100 TB dup rates). Plan cost beyond the
    * survivor signature/shingle caches: the fp window exchange (which
    * carries text once, into the cluster branch), the edge-sized CC loop,
    * one broadcast-able cluster-map join, a cluster-key window, and
    * map-only bucket assignment. */
  def x71PretrainPipeline(s: SparkSession, dir: String): DataFrame =
    x71PretrainPipelineOf(s, documents(s, dir), s"$dir|x71survivors")

  /** Relation form of x71 (the [[Dedup.x26DupClustersOf]] Of-pattern):
    * the same composed plan over an arbitrary `(doc_id, source, text)`
    * relation — what the streaming curation service's parity test
    * recomputes over its total ingested corpus, and what a caller with a
    * non-table corpus runs directly. `tag` scopes the signature/shingle
    * caches (release with `GraftCaches.release(s, tag)` when the
    * relation is transient). */
  def x71PretrainPipelineOf(s: SparkSession, docs: DataFrame, tag: String): DataFrame = {
    val f = docs.select(col("doc_id"), col("source"), col("text"),
      graft.functions.Text.fingerprint(col("text")).as("fp"),
      coalesce(size(graft.functions.Text.tokens(col("text"))), lit(0))
        .cast("long").as("n_tokens"))
    val gated = f.filter(col("n_tokens") >= MinTokens)
    val kept1 = gated
      .withColumn("keep_id", min(col("doc_id")).over(Window.partitionBy("fp")))
      .filter(col("doc_id") === col("keep_id"))
    val clusters = Dedup
      .x26DupClustersOf(s, kept1.select(col("doc_id"), col("text")), tag)
      .select(col("doc_id"), col("cluster_id"))
    val kept2 = kept1.join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_key", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("cmin", min(col("doc_id")).over(Window.partitionBy("cluster_key")))
      .filter(col("doc_id") === col("cmin"))
    kept2
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cluster_key"),
        Sampling.hashBucket(col("cluster_key")).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "validation")
          .otherwise("test"))
      .orderBy(col("doc_id"))
  }

  /** x72 — score-calibration drift per source: how far each source's
    * quality-score distribution sits from the corpus-wide one, measured as
    * the doc-weighted mean |F_s(v) − F(v)| of the strictly-less CDFs (an
    * L1/Wasserstein-flavoured gap) plus a signed bias (positive = the
    * source's scores rank high globally). This is the check run before
    * pooling heterogeneous per-source quality scores into one threshold —
    * x50's tiers assume comparable distributions; this measures whether
    * they are. Scale shape: the score is ROUNDED to 4 decimals first, so
    * the whole computation collapses onto the (source × ≤10001 score
    * values) histogram — one map-side-combined exchange, then every CDF
    * window and the drift aggregate run on the control-plane relation. */
  def x72ScoreCalibration(s: SparkSession, dir: String): DataFrame = {
    val stop = Seq("the", "a", "and", "of", "to", "in")
    val scored = documents(s, dir)
      .withColumn("toks", graft.functions.Text.tokens(col("text")))
      .select(col("source"),
        round(when(size(col("toks")) > 0,
          size(filter(col("toks"), t => t.isin(stop.map(x => x: Any): _*))) /
            size(col("toks"))).otherwise(lit(0.0)), 4).as("score"))
    val hist = scored.groupBy(col("source"), col("score")).agg(count(lit(1)).as("n_sv"))
    val global = hist.groupBy(col("score")).agg(sum(col("n_sv")).as("n_v"))
      .withColumn("cum_g", coalesce(sum(col("n_v")).over(
        Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_total", sum(col("n_v")).over(
        Window.orderBy("score").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val perSrc = hist
      .withColumn("cum_s", coalesce(sum(col("n_sv")).over(
        Window.partitionBy("source").orderBy("score")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_s", sum(col("n_sv")).over(Window.partitionBy("source")))
    val fs = col("cum_s").cast("double") / col("n_s").cast("double")
    val fg = col("cum_g").cast("double") / col("n_total").cast("double")
    perSrc.join(global.select(col("score"), col("cum_g"), col("n_total")), "score")
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_docs"),
        round(sum(col("n_sv").cast("double") * abs(fs - fg)) /
          max(col("n_s")).cast("double"), 4).as("drift"),
        round(sum(col("n_sv").cast("double") * (fg - fs)) /
          max(col("n_s")).cast("double"), 4).as("bias"))
      .orderBy(col("source"))
  }

  /** x64 — per-source report card: the governance query a multi-source
    * pipeline runs after every ingest — per source: doc count, exact-dup
    * exposure (docs whose fingerprint group has >1 member, corpus-wide),
    * token volume, mean length, language spread and the dominant language.
    * One fingerprint exchange (shared shape with x01) feeds the dup
    * columns; the language mode runs on the control-plane (source × lang)
    * relation with a rank window. Null fingerprints coalesce to a sentinel
    * so null-text docs keep counting (md5 hex can't collide with it). */
  def x64SourceReport(s: SparkSession, dir: String): DataFrame = {
    val f = documents(s, dir).select(col("source"), col("lang"), col("n_chars"),
      coalesce(graft.functions.Text.fingerprint(col("text")), lit("null")).as("fp"),
      coalesce(size(graft.functions.Text.tokens(col("text"))), lit(0)).as("n_toks"))
    val gs = f.groupBy("fp").agg(count(lit(1)).as("n_in_group"))
    val dom = f.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("cnt").desc, col("lang"))))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("dominant_lang"))
    f.join(gs, "fp")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("n_in_group") > 1).cast("long")).as("n_dup_docs"),
        round(avg((col("n_in_group") > 1).cast("double")), 4).as("dup_frac"),
        sum(col("n_toks").cast("long")).as("total_tokens"),
        round(avg(col("n_chars")), 2).as("avg_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .join(dom, Seq("source"), "left")
      .orderBy(col("source"))
  }
}
