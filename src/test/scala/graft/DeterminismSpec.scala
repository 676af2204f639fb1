package graft

/** Determinism contract: every declared query promises a total order and
  * run-to-run stable output (that is what lets the driver hash-compare
  * against DuckDB). The one-shot oracle can't see nondeterminism that
  * happens to match once — this spec re-executes a representative slice
  * (shuffle-heavy, sample-based, sketch-based, window-based) and asserts
  * bit-identical collected output across runs, plus thread-safety of the
  * shared relation caches. */
class DeterminismSpec extends SparkSpec {

  private val names = Seq(
    "d03_last_event_per_user", // argmax through a shuffle
    "d08_revenue_per_nation",  // multi-join + agg
    "x01_dedup_exact",         // hash-keyed group
    "x20_stratified_sample",   // seedless md5 sample
    "x40_mixture_resample",    // budgets + sample composition
    "x38_cms_heavy_hitters",   // sketch build + estimates
    "x42_cdc_chunks",          // native expression fan-out
    "x39_curation_pipeline",   // composed pipeline
    "x46_token_budget_mix",    // running-sum window prefix
    "x47_tfidf_topk",          // reused-exchange tf/df + window
    "x51_dup_pagerank",        // iterative FP loop over the dup graph
    "x52_cluster_split",       // CC loop + bucket composition
    "x53_source_overlap",      // min-of-mins signature aggregate
    "x54_span_removal",        // cached gram relation + anti-join rebuild
    "x55_bpe_tokenize",        // cached trained merges + vocab join
    "x56_context_windows",     // map-only window tiling
    "x57_priority_dedup",      // min_by through a shuffle on a folded key
    "x58_corpus_shuffle",      // md5-derived shard + in-shard row_number
    "x59_incremental_dedup",   // index join + in-batch argmin window
    "x60_length_outliers",     // partitioned percent_rank band
    "x62_incremental_neardup", // LSH screen + folded-key argmin
    "x63_lm_perplexity",       // broadcast log-model scoring
    "x64_source_report",       // fp exchange + control-plane language mode
    "x65_label_centroids",     // centroid broadcast + percentile window
    "x66_length_histogram",    // bit-length buckets + control-plane CDF
    "x67_pmi_collocations",    // model-derived marginals + heap top-K
    "x68_self_repetition",     // doc-partitioned coverage pipeline
    "x69_containment_screen",  // directed containment over LSH candidates
    "x70_distinctive_terms",   // log-odds rank windows
    "x71_pretrain_pipeline",   // gate + dedup + CC + split composition
    "x72_score_calibration",   // histogram CDF gaps
    "x73_hashed_features",     // collect_list→map vector rebuild
    "x74_negative_samples",    // bucket-representative partner pick
    "x75_reshard_plan",        // ring literals + scalar agg
    "x76_minhash_calibration", // signature joins + calibration agg
    "x77_dsir_select",         // quantized importance scores + integer top-N
    "x78_gopher_rules")        // map-only rule signals

  test("declared queries produce bit-identical output across executions") {
    for (n <- names) {
      val q = SparkEntry.queries(n)
      val a = q(spark, sf0001).collect().map(_.toString).toSeq
      val b = q(spark, sf0001).collect().map(_.toString).toSeq
      assert(a == b, s"$n differed between two executions")
      assert(a.nonEmpty, s"$n returned no rows")
    }
  }

  test("shared relation caches fill once under concurrent first use") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // hammer the gram cache from many threads on a fresh key (a temp-dir
    // copy of the corpus makes the key unique to this test)
    val dir = java.nio.file.Files.createTempDirectory("graft_conc").toString
    Tables.documents(spark, sf0001)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val runs = Future.traverse(1 to 8) { _ =>
      Future(graft.functions.Corpus.x28BigramLm(spark, dir).count())
    }
    val counts = Await.result(runs, 5.minutes)
    assert(counts.distinct.size == 1, s"concurrent fills disagreed: $counts")
  }
}
