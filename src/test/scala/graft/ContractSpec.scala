package graft

/** Static guards on the driver contract itself — the failure modes that
  * sail through compilation and only surface as a red CORRECTNESS row:
  * an oracle without a matching query, or an oracle missing the total
  * ORDER BY the row-order-sensitive compare requires. */
class ContractSpec extends SparkSpec {

  /** Queries whose result is a single row by construction — a total order
    * is vacuous there and the SQL legitimately omits ORDER BY. */
  private val singleRow = Set(
    "d05_count_distinct", "x36_least_squares", "x43_chunk_dedup_stats",
    "x61_zipf_fit")

  test("every oracle has a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every multi-row oracle carries a total ORDER BY") {
    val missing = SparkEntry.oracleSql.collect {
      case (name, sql) if !singleRow(name) &&
        !sql.toUpperCase.contains("ORDER BY") => name
    }
    assert(missing.isEmpty, s"row-order-sensitive compare needs ORDER BY: $missing")
  }

  test("single-row whitelist entries really are single-row") {
    for (n <- singleRow)
      assert(SparkEntry.queries(n)(spark, sf0001).count() == 1L, n)
  }

  /** Round-6 snapshot of the declared surface plus round-7 additions. The
    * floor is a NAMED set,
    * not a count: a legitimate removal/rename must be reflected here
    * explicitly, and an accidental one fails with the exact entries that
    * regressed instead of an opaque size mismatch. New names never touch
    * this list. */
  private val queryFloor: Set[String] = Set(
    "d01_scan_projection", "d02_filter", "d03_last_event_per_user",
    "d03b_salted_argmax", "d04_hash_agg", "d05_count_distinct",
    "d06_join_orders_customer", "d07_anti_join", "d07_semi_join",
    "d07b_left_outer_join", "d07c_full_outer_join", "d08_revenue_per_nation",
    "d09_window_running", "d09b_window_family", "d10_topk", "d11_except",
    "d11_intersect", "d11_union", "d12_queue_ref_parse", "d13_events_per_day",
    "d13b_hour_histogram", "d13c_date_arithmetic", "d14_json_extract",
    "d15_dml_key", "d15b_dml_key_native", "d16_rollup", "d16b_cube",
    "d16c_grouping_sets", "d17_distinct", "d18_hourly_window",
    "d19_sessionize", "d20_similarity_topk", "d21_token_topk", "d22_pivot",
    "d23_percentiles", "d24_exists_subquery", "d25_null_ops",
    "d26_scalar_subquery", "d27_array_agg", "d28_unpivot", "d29_asof_join",
    "d30_range_join", "d31_range_window", "d32_salted_join",
    "d33_stats_moments", "d34_approx_percentiles", "d35_lateral_topn",
    "d36_outliers", "d37_gap_fill", "d38_winsorize", "d39_funnel",
    "o02_changelog_compact", "o07_snapshot_union_tail", "o10_changelog_source",
    "o13_malformed_routing", "t1_slice", "x01_dedup_exact", "x02_doc_quality",
    "x03_lang_id", "x04_trigram_jaccard", "x05_minhash_signatures",
    "x05b_minhash_fast", "x06_neardup_pairs", "x06b_neardup_fast",
    "x07_simhash", "x07b_simhash_md5", "x07c_simhash64_md5",
    "x08_ann_multi_query", "x08b_ann_topk_agg", "x09_ann_lsh",
    "x09b_ann_lsh_multi", "x10_embedding_neardups", "x11_multimodal_meta",
    "x12_multimodal_features", "x13_ann_ivf", "x14_simhash_neardups",
    "x15_rolling_fingerprint", "x16_verified_neardups", "x17_frame_sample",
    "x18_resize_meta", "x19_hash_split", "x20_stratified_sample",
    "x21_sequence_pack", "x22_decontaminate", "x23_repetition_stats",
    "x24_mixture_weights", "x25_token_count", "x26_dup_clusters",
    "x27_pii_redact", "x28_bigram_lm", "x29_dup_spans", "x30_pq_ann",
    "x31_ivfadc_ann", "x32_bm25_topk", "x33_inverted_index",
    "x34_semantic_dedup", "x35_bloom_decontaminate", "x36_least_squares",
    "x37_bpe_merges", "x38_cms_heavy_hitters", "x39_curation_pipeline",
    "x40_mixture_resample", "x41_hybrid_rrf", "x42_cdc_chunks",
    "x43_chunk_dedup_stats", "x44_chunk_neardups",
    // round-7 additions (all oracled)
    "d40_ntile", "d41_forward_asof", "x45_knn_label", "x46_token_budget_mix",
    "x47_tfidf_topk", "x48_split_leakage", "x49_ngram_novelty",
    "x50_quality_tiers", "x51_dup_pagerank", "x52_cluster_split",
    "x53_source_overlap", "x54_span_removal",
    // round-8 floor refresh: the round-7 tail, now part of the floor
    "d42_retention_cohorts", "x55_bpe_tokenize", "x56_context_windows",
    "x57_priority_dedup", "x58_corpus_shuffle", "x59_incremental_dedup",
    "x60_length_outliers", "x61_zipf_fit", "x62_incremental_neardup",
    "x63_lm_perplexity", "x64_source_report", "x65_label_centroids",
    "x66_length_histogram", "x67_pmi_collocations", "x68_self_repetition",
    "x69_containment_screen", "x70_distinctive_terms", "x71_pretrain_pipeline",
    "x72_score_calibration", "x73_hashed_features", "x74_negative_samples",
    "x75_reshard_plan", "x76_minhash_calibration",
    // round-8 additions
    "x77_dsir_select", "x78_gopher_rules",
    // round-9 additions
    "x37b_bpe_merges_scaled", "x55b_bpe_tokenize_full",
    "u01_utf8_tokens", "u02_utf8_xxhash", "x77b_dsir_select_fast",
    // round-10 additions: the multibyte slice across the fingerprint and
    // quality families
    "u03_utf8_minhash", "u04_utf8_cdc_chunks", "u05_utf8_simhash",
    "u06_utf8_polyfp", "u07_utf8_quality", "u08_utf8_gopher")

  /** Round 8 emptied this set: d34 (containment form), x37/x55 (unrolled
    * training rounds + apply join), x05b/x06b/x07 (XXH64 generated as
    * DuckDB SQL — XxhashSql), and x13/x30/x31 (order-free quantized
    * k-means means + unrolled Lloyd rounds — AnnOracleSql). Every declared
    * query now carries a DuckDB oracle; kept as a set so a future
    * genuinely-inexpressible query has a documented place to go. */
  private val noOracle: Set[String] = Set.empty

  test("the declared surface keeps growing monotonically (snapshot floor)") {
    val lostQueries = queryFloor -- SparkEntry.queries.keySet
    assert(lostQueries.isEmpty,
      s"declared queries removed vs round-6 floor: ${lostQueries.toSeq.sorted}")
    val lostOracles = (queryFloor -- noOracle) -- SparkEntry.oracleSql.keySet
    assert(lostOracles.isEmpty,
      s"oracled queries removed vs round-6 floor: ${lostOracles.toSeq.sorted}")
  }
}
