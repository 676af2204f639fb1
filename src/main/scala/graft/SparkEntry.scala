package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Relational
import graft.functions.{Corpus, Dedup, Multimodal, Privacy, Sampling, Similarity, Text}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator (SURVEY.md §2.3 D1–D21 plus the O-series parity
  * ops and the LLM-pipeline x-series) has a `queries` entry; all
  * SQL-expressible ones also have a DuckDB oracle in [[oracleSql]] with
  * IDENTICAL column names and total ORDER BY on both sides.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. The t1 slice
    * (SURVEY.md §7.2) composes the reference's essence end to end: changelog
    * → dml key derivation → compaction → filter → aggregation. */
  def entry(spark: SparkSession): DataFrame =
    Relational.t1Slice(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d01_scan_projection"   -> (Relational.d01ScanProjection _),
    "d02_filter"            -> (Relational.d02Filter _),
    "d03_last_event_per_user" -> (Relational.d03LastEventPerUser _),
    "d03b_salted_argmax"    -> (Relational.d03bSaltedArgmax _),
    "d04_hash_agg"          -> (Relational.d04HashAgg _),
    "d05_count_distinct"    -> (Relational.d05CountDistinct _),
    "d06_join_orders_customer" -> (Relational.d06JoinOrdersCustomer _),
    "d07_anti_join"         -> (Relational.d07AntiJoin _),
    "d07_semi_join"         -> (Relational.d07SemiJoin _),
    "d07b_left_outer_join"  -> (Relational.d07bLeftOuterJoin _),
    "d07c_full_outer_join"  -> (Relational.d07cFullOuterJoin _),
    "d09b_window_family"    -> (Relational.d09bWindowFamily _),
    "d26_scalar_subquery"   -> (Relational.d26ScalarSubquery _),
    "d08_revenue_per_nation" -> (Relational.d08RevenuePerNation _),
    "d09_window_running"    -> (Relational.d09WindowRunning _),
    "d10_topk"              -> (Relational.d10TopK _),
    "d11_except"            -> (Relational.d11Except _),
    "d11_intersect"         -> (Relational.d11Intersect _),
    "d11_union"             -> (Relational.d11Union _),
    "d12_queue_ref_parse"   -> (Relational.d12QueueRefParse _),
    "d13_events_per_day"    -> (Relational.d13EventsPerDay _),
    "d14_json_extract"      -> (Relational.d14JsonExtract _),
    "d15_dml_key"           -> (Relational.d15DmlKey _),
    "d15b_dml_key_native"   -> (Relational.d15bDmlKeyNative _),
    "d13b_hour_histogram"   -> (Relational.d13bHourHistogram _),
    "d13c_date_arithmetic"  -> (Relational.d13cDateArithmetic _),
    "d16_rollup"            -> (Relational.d16Rollup _),
    "d16b_cube"             -> (Relational.d16Cube _),
    "d16c_grouping_sets"    -> (Relational.d16GroupingSets _),
    "d17_distinct"          -> (Relational.d17Distinct _),
    "d18_hourly_window"     -> (Relational.d18HourlyWindow _),
    "d19_sessionize"        -> (Relational.d19Sessionize _),
    "d20_similarity_topk"   -> ((s: SparkSession, d: String) => Similarity.d20TopKNeighbors(s, d)),
    "d21_token_topk"        -> (Text.d21TokenTopK _),
    "d22_pivot"             -> (Relational.d22Pivot _),
    "d24_exists_subquery"   -> (Relational.d24ExistsSubquery _),
    "d25_null_ops"          -> (Relational.d25NullOps _),
    "d23_percentiles"       -> (Relational.d23Percentiles _),
    "d27_array_agg"         -> (Relational.d27ArrayAgg _),
    "d28_unpivot"           -> (Relational.d28Unpivot _),
    "d29_asof_join"         -> (Relational.d29AsofJoin _),
    "d30_range_join"        -> (Relational.d30RangeJoin _),
    "d31_range_window"      -> (Relational.d31RangeWindow _),
    "d32_salted_join"       -> ((s: SparkSession, d: String) => Relational.d32SaltedJoin(s, d)),
    "t1_slice"              -> (Relational.t1Slice _),
    "o02_changelog_compact" -> (Relational.o02ChangelogCompact _),
    "o07_snapshot_union_tail" -> (Relational.o07SnapshotUnionTail _),
    "o10_changelog_source"  -> (Relational.o10ChangelogSource _),
    "o13_malformed_routing" -> (Relational.o13MalformedRouting _),
    "x01_dedup_exact"       -> (Dedup.x01ExactDedup _),
    "x02_doc_quality"       -> (Text.x02DocQuality _),
    "x03_lang_id"           -> (Text.x03LangId _),
    "x04_trigram_jaccard"   -> (Text.x04TrigramJaccard _),
    "x05_minhash_signatures" -> (Dedup.x05MinhashSignatures _),
    "x05b_minhash_fast"     -> (Dedup.x05bMinhashFast _),
    "x06_neardup_pairs"     -> (Dedup.x06NearDupPairs _),
    "x06b_neardup_fast"     -> (Dedup.x06bNearDupFast _),
    "x07_simhash"           -> (Dedup.x07Simhash _),
    "x14_simhash_neardups"  -> (Dedup.x14SimhashNearDups _),
    "x15_rolling_fingerprint" -> (Text.x15RollingFingerprint _),
    "x16_verified_neardups" -> (Dedup.x16VerifiedNearDups _),
    "x26_dup_clusters"      -> (Dedup.x26DupClusters _),
    "x07b_simhash_md5"      -> (Dedup.x07bSimhashMd5 _),
    "x07c_simhash64_md5"    -> (Dedup.x07cSimhash64Md5 _),
    "x08_ann_multi_query"   -> ((s: SparkSession, d: String) => Similarity.x08AnnMultiQuery(s, d)),
    "x08b_ann_topk_agg"     -> ((s: SparkSession, d: String) => Similarity.x08bAnnTopKAgg(s, d)),
    "x09_ann_lsh"           -> (Similarity.x09AnnLsh _),
    "x09b_ann_lsh_multi"    -> (Similarity.x09bAnnLshMulti _),
    "x13_ann_ivf"           -> (graft.functions.Ivf.x13AnnIvf _),
    "x10_embedding_neardups" -> (Dedup.x10EmbeddingNearDups _),
    "x11_multimodal_meta"   -> (Multimodal.x11MultimodalMeta _),
    "x12_multimodal_features" -> (Multimodal.x12MultimodalFeatures _),
    "x17_frame_sample"      -> (Multimodal.x17FrameSample _),
    "x18_resize_meta"       -> (Multimodal.x18ResizeMeta _),
    "x19_hash_split"        -> (Sampling.x19HashSplit _),
    "x20_stratified_sample" -> ((s: SparkSession, d: String) => Sampling.x20StratifiedSample(s, d)),
    "x21_sequence_pack"     -> ((s: SparkSession, d: String) => Sampling.x21SequencePack(s, d)),
    "x22_decontaminate"     -> ((s: SparkSession, d: String) => Sampling.x22Decontaminate(s, d)),
    "x23_repetition_stats"  -> ((s: SparkSession, d: String) => Sampling.x23RepetitionStats(s, d)),
    "x24_mixture_weights"   -> ((s: SparkSession, d: String) => Sampling.x24MixtureWeights(s, d)),
    "x25_token_count"       -> (Text.x25TokenCount _),
    "u01_utf8_tokens"       -> (Text.u01Utf8Tokens _),
    "u02_utf8_xxhash"       -> (Text.u02Utf8Xxhash _),
    "u03_utf8_minhash"      -> (Dedup.u03Utf8MinhashFast _),
    "u04_utf8_cdc_chunks"   -> (Text.u04Utf8CdcChunks _),
    "u05_utf8_simhash"      -> (Dedup.u05Utf8Simhash _),
    "u06_utf8_polyfp"       -> (Text.u06Utf8RollingFingerprint _),
    "u07_utf8_quality"      -> (Text.u07Utf8Quality _),
    "u08_utf8_gopher"       -> ((s: SparkSession, d: String) =>
      Text.u08Utf8Gopher(s, d, stops = Seq("the", "a"))),
    "u09_utf8_bpe_tokenize" -> (graft.functions.Bpe.u09Utf8BpeTokenize _),
    "u10_utf8_bm25"         -> (Text.u10Utf8Bm25 _),
    "x27_pii_redact"        -> (Privacy.x27PiiRedact _),
    "x28_bigram_lm"         -> (Corpus.x28BigramLm _),
    "x29_dup_spans"         -> (Corpus.x29DupSpans _),
    "x30_pq_ann"            -> (graft.functions.Pq.x30PqAnn _),
    "x31_ivfadc_ann"        -> (graft.functions.Ivfadc.x31IvfadcAnn _),
    "x32_bm25_topk"         -> (graft.functions.Search.x32Bm25TopK _),
    "x33_inverted_index"    -> (graft.functions.Search.x33InvertedIndex _),
    "x79_incremental_bm25"  -> (graft.streaming.MaintainedTextIndex.x79IncrementalBm25 _),
    "x80_incremental_ivfadc" -> (graft.streaming.MaintainedAnnIndex.x80IncrementalIvfadc _),
    "x81_maintained_hybrid"  -> (graft.streaming.HybridRetrieval.x81MaintainedHybridRrf _),
    "x82_semantic_screen"    -> (graft.streaming.MaintainedAnnIndex.x82SemanticScreen _),
    "x83_admission_screen"   -> (graft.streaming.MaintainedAnnIndex.x83AdmissionScreen _),
    "x84_text_index_delete"  -> (graft.streaming.MaintainedTextIndex.x84TextIndexDelete _),
    "x85_ann_index_delete"   -> (graft.streaming.MaintainedAnnIndex.x85AnnIndexDelete _),
    "x86_ann_shadow_compact" -> (graft.streaming.MaintainedAnnIndex.x86AnnShadowCompact _),
    "x87_text_shadow_compact" -> (graft.streaming.MaintainedTextIndex.x87TextShadowCompact _),
    "x88_ann_retrain"        -> (graft.streaming.MaintainedAnnIndex.x88AnnRetrain _),
    "x89_dedup_takedown"     -> (graft.streaming.Pipelines.x89DedupTakedown _),
    "x90_neardup_screen"     -> (graft.streaming.Pipelines.x90NearDupScreen _),
    "x91_neardup_takedown"   -> (graft.streaming.Pipelines.x91NearDupTakedown _),
    "x92_text_reopen_serve"  -> (graft.streaming.MaintainedTextIndex.x92TextReopenServe _),
    "x93_ann_reopen_serve"   -> (graft.streaming.MaintainedAnnIndex.x93AnnReopenServe _),
    "x94_dedup_shadow_compact" -> (graft.streaming.Pipelines.x94DedupShadowCompact _),
    "x95_neardup_shadow_compact" -> (graft.streaming.Pipelines.x95NearDupShadowCompact _),
    "x96_text_reader_serve"  -> (graft.streaming.MaintainedTextIndex.x96TextReaderServe _),
    "x97_ann_reader_serve"   -> (graft.streaming.MaintainedAnnIndex.x97AnnReaderServe _),
    "x98_dedup_reader_classify" -> (graft.streaming.Pipelines.x98DedupReaderClassify _),
    "x99_neardup_reader_screen" -> (graft.streaming.Pipelines.x99NearDupReaderScreen _),
    "x100_assembled_curation" -> (graft.streaming.CurationService.x100AssembledCuration _),
    "x101_text_tombstone_serve" -> (graft.streaming.MaintainedTextIndex.x101TextTombstoneServe _),
    "x102_assembled_retrieval" -> (graft.streaming.RetrievalService.x102AssembledRetrieval _),
    "x103_assembled_dense_serve" -> (graft.streaming.RetrievalService.x103AssembledDenseServe _),
    "x104_curated_text_serve" -> (graft.streaming.MaintainedTextIndex.x104CuratedTextServe _),
    "d33_stats_moments"     -> (Relational.d33StatsMoments _),
    "x36_least_squares"     -> (graft.functions.Stats.x36LeastSquares _),
    "x34_semantic_dedup"    -> (Dedup.x34SemanticDedup _),
    "x35_bloom_decontaminate" -> (graft.functions.Bloom.x35BloomDecontaminate _),
    "x37_bpe_merges"        -> (graft.functions.Bpe.x37BpeMerges _),
    "x37b_bpe_merges_scaled" -> (graft.functions.Bpe.x37bBpeMergesScaled _),
    "x55b_bpe_tokenize_full" -> (graft.functions.Bpe.x55bBpeTokenizeFull _),
    "x38_cms_heavy_hitters" -> (graft.functions.Cms.x38CmsHeavyHitters _),
    "d34_approx_percentiles" -> (Relational.d34ApproxPercentiles _),
    "x39_curation_pipeline" -> (graft.functions.Curation.x39CurationPipeline _),
    "d35_lateral_topn"      -> (Relational.d35LateralTopN _),
    "x40_mixture_resample"  -> ((s: SparkSession, d: String) => Sampling.x40MixtureResample(s, d)),
    "d36_outliers"          -> ((s: SparkSession, d: String) => Relational.d36Outliers(s, d)),
    "x41_hybrid_rrf"        -> (graft.functions.Search.x41HybridRrf _),
    "x42_cdc_chunks"        -> (Text.x42CdcChunks _),
    "x43_chunk_dedup_stats" -> (Text.x43ChunkDedupStats _),
    "x44_chunk_neardups"    -> (Text.x44ChunkNearDups _),
    "d37_gap_fill"          -> (Relational.d37GapFill _),
    "d38_winsorize"         -> (Relational.d38Winsorize _),
    "d39_funnel"            -> ((s: SparkSession, d: String) => Relational.d39Funnel(s, d)),
    "d40_ntile"             -> (Relational.d40Ntile _),
    "d42_retention_cohorts" -> ((s: SparkSession, d: String) => Relational.d42RetentionCohorts(s, d)),
    "d41_forward_asof"      -> (Relational.d41ForwardAsof _),
    "x50_quality_tiers"     -> (Text.x50QualityTiers _),
    "x51_dup_pagerank"      -> (graft.functions.GraphOps.x51DupPagerank _),
    "x52_cluster_split"     -> (Dedup.x52ClusterSplit _),
    "x54_span_removal"      -> ((s: SparkSession, d: String) => Corpus.x54SpanRemoval(s, d)),
    "x55_bpe_tokenize"      -> (graft.functions.Bpe.x55BpeTokenize _),
    "x56_context_windows"   -> ((s: SparkSession, d: String) => Sampling.x56ContextWindows(s, d)),
    "x57_priority_dedup"    -> ((s: SparkSession, d: String) => Dedup.x57PriorityDedup(s, d)),
    "x58_corpus_shuffle"    -> ((s: SparkSession, d: String) => Sampling.x58CorpusShuffle(s, d)),
    "x59_incremental_dedup" -> ((s: SparkSession, d: String) => Dedup.x59IncrementalDedup(s, d)),
    "x60_length_outliers"   -> ((s: SparkSession, d: String) => Sampling.x60LengthOutliers(s, d)),
    "x61_zipf_fit"          -> ((s: SparkSession, d: String) => graft.functions.Stats.x61ZipfFit(s, d)),
    "x62_incremental_neardup" -> ((s: SparkSession, d: String) => Dedup.x62IncrementalNearDup(s, d)),
    "x63_lm_perplexity"     -> ((s: SparkSession, d: String) => Corpus.x63LmPerplexity(s, d)),
    "x64_source_report"     -> ((s: SparkSession, d: String) => graft.functions.Curation.x64SourceReport(s, d)),
    "x65_label_centroids"   -> ((s: SparkSession, d: String) => graft.functions.Knn.x65LabelCentroids(s, d)),
    "x66_length_histogram"  -> ((s: SparkSession, d: String) => Sampling.x66LengthHistogram(s, d)),
    "x67_pmi_collocations"  -> ((s: SparkSession, d: String) => Corpus.x67PmiCollocations(s, d)),
    "x68_self_repetition"   -> ((s: SparkSession, d: String) => Corpus.x68SelfRepetition(s, d)),
    "x69_containment_screen" -> ((s: SparkSession, d: String) => Dedup.x69ContainmentScreen(s, d)),
    "x70_distinctive_terms" -> ((s: SparkSession, d: String) => Text.x70DistinctiveTerms(s, d)),
    "x71_pretrain_pipeline" -> ((s: SparkSession, d: String) => graft.functions.Curation.x71PretrainPipeline(s, d)),
    "x72_score_calibration" -> ((s: SparkSession, d: String) => graft.functions.Curation.x72ScoreCalibration(s, d)),
    "x73_hashed_features"   -> ((s: SparkSession, d: String) => graft.functions.Search.x73HashedFeatures(s, d)),
    "x74_negative_samples"  -> ((s: SparkSession, d: String) => Sampling.x74NegativeSamples(s, d)),
    "x75_reshard_plan"      -> ((s: SparkSession, d: String) => Sampling.x75ReshardPlan(s, d)),
    "x76_minhash_calibration" -> ((s: SparkSession, d: String) => Dedup.x76MinhashCalibration(s, d)),
    "x77_dsir_select"       -> ((s: SparkSession, d: String) => Sampling.x77DsirSelect(s, d)),
    "x77b_dsir_select_fast" -> (Sampling.x77bDsirSelectFast _),
    "x78_gopher_rules"      -> ((s: SparkSession, d: String) =>
      graft.functions.Text.x78GopherRules(s, d, stops = Seq("the", "a"))),
    "x53_source_overlap"    -> (Dedup.x53SourceOverlap _),
    "x45_knn_label"         -> (graft.functions.Knn.x45KnnLabel _),
    "x46_token_budget_mix"  -> ((s: SparkSession, d: String) => Sampling.x46TokenBudgetMix(s, d)),
    "x47_tfidf_topk"        -> ((s: SparkSession, d: String) => graft.functions.Search.x47TfidfTopK(s, d)),
    "x48_split_leakage"     -> (Sampling.x48SplitLeakage _),
    "x49_ngram_novelty"     -> (Corpus.x49NgramNovelty _),
  )

  /** The LSH hyperplanes are deterministic (Random(42)), so their constants
    * can be inlined into oracle SQL — bucket = sum of sign bits of the
    * projections, exactly mirroring
    * [[graft.functions.Similarity.lshBucket]]'s double-precision
    * sequential dot product. Shared by the x09/x10 oracles. */
  private def lshBucketSqlExprSeed(vecCol: String, seed: Long): String =
    graft.functions.Similarity.hyperplanes(nPlanes = 4, dim = 64, seed)
      .zipWithIndex.map { case (p, i) =>
        val lst = p.mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product($vecCol, $lst) > 0 THEN ${1 << i} ELSE 0 END)"
      }.mkString(" + ")

  private def lshBucketSqlExpr(vecCol: String): String =
    lshBucketSqlExprSeed(vecCol, 42L)

  /** x09b multi-table oracle: per-table bucket expressions (seeds 42..45)
    * inlined; candidate = same bucket in ANY table; exact re-score + top-3.
    * DISTINCT collapses multi-table duplicates exactly as the Spark side's
    * per-pair group does. */
  private def x09bOracleSql: String = {
    val bs = (0 until graft.functions.Similarity.LshTables)
      .map(t => lshBucketSqlExprSeed("de", 42L + t))
    val gCols = bs.zipWithIndex.map { case (b, i) => s"$b AS b$i" }.mkString(", ")
    val anyMatch = bs.indices.map(i => s"c.b$i = q.b$i").mkString(" OR ")
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings), " +
      s"g AS (SELECT vec_id, de, $gCols FROM e), " +
      "q AS (SELECT vec_id AS query_id, de AS qe, " +
      bs.indices.map(i => s"b$i").mkString(", ") + " FROM g WHERE vec_id < 20), " +
      s"s AS (SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id, " +
      "round(list_dot_product(c.de, q.qe) / (sqrt(list_dot_product(c.de, c.de)) * sqrt(list_dot_product(q.qe, q.qe))), 4) AS score " +
      s"FROM g c JOIN q ON c.vec_id != q.query_id AND ($anyMatch)), " +
      "r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rk FROM s) " +
      "SELECT query_id, neighbor_id, score, CAST(rk AS INTEGER) AS rk FROM r WHERE rk <= 3 ORDER BY query_id, rk"
  }

  private def x10OracleSql: String =
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings), " +
      s"g AS (SELECT vec_id, de, ${lshBucketSqlExpr("de")} AS bucket FROM e) " +
      "SELECT v1, v2, score FROM (SELECT a.vec_id AS v1, b.vec_id AS v2, " +
      "round(list_dot_product(a.de, b.de) / (sqrt(list_dot_product(a.de, a.de)) * sqrt(list_dot_product(b.de, b.de))), 4) AS score " +
      "FROM g a JOIN g b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) t " +
      s"WHERE score >= ${graft.functions.Dedup.EmbeddingNearDupThreshold} ORDER BY v1, v2"

  /** x51 oracle: the x10 pair CTEs + [[graft.functions.GraphOps.PrIters]]
    * unrolled PageRank rounds. Every constant appears as the same IEEE
    * double OPERATION the Spark side executes — ((1.0e0 - 8.5e-1) / n),
    * not a folded 0.15 decimal literal, because 1−0.85 is
    * 0.15000000000000002 in binary64. */
  private def x51OracleSql: String = {
    val pairCtes =
      "e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings), " +
        s"g AS (SELECT vec_id, de, ${lshBucketSqlExpr("de")} AS bucket FROM e0), " +
        "pr AS (SELECT v1, v2 FROM (SELECT a.vec_id AS v1, b.vec_id AS v2, " +
        "round(list_dot_product(a.de, b.de) / (sqrt(list_dot_product(a.de, a.de)) * sqrt(list_dot_product(b.de, b.de))), 4) AS score " +
        "FROM g a JOIN g b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) t " +
        s"WHERE score >= ${graft.functions.Dedup.EmbeddingNearDupThreshold}), " +
        "e AS (SELECT v1 AS src, v2 AS dst FROM pr UNION SELECT v2, v1 FROM pr), " +
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src), " +
        "nodes AS (SELECT DISTINCT src AS node FROM e), " +
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes), " +
        "r0 AS (SELECT node, 1.0e0 / nn.n AS pr_rank FROM nodes CROSS JOIN nn)"
    def prRound(i: Int): String =
      s"r$i AS (SELECT nodes.node, ((1.0e0 - 8.5e-1) / nn.n) + 8.5e-1 * coalesce(s.inflow, 0.0e0) AS pr_rank " +
        s"FROM nodes CROSS JOIN nn LEFT JOIN (SELECT e.dst AS node, sum(r${i - 1}.pr_rank / deg.deg) AS inflow " +
        s"FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node JOIN deg ON e.src = deg.src GROUP BY e.dst) s ON nodes.node = s.node)"
    val iters = graft.functions.GraphOps.PrIters
    s"WITH $pairCtes, ${(1 to iters).map(prRound).mkString(", ")} " +
      s"SELECT node AS vec_id, round(pr_rank, 4) AS rank FROM r$iters ORDER BY vec_id"
  }

  /** x09 LSH ANN oracle: same inlined buckets; within-bucket exact scoring
    * + top-3 per query via row_number — DuckDB reproduces the approximate
    * result exactly because the bucketing is deterministic. */
  private def x09OracleSql: String =
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings), " +
      s"g AS (SELECT vec_id, de, ${lshBucketSqlExpr("de")} AS bucket FROM e), " +
      "q AS (SELECT vec_id AS query_id, de AS q_emb, bucket FROM g WHERE vec_id < 20), " +
      "s AS (SELECT q.query_id, c.vec_id AS neighbor_id, " +
      "round(list_dot_product(c.de, q.q_emb) / (sqrt(list_dot_product(c.de, c.de)) * sqrt(list_dot_product(q.q_emb, q.q_emb))), 4) AS score " +
      "FROM g c JOIN q ON c.bucket = q.bucket AND c.vec_id != q.query_id), " +
      "r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rk FROM s) " +
      "SELECT query_id, neighbor_id, score, CAST(rk AS INTEGER) AS rk FROM r WHERE rk <= 3 ORDER BY query_id, rk"

  /** The x16 verified-near-dup pipeline as a DuckDB CTE chain ending in
    * `vp(d1, d2, jaccard)` — shared by the x16 oracle and the x26
    * connected-components oracle, which recurses over the same pair set.
    * Parameterized by the source relation (`documents` for the corpus
    * forms; the exact-dedup survivor CTE for x71's post-dedup layer). */
  private def verifiedPairsCteFrom(rel: String): String =
    s"d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM $rel), " +
      "g AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])) ELSE CAST([] AS VARCHAR[]) END) AS tg FROM d), " +
      "g2 AS (SELECT doc_id, list_transform(tg, sh -> md5(sh)) AS tgh FROM g WHERE len(tg) > 0), " +
      "b AS (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS band), " +
      "sig AS (SELECT doc_id, band, list_min(list_transform(tgh, h -> substr(h, band * 4 + 1, 4))) AS min_hash FROM g2 CROSS JOIN b), " +
      "ok AS (SELECT band, min_hash FROM sig GROUP BY band, min_hash HAVING count(*) BETWEEN 2 AND 256), " +
      "p AS (SELECT DISTINCT a.doc_id AS d1, b2.doc_id AS d2 FROM sig a JOIN sig b2 ON a.band = b2.band AND a.min_hash = b2.min_hash AND a.doc_id < b2.doc_id JOIN ok ON a.band = ok.band AND a.min_hash = ok.min_hash), " +
      "vp AS (SELECT * FROM (SELECT p.d1, p.d2, CASE WHEN len(list_distinct(list_concat(ga.tg, gb.tg))) = 0 THEN 0.0 ELSE round(len(list_filter(ga.tg, x -> list_contains(gb.tg, x))) / len(list_distinct(list_concat(ga.tg, gb.tg))), 4) END AS jaccard FROM p JOIN g ga ON ga.doc_id = p.d1 JOIN g gb ON gb.doc_id = p.d2) t WHERE jaccard >= 0.5)"

  private val verifiedPairsCte: String = verifiedPairsCteFrom("documents")

  /** x26 oracle: connected components over the x16 verified pair set via a
    * recursive transitive-closure CTE (reach(node, r) = r is in node's
    * component; UNION dedup terminates on cycles). min(r) per node is the
    * component minimum — exactly the min-label fixpoint the Spark side
    * converges to. */
  private def x26OracleSql: String =
    s"WITH RECURSIVE $verifiedPairsCte, " +
      "e AS (SELECT d1 AS src, d2 AS dst FROM vp UNION SELECT d2, d1 FROM vp), " +
      "reach AS (SELECT src AS node, src AS r FROM e UNION SELECT e.dst, reach.r FROM reach JOIN e ON e.src = reach.node) " +
      "SELECT node AS doc_id, min(r) AS cluster_id, min(r) = node AS is_canonical FROM reach GROUP BY node ORDER BY doc_id"

  /** x52 oracle: the x26 recursive-CTE components + the x19 bucket rule
    * keyed on coalesce(cluster_id, doc_id). */
  private def x52OracleSql: String =
    s"WITH RECURSIVE $verifiedPairsCte, " +
      "e AS (SELECT d1 AS src, d2 AS dst FROM vp UNION SELECT d2, d1 FROM vp), " +
      "reach AS (SELECT src AS node, src AS r FROM e UNION SELECT e.dst, reach.r FROM reach JOIN e ON e.src = reach.node), " +
      "cc AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node), " +
      "k AS (SELECT dd.doc_id, coalesce(cc.cluster_id, dd.doc_id) AS split_key FROM documents dd LEFT JOIN cc ON dd.doc_id = cc.doc_id), " +
      "bk AS (SELECT doc_id, split_key, CAST(list_reduce(list_prepend(0, list_transform(range(1, 5), i -> strpos('0123456789abcdef', substr(md5(CAST(split_key AS VARCHAR)), i, 1)) - 1)), (a, b) -> a * 16 + b) % 100 AS INTEGER) AS bucket FROM k) " +
      "SELECT doc_id, split_key, bucket, CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'validation' ELSE 'test' END AS split FROM bk ORDER BY doc_id"

  /** x71 oracle: the quality gate and the exact-dedup (fp) window FIRST,
    * then x52's recursive-CC components computed over the SURVIVOR
    * relation k1 (mirroring the Spark side's post-dedup near-dup layer),
    * then the cluster-key window + the x19 bucket rule. */
  private def x71KeptCtes: String =
    "f AS (SELECT doc_id, source, text, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp, CAST(coalesce(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0)), 0) AS BIGINT) AS n_tokens FROM documents), " +
      "gated AS (SELECT * FROM f WHERE n_tokens >= 30), " +
      "k1 AS (SELECT * FROM (SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep_id FROM gated) t WHERE doc_id = keep_id), " +
      s"${verifiedPairsCteFrom("k1")}, " +
      "e AS (SELECT d1 AS src, d2 AS dst FROM vp UNION SELECT d2, d1 FROM vp), " +
      "reach AS (SELECT src AS node, src AS r FROM e UNION SELECT e.dst, reach.r FROM reach JOIN e ON e.src = reach.node), " +
      "cc AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node), " +
      "k2 AS (SELECT k1.doc_id, k1.source, k1.n_tokens, coalesce(cc.cluster_id, k1.doc_id) AS cluster_key FROM k1 LEFT JOIN cc ON k1.doc_id = cc.doc_id), " +
      "k3 AS (SELECT * FROM (SELECT *, min(doc_id) OVER (PARTITION BY cluster_key) AS cmin FROM k2) t3 WHERE doc_id = cmin), " +
      "bk AS (SELECT doc_id, source, n_tokens, cluster_key, CAST(list_reduce(list_prepend(0, list_transform(range(1, 5), i -> strpos('0123456789abcdef', substr(md5(CAST(cluster_key AS VARCHAR)), i, 1)) - 1)), (a, b) -> a * 16 + b) % 100 AS INTEGER) AS bucket FROM k3) "

  private def x71OracleSql: String =
    s"WITH RECURSIVE $x71KeptCtes" +
      "SELECT doc_id, source, n_tokens, cluster_key, bucket, CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'validation' ELSE 'test' END AS split FROM bk ORDER BY doc_id"

  /** x100 oracle: x71's kept-CTE chain (shared verbatim above) plus the
    * ASSEMBLED run's takedown epilogue — every kept doc below the id
    * midpoint was taken down through the control topic and re-admitted
    * as its exact CLONE at doc_id + CloneOffset, so those rows surface
    * under the clone id with cluster_key/bucket/split recomputed on it
    * (each clone is its own singleton canonical; n_tokens/source are the
    * original's — identical text). A dropped/misrouted takedown leaves
    * the ORIGINAL id in the final corpus and breaks the hash. */
  private def x100OracleSql: String =
    s"WITH RECURSIVE $x71KeptCtes, " +
      "mid AS (SELECT min(doc_id) + (max(doc_id) - min(doc_id) + 1) // 2 AS m FROM documents), " +
      s"mapped AS (SELECT CASE WHEN bk.doc_id < mid.m THEN bk.doc_id + ${graft.streaming.CurationService.CloneOffset} ELSE bk.doc_id END AS doc_id, source, n_tokens FROM bk, mid), " +
      "m2 AS (SELECT doc_id, source, n_tokens, doc_id AS cluster_key, CAST(list_reduce(list_prepend(0, list_transform(range(1, 5), i -> strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)), (a, b) -> a * 16 + b) % 100 AS INTEGER) AS bucket FROM mapped) " +
      "SELECT doc_id, source, n_tokens, cluster_key, bucket, CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'validation' ELSE 'test' END AS split FROM m2 ORDER BY doc_id"

  /** x74 oracle: md5 bucket arithmetic + rn≤2 bucket representatives +
    * the x16 vp CTE as the near-dup exclusion. */
  private def x74OracleSql: String =
    s"WITH $verifiedPairsCte, " +
      "ids AS (SELECT doc_id FROM documents), " +
      "bb AS (SELECT doc_id, CAST(list_reduce(list_prepend(0, list_transform(range(1, 5), i -> strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)), (a, x) -> a * 16 + x) % 64 AS INTEGER) AS bucket FROM ids), " +
      "r2 AS (SELECT bucket, doc_id, row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn FROM bb), " +
      "reps AS (SELECT bucket, min(doc_id) AS min1, max(doc_id) AS min2 FROM r2 WHERE rn <= 2 GROUP BY bucket), " +
      "c0 AS (SELECT doc_id, CAST(j AS INTEGER) AS j FROM ids, unnest(range(1, 4)) AS t(j)), " +
      "c1 AS (SELECT doc_id, j, CAST(list_reduce(list_prepend(0, list_transform(range(1, 5), i -> strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)), i, 1)) - 1)), (a, x) -> a * 16 + x) % 64 AS INTEGER) AS bucket FROM c0), " +
      "cand AS (SELECT c1.doc_id, c1.j, CASE WHEN reps.min1 <> c1.doc_id THEN reps.min1 WHEN reps.min2 <> c1.doc_id THEN reps.min2 END AS neg_id FROM c1 JOIN reps ON c1.bucket = reps.bucket) " +
      "SELECT doc_id, j, neg_id FROM cand WHERE neg_id IS NOT NULL AND NOT EXISTS " +
      "(SELECT 1 FROM vp WHERE (vp.d1 = cand.doc_id AND vp.d2 = cand.neg_id) OR (vp.d2 = cand.doc_id AND vp.d1 = cand.neg_id)) ORDER BY doc_id, j"

  /** x75 oracle: the ring-node points are driver-computed md5 literals (the
    * SAME values the Spark side folds into its when-chain), so both engines
    * evaluate identical integer CASE chains. */
  private def x75OracleSql: String = {
    def chain(nodes: Seq[(Int, Int)]): String =
      nodes.map { case (pt, sh) => s"WHEN p <= $pt THEN $sh" }
        .mkString("CASE ", " ", s" ELSE ${nodes.head._2} END")
    val c8 = chain(graft.functions.Sampling.ringNodes(8))
    val c10 = chain(graft.functions.Sampling.ringNodes(10))
    "WITH d AS (SELECT CAST(list_reduce(list_prepend(0, list_transform(range(1, 5), i -> strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)), (a, b) -> a * 16 + b) AS INTEGER) AS p FROM documents), " +
      s"m AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(CASE WHEN p % 8 <> p % 10 THEN 1 ELSE 0 END) AS BIGINT) AS mod_moved, CAST(sum(CASE WHEN ($c8) <> ($c10) THEN 1 ELSE 0 END) AS BIGINT) AS ring_moved FROM d), " +
      "u AS (SELECT 'mod' AS method, n_docs, mod_moved AS n_moved FROM m UNION ALL SELECT 'ring', n_docs, ring_moved FROM m) " +
      "SELECT method, n_docs, n_moved, round(CAST(n_moved AS DOUBLE) / CAST(n_docs AS DOUBLE), 4) AS moved_frac FROM u WHERE n_docs > 0 ORDER BY method"
  }

  /** x53 oracle: the x05 md5-slice minhash CTEs aggregated to source
    * granularity (min-of-mins over the source's shingle union), then the
    * band-agreement pair matrix. */
  /** The [[graft.functions.Bpe]] training loop UNROLLED as DuckDB CTEs —
    * a FULL oracle for the iterative argmax (not just a literal replay):
    * round i recomputes the weighted adjacent-pair counts over the
    * current symbol relation `s{i-1}`, picks the argmax with Spark's exact
    * tie-break (count desc, then (left, right) in binary/UTF-8 collation —
    * DuckDB's default collation, matching UTF8String order on the
    * ASCII-only corpus), and applies the merge as a left-to-right
    * non-overlapping fold. The fold wraps each symbol in a 1-element list
    * so `list_reduce`'s accumulator and element types agree — exactly
    * [[graft.functions.Bpe.mergePair]]'s aggregate() semantics. */
  private def bpeTrainCtes(steps: Int, materialized: Boolean = false,
                           textExpr: String = "lower(text)"): String = {
    // s$i LEFT JOINs the (0- or 1-row) argmax CTE: when a corpus exhausts
    // its mergeable pairs before `steps` rounds, p$i is EMPTY and a cross
    // join would empty the symbol relation for good (every doc would
    // count 0 symbols, diverging from Spark's early-stop); the left join
    // carries the symbols through merge-exhausted rounds unchanged.
    // `materialized` pins every round CTE with AS MATERIALIZED: each s$i is
    // referenced twice (c${i+1} and s${i+1}), so DuckDB's default inlining
    // re-evaluates the whole prefix per reference — exponential in the
    // round count (fine at 8 rounds, hangs at 64); materialization makes
    // the unrolled chain linear, which is what lets the SCALED oracle
    // carry the training all the way to pair exhaustion.
    val M = if (materialized) "MATERIALIZED " else ""
    val rounds = (1 to steps).map { i =>
      s"c$i AS (SELECT cnt, unnest(list_transform(range(1, len(sym)), j -> [sym[j], sym[j+1]])) AS p FROM s${i - 1} WHERE len(sym) >= 2), " +
        s"p$i AS $M(SELECT p[1] AS l, p[2] AS r, CAST(sum(cnt) AS BIGINT) AS pc FROM c$i GROUP BY l, r ORDER BY pc DESC, l, r LIMIT 1), " +
        s"s$i AS $M(SELECT w, cnt, CASE WHEN m.l IS NULL OR len(sym) < 2 THEN sym ELSE list_reduce(list_transform(sym, x -> [x]), (acc, x) -> CASE WHEN acc[-1] = m.l AND x[1] = m.r THEN list_append(acc[1:len(acc)-1], m.l || m.r) ELSE list_concat(acc, x) END) END AS sym FROM s${i - 1} LEFT JOIN p$i m ON TRUE)"
    }.mkString(", ")
    s"tok AS (SELECT unnest(list_filter(string_split_regex($textExpr, '\\s+'), t -> length(t) > 0)) AS w FROM documents), " +
      "wc AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY w), " +
      "s0 AS (SELECT w, cnt, list_transform(range(1, length(w)+1), i -> w[i]) AS sym FROM wc), " +
      rounds
  }

  /** x37 oracle: the unrolled training rounds; each output row is round
    * i's argmax pair and its recomputed weighted count. */
  private def x37OracleSql: String = {
    val steps = graft.functions.Bpe.MergeSteps
    val union = (1 to steps).map(i =>
      s"""SELECT CAST(${i - 1} AS INTEGER) AS step, l AS "left", r AS "right", l || r AS merged, pc AS pair_count FROM p$i""")
      .mkString(" UNION ALL ")
    s"WITH ${bpeTrainCtes(steps)} SELECT * FROM ($union) ORDER BY step"
  }

  /** x55 oracle: the same unrolled training CTEs carried to their final
    * symbol relation `s{steps}` (per distinct word), then the per-doc
    * token join + symbol-count aggregate the Spark side runs. */
  private def x55OracleSql: String = {
    val steps = graft.functions.Bpe.MergeSteps
    s"WITH ${bpeTrainCtes(steps)}, " +
      "dt AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
      "pd AS (SELECT doc_id, unnest(toks) AS w FROM dt), " +
      s"j AS (SELECT pd.doc_id, CAST(count(*) AS BIGINT) AS n_tokens, CAST(sum(len(s$steps.sym)) AS BIGINT) AS n_symbols FROM pd JOIN s$steps ON pd.w = s$steps.w GROUP BY pd.doc_id) " +
      "SELECT d.doc_id, coalesce(j.n_tokens, CAST(0 AS BIGINT)) AS n_tokens, coalesce(j.n_symbols, CAST(0 AS BIGINT)) AS n_symbols, " +
      "round(CASE WHEN coalesce(j.n_tokens, 0) > 0 THEN CAST(j.n_symbols AS DOUBLE) / j.n_tokens ELSE 0.0e0 END, 4) AS sym_per_token " +
      "FROM documents d LEFT JOIN j ON d.doc_id = j.doc_id ORDER BY d.doc_id"
  }

  /** u09 oracle: the x55 train→tokenize chain with BOTH the training
    * corpus and the tokenized corpus under the multibyte projection
    * (`translate(lower(text), 'aet', 'äé数')` — the u-series surface).
    * DuckDB's `w[i]`/`length(w)` count CHARACTERS and its default string
    * order is binary over UTF-8 bytes, so the oracle pins the trainer's
    * code-point symbol split AND the UTF-8-byte (left, right) tie-break
    * exactly where char/UTF-16 arithmetic would diverge. */
  private def u09OracleSql: String = {
    val steps = graft.functions.Bpe.MergeSteps
    val tx = "translate(lower(text), 'aet', 'äé数')"
    s"WITH ${bpeTrainCtes(steps, textExpr = tx)}, " +
      s"dt AS (SELECT doc_id, list_filter(string_split_regex($tx, '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
      "pd AS (SELECT doc_id, unnest(toks) AS w FROM dt), " +
      s"j AS (SELECT pd.doc_id, CAST(count(*) AS BIGINT) AS n_tokens, CAST(sum(len(s$steps.sym)) AS BIGINT) AS n_symbols FROM pd JOIN s$steps ON pd.w = s$steps.w GROUP BY pd.doc_id) " +
      "SELECT d.doc_id, coalesce(j.n_tokens, CAST(0 AS BIGINT)) AS n_tokens, coalesce(j.n_symbols, CAST(0 AS BIGINT)) AS n_symbols, " +
      "round(CASE WHEN coalesce(j.n_tokens, 0) > 0 THEN CAST(j.n_symbols AS DOUBLE) / j.n_tokens ELSE 0.0e0 END, 4) AS sym_per_token " +
      "FROM documents d LEFT JOIN j ON d.doc_id = j.doc_id ORDER BY d.doc_id"
  }

  /** Unrolled-round budget for the SCALED BPE oracles, shared with the
    * Spark side ([[graft.functions.Bpe.OracleBpeRounds]]): the declared
    * queries clamp their result/vocabulary to this many merges, so oracle
    * and engine agree BY CONSTRUCTION regardless of where a regenerated
    * corpus exhausts (the current corpus exhausts at 89 merges, under
    * the budget, so the clamp is a no-op and the declared table is the
    * complete one). The budget itself is a DuckDB cost ceiling — the
    * MATERIALIZED chain is superlinear in rounds (~5 s at 96, ~225 s at
    * 256). */
  private val ScaledBpeRounds = graft.functions.Bpe.OracleBpeRounds

  /** x37b oracle: the full unrolled training chain, MATERIALIZED, carried
    * past pair exhaustion — a complete-merge-table oracle, not a prefix. */
  private def x37bOracleSql: String = {
    val union = (1 to ScaledBpeRounds).map(i =>
      s"""SELECT CAST(${i - 1} AS INTEGER) AS step, l AS "left", r AS "right", l || r AS merged, pc AS pair_count FROM p$i""")
      .mkString(" UNION ALL ")
    s"WITH ${bpeTrainCtes(ScaledBpeRounds, materialized = true)} SELECT * FROM ($union) ORDER BY step"
  }

  /** x55b oracle: the exhaustion-trained symbol relation (s{N} of the
    * materialized chain), then the same per-doc token join + symbol-count
    * aggregate as x55 — the oracle for the native merge-apply expression
    * under the FULL vocabulary. */
  private def x55bOracleSql: String = {
    val n = ScaledBpeRounds
    s"WITH ${bpeTrainCtes(n, materialized = true)}, " +
      "dt AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
      "pd AS (SELECT doc_id, unnest(toks) AS w FROM dt), " +
      s"j AS (SELECT pd.doc_id, CAST(count(*) AS BIGINT) AS n_tokens, CAST(sum(len(s$n.sym)) AS BIGINT) AS n_symbols FROM pd JOIN s$n ON pd.w = s$n.w GROUP BY pd.doc_id) " +
      "SELECT d.doc_id, coalesce(j.n_tokens, CAST(0 AS BIGINT)) AS n_tokens, coalesce(j.n_symbols, CAST(0 AS BIGINT)) AS n_symbols, " +
      "round(CASE WHEN coalesce(j.n_tokens, 0) > 0 THEN CAST(j.n_symbols AS DOUBLE) / j.n_tokens ELSE 0.0e0 END, 4) AS sym_per_token " +
      "FROM documents d LEFT JOIN j ON d.doc_id = j.doc_id ORDER BY d.doc_id"
  }

  /** Shared CTE chain for the xxhash64 minhash oracles: per-doc distinct
    * shingles, every DISTINCT shingle hashed by the generated XXH64 SQL
    * ([[XxhashSql]]), then Spark's two-level chain (`xxhash64(sh)` then
    * `xxhash64(h, band)` = hashInt(band, hashLong(h, 42))) and the
    * per-(doc, band) signed min. */
  private def xxhSigCtes(utf8: Boolean = false): String = {
    val textExpr =
      if (utf8) "translate(lower(text), 'aet', 'äé数')" else "lower(text)"
    s"d AS (SELECT doc_id, list_filter(string_split_regex($textExpr, '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
      "g AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])) ELSE CAST([] AS VARCHAR[]) END) AS tg FROM d), " +
      "e AS (SELECT doc_id, unnest(tg) AS s FROM g WHERE len(tg) > 0), " +
      "strs(s) AS (SELECT DISTINCT s FROM e), " +
      XxhashSql.xxh64StrCtes("strs", utf8Bytes = utf8) + ", " +
      XxhashSql.hashLong42Ctes + ", " +
      XxhashSql.hashIntBandCtes + ", " +
      s"sigu AS (SELECT e.doc_id, x.band, min(${XxhashSql.signed("x.hu3")}) AS min_hash FROM e JOIN xh3 x ON e.s = x.s GROUP BY e.doc_id, x.band)"
  }

  /** x05b oracle: DuckDB recomputes the xxhash64 signatures bit-for-bit. */
  private def x05bOracleSql: String =
    s"WITH RECURSIVE ${xxhSigCtes()} SELECT doc_id, band, min_hash FROM sigu ORDER BY doc_id, band"

  /** u03 oracle: the x05b signature chain over the multibyte projection,
    * with XXH64 reading the hex-materialized UTF-8 bytes. */
  private def u03OracleSql: String =
    s"WITH RECURSIVE ${xxhSigCtes(utf8 = true)} SELECT doc_id, band, min_hash FROM sigu ORDER BY doc_id, band"

  /** x06b oracle: x06's bucket-pair CTE over the recomputed signatures. */
  private def x06bOracleSql: String =
    s"WITH RECURSIVE ${xxhSigCtes()}, " +
      "ok AS (SELECT band, min_hash FROM sigu GROUP BY band, min_hash HAVING count(*) BETWEEN 2 AND 256) " +
      "SELECT DISTINCT a.doc_id AS d1, b2.doc_id AS d2 FROM sigu a JOIN sigu b2 ON a.band = b2.band AND a.min_hash = b2.min_hash AND a.doc_id < b2.doc_id JOIN ok ON a.band = ok.band AND a.min_hash = ok.min_hash ORDER BY d1, d2"

  /** x07 oracle: per-token XXH64 (the generated SQL), 64 bit votes, sign
    * fold — the xxhash64 twin of the x07c md5 oracle, with the same
    * bit-63 BIGINT handling. */
  private def x07OracleSql: String =
    "WITH RECURSIVE strs(s) AS (SELECT DISTINCT unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0)) FROM documents), " +
      XxhashSql.xxh64StrCtes("strs") + ", " +
      "tok AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0)) AS s FROM documents), " +
      "th AS (SELECT tok.doc_id, xh.hu FROM tok JOIN xh ON tok.s = xh.s), " +
      "bits AS (SELECT doc_id, hu, CAST(unnest(range(0, 64)) AS INTEGER) AS bit FROM th), " +
      "v AS (SELECT doc_id, bit, sum(CASE WHEN ((hu >> bit) & 1::UBIGINT) = 1::UBIGINT THEN 1 ELSE -1 END) AS votes FROM bits GROUP BY doc_id, bit) " +
      "SELECT doc_id, CAST(sum(CASE WHEN votes > 0 THEN (CASE WHEN bit = 63 THEN -9223372036854775807 - 1 ELSE (CAST(1 AS BIGINT) << bit) END) ELSE 0 END) AS BIGINT) AS simhash FROM v GROUP BY doc_id ORDER BY doc_id"

  private def x53OracleSql: String =
    "WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
      "g AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])) ELSE CAST([] AS VARCHAR[]) END) AS tg FROM d), " +
      "g2 AS (SELECT doc_id, list_transform(tg, sh -> md5(sh)) AS tgh FROM g WHERE len(tg) > 0), " +
      "b AS (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS band), " +
      "ds AS (SELECT g2.doc_id, sr.source, band, list_min(list_transform(tgh, h -> substr(h, band * 4 + 1, 4))) AS mh FROM g2 JOIN (SELECT doc_id, source FROM documents) sr ON g2.doc_id = sr.doc_id CROSS JOIN b), " +
      "ss AS (SELECT source, band, min(mh) AS min_hash FROM ds GROUP BY source, band), " +
      "p AS (SELECT a.source AS s1, b2.source AS s2, CAST(sum(CASE WHEN a.min_hash = b2.min_hash THEN 1 ELSE 0 END) AS BIGINT) AS n_band_matches FROM ss a JOIN ss b2 ON a.band = b2.band AND a.source < b2.source GROUP BY a.source, b2.source) " +
      "SELECT s1, s2, n_band_matches, round(CAST(n_band_matches AS DOUBLE) / 8, 4) AS est_jaccard FROM p ORDER BY s1, s2"

  /** x32 BM25 oracle. Every numeric constant is written in e-notation
    * (0.5e0, 2.2e0, …) so DuckDB types it DOUBLE rather than DECIMAL — the
    * score must be evaluated in IEEE double with the same association order
    * as the Spark column expression to hash-match. */
  private def x32OracleSql: String =
    bm25OracleSql("text", graft.functions.Search.QueryTerms)

  /** u10: the same scorer over the utf8 projection with the projected
    * terms (2-/3-byte code points in the term literals). */
  private def u10OracleSql: String =
    bm25OracleSql("translate(lower(text), 'aet', 'äé数')",
      graft.functions.Text.U10Terms)

  /** x84: the x32 scorer over the corpus MINUS the deleted slice — what
    * the maintained text index must serve after deleteDocs + a major
    * compaction (exact stats, tombstones GC'd). */
  private def x84OracleSql: String =
    bm25OracleSql("text", graft.functions.Search.QueryTerms,
      docsWhere = " WHERE doc_id % 8 <> 1")

  /** x104: the x32 scorer reading FROM x71's kept-CTE chain — the
    * curate-then-index handoff recomputed end to end (kept canonicals
    * re-joined to their text, then the identical BM25 arithmetic). */
  private def x104OracleSql: String =
    s"WITH RECURSIVE $x71KeptCtes, " +
      "keptdocs AS (SELECT d.doc_id, d.text FROM documents d JOIN bk ON d.doc_id = bk.doc_id), " +
      bm25BodySql("keptdocs", "text", graft.functions.Search.QueryTerms,
        ctePrefix = "bm")

  /** The x32 scorer as SQL, parameterized by the text expression, the
    * term list, and an optional corpus restriction (x84's delete slice).
    * Internal tf/df aliases are INDEX-based so multibyte terms
    * stay out of SQL identifiers (output column names are unchanged). */
  private def bm25OracleSql(textExpr: String, terms: Seq[String],
                            docsWhere: String = ""): String =
    "WITH " + bm25BodySql("documents", textExpr, terms, docsWhere)

  /** The scorer's CTE body (no WITH prefix), reading `(doc_id,
    * $textExpr)` from `docsRel` — composable after other CTE chains
    * (x104 feeds it the x71 kept corpus; `ctePrefix` keeps its internal
    * names clear of the upstream chain's, e.g. x71's band CTE `b`). */
  private def bm25BodySql(docsRel: String, textExpr: String, terms: Seq[String],
                          docsWhere: String = "", ctePrefix: String = ""): String = {
    val (cd, cb, cs, csc) =
      (s"${ctePrefix}d", s"${ctePrefix}b", s"${ctePrefix}s", s"${ctePrefix}sc")
    val ti = terms.zipWithIndex
    val tfCols = ti.map { case (t, i) =>
      s"len(list_filter(toks, x -> x = '$t')) AS tf_$i" }.mkString(", ")
    val dfCols = ti.map { case (_, i) =>
      s"sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS df_$i" }.mkString(", ")
    val avgdl = "(CAST(sum_dl AS DOUBLE) / n_docs)"
    val score = ti.map { case (_, i) =>
      s"((n_docs - df_$i + 0.5e0) / (df_$i + 0.5e0)) * (tf_$i * 2.2e0) / " +
        s"(tf_$i + 1.2e0 * (0.25e0 + 0.75e0 * dl / $avgdl))" }.mkString(" + ")
    val matched = ti.map { case (_, i) =>
      s"CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END" }.mkString(" + ")
    s"$cd AS (SELECT doc_id, list_filter(string_split_regex(lower($textExpr), '\\s+'), t -> length(t) > 0) AS toks FROM $docsRel$docsWhere), " +
      s"$cb AS (SELECT doc_id, len(toks) AS dl, $tfCols FROM $cd), " +
      s"$cs AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl, $dfCols FROM $cb), " +
      s"$csc AS (SELECT doc_id, $score AS raw, CAST($matched AS INTEGER) AS n_matched FROM $cb CROSS JOIN $cs) " +
      s"SELECT doc_id, round(raw, 4) AS bm25, n_matched FROM $csc WHERE n_matched > 0 ORDER BY raw DESC, doc_id LIMIT 20"
  }

  private def x33OracleSql: String =
    "WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
      "t AS (SELECT doc_id, unnest(toks) AS term FROM d), " +
      "tf AS (SELECT term, doc_id, count(*) AS tf FROM t GROUP BY 1, 2), " +
      "st AS (SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS total_tf FROM tf GROUP BY term), " +
      "r AS (SELECT term, doc_id, row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn FROM tf), " +
      s"p AS (SELECT term, array_to_string(list_sort(list(doc_id)), ',') AS postings FROM r WHERE rn <= ${graft.functions.Search.MaxPostings} GROUP BY term) " +
      "SELECT st.term, df, total_tf, postings FROM st JOIN p USING (term) ORDER BY term"

  /** x36 least-squares oracle: the same Gram sums and Cramer expansions,
    * with e-notation/CAST doubles so DuckDB evaluates in IEEE double with
    * Spark's association order (rounding absorbs the y-sum order noise). */
  private def x36OracleSql: String =
    "WITH e AS (SELECT value AS y, CAST(hour(ts) AS BIGINT) AS x1, CAST(day(ts) AS BIGINT) AS x2 FROM events), " +
      "g AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x1) AS rsx1, sum(x2) AS rsx2, sum(x1*x1) AS rsx11, sum(x1*x2) AS rsx12, sum(x2*x2) AS rsx22, sum(y) AS sy, sum(x1*y) AS sx1y, sum(x2*y) AS sx2y, sum(y*y) AS syy FROM e), " +
      "c AS (SELECT n, CAST(n AS DOUBLE) AS nd, CAST(rsx1 AS DOUBLE) AS sx1, CAST(rsx2 AS DOUBLE) AS sx2, CAST(rsx11 AS DOUBLE) AS sx11, CAST(rsx12 AS DOUBLE) AS sx12, CAST(rsx22 AS DOUBLE) AS sx22, sy, sx1y, sx2y, syy FROM g), " +
      "d AS (SELECT *, nd*(sx11*sx22 - sx12*sx12) - sx1*(sx1*sx22 - sx12*sx2) + sx2*(sx1*sx12 - sx11*sx2) AS det FROM c), " +
      "b AS (SELECT *, (sy*(sx11*sx22 - sx12*sx12) - sx1*(sx1y*sx22 - sx12*sx2y) + sx2*(sx1y*sx12 - sx11*sx2y)) / det AS b0, " +
      "(nd*(sx1y*sx22 - sx12*sx2y) - sy*(sx1*sx22 - sx12*sx2) + sx2*(sx1*sx2y - sx1y*sx2)) / det AS b1, " +
      "(nd*(sx11*sx2y - sx1y*sx12) - sx1*(sx1*sx2y - sx1y*sx2) + sy*(sx1*sx12 - sx11*sx2)) / det AS b2 FROM d) " +
      "SELECT n, round(b0, 4) AS b0, round(b1, 4) AS b1, round(b2, 4) AS b2, " +
      "round(1.0e0 - (syy - b0*sy - b1*sx1y - b2*sx2y) / (syy - sy*sy/nd), 6) AS r2 FROM b"

  /** x34 semantic-dedup oracle: the x10 bucket/cosine CTEs plus the greedy
    * min-lower-id drop rule as an aggregate + left join. */
  private def x34OracleSql: String =
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings), " +
      s"g AS (SELECT vec_id, de, ${lshBucketSqlExpr("de")} AS bucket FROM e), " +
      "p AS (SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of FROM g a JOIN g b ON a.bucket = b.bucket AND a.vec_id < b.vec_id " +
      "AND round(list_dot_product(a.de, b.de) / (sqrt(list_dot_product(a.de, a.de)) * sqrt(list_dot_product(b.de, b.de))), 4) >= " +
      s"${graft.functions.Dedup.EmbeddingNearDupThreshold} GROUP BY b.vec_id) " +
      "SELECT g.vec_id, CAST(g.bucket AS INTEGER) AS bucket, p.dup_of, p.dup_of IS NULL AS is_kept " +
      "FROM g LEFT JOIN p ON g.vec_id = p.vec_id ORDER BY g.vec_id"

  /** x35 bloom oracle: a set bit is exactly "some eval shingle hashed
    * here", so membership = all k positions present in the eval-position
    * set; positions are the same 4-hex md5 slices (x19's hex-parse trick). */
  private def x35OracleSql: String = {
    def hex4(off: Int): String =
      s"list_reduce(list_prepend(0, list_transform(range(1, 5), i -> strpos('0123456789abcdef', substr(md5(sh), $off + i, 1)) - 1)), (a, b) -> a * 16 + b)"
    val posList = s"[${hex4(0)}, ${hex4(4)}, ${hex4(8)}]"
    "WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
      "g AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])) ELSE CAST([] AS VARCHAR[]) END) AS tg FROM d), " +
      s"ev AS (SELECT DISTINCT unnest(tg) AS sh FROM g WHERE doc_id < ${graft.functions.Bloom.EvalDocs}), " +
      s"pos AS (SELECT DISTINCT unnest($posList) AS p FROM ev), " +
      s"c AS (SELECT doc_id, unnest(tg) AS sh FROM g WHERE doc_id >= ${graft.functions.Bloom.EvalDocs}), " +
      s"cp AS (SELECT doc_id, sh, unnest($posList) AS p FROM c), " +
      "mb AS (SELECT cp.doc_id, cp.sh, sum(CASE WHEN pos.p IS NULL THEN 1 ELSE 0 END) AS misses FROM cp LEFT JOIN pos ON cp.p = pos.p GROUP BY cp.doc_id, cp.sh), " +
      "a1 AS (SELECT doc_id, count(*) AS n_shingles, sum(CASE WHEN misses = 0 THEN 1 ELSE 0 END) AS n_maybe FROM mb GROUP BY doc_id), " +
      "a2 AS (SELECT c.doc_id, sum(CASE WHEN ev.sh IS NOT NULL THEN 1 ELSE 0 END) AS n_exact FROM c LEFT JOIN ev ON c.sh = ev.sh GROUP BY c.doc_id) " +
      "SELECT g.doc_id, CAST(coalesce(a1.n_shingles, 0) AS BIGINT) AS n_shingles, CAST(coalesce(a1.n_maybe, 0) AS BIGINT) AS n_maybe, " +
      "CAST(coalesce(a2.n_exact, 0) AS BIGINT) AS n_exact, coalesce(a1.n_maybe, 0) >= 1 AS bloom_contaminated, " +
      "CAST(coalesce(a1.n_maybe, 0) - coalesce(a2.n_exact, 0) AS BIGINT) AS fp_shingles " +
      s"FROM g LEFT JOIN a1 ON g.doc_id = a1.doc_id LEFT JOIN a2 ON g.doc_id = a2.doc_id WHERE g.doc_id >= ${graft.functions.Bloom.EvalDocs} ORDER BY g.doc_id"
  }

  /** x38 CMS oracle: a grid cell is exactly the sum of counts of tokens
    * hashing there, so DuckDB rebuilds the grid from the token counts and
    * takes the same min-of-k-cells estimate; positions are 3-hex md5
    * slices (the x35 hex-parse trick, 3 chars). */
  private def x38OracleSql: String = {
    def hex3(off: Int): String =
      s"list_reduce(list_prepend(0, list_transform(range(1, 4), i -> strpos('0123456789abcdef', substr(md5(token), $off + i, 1)) - 1)), (a, b) -> a * 16 + b)"
    "WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
      "t AS (SELECT unnest(toks) AS token FROM d), " +
      "tc AS (SELECT token, count(*) AS n FROM t GROUP BY token), " +
      s"tp AS (SELECT token, n, ${hex3(0)} AS p0, ${hex3(4)} AS p1, ${hex3(8)} AS p2 FROM tc), " +
      "cl AS (SELECT depth, p, sum(n) AS c FROM (SELECT 0 AS depth, p0 AS p, n FROM tp UNION ALL SELECT 1, p1, n FROM tp UNION ALL SELECT 2, p2, n FROM tp) u GROUP BY depth, p), " +
      "top AS (SELECT token, n, p0, p1, p2 FROM tp ORDER BY n DESC, token LIMIT 20) " +
      "SELECT top.token, top.n, CAST(least(c0.c, c1.c, c2.c) AS BIGINT) AS cms_est, CAST(least(c0.c, c1.c, c2.c) - top.n AS BIGINT) AS overcount " +
      "FROM top JOIN cl c0 ON c0.depth = 0 AND c0.p = top.p0 JOIN cl c1 ON c1.depth = 1 AND c1.p = top.p1 JOIN cl c2 ON c2.depth = 2 AND c2.p = top.p2 " +
      "ORDER BY top.n DESC, top.token"
  }

  /** x39 oracle: the x02/x03/x01/x19 oracle fragments composed — quality
    * band (e-notation doubles), min-over-fp canonical keep, lang-ID CASE,
    * md5 split bucket. */
  private def x39OracleSql: String = {
    val bucket = "list_reduce(list_prepend(0, list_transform(range(1, 5), i -> strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)), (a, b) -> a * 16 + b) % 100"
    "WITH d AS (SELECT doc_id, text, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
      "q AS (SELECT doc_id, toks, len(toks) AS n_ws, CASE WHEN len(toks) > 0 THEN len(list_filter(toks, t -> t IN ('the','a','and','of','to','in'))) / len(toks) ELSE 0.0 END AS sr, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp FROM d), " +
      s"qf AS (SELECT * FROM q WHERE n_ws >= ${graft.functions.Curation.MinTokens} AND sr >= 0.02e0 AND sr <= 0.25e0), " +
      "c AS (SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep_id FROM qf), " +
      "f AS (SELECT * FROM c WHERE doc_id = keep_id), " +
      "sda AS (SELECT doc_id, n_ws, sr, " +
      "CAST(len(list_filter(toks, t -> t IN ('the','a','and','of','to'))) AS INTEGER) AS s_en, " +
      "CAST(len(list_filter(toks, t -> t IN ('der','die','das','und','ist'))) AS INTEGER) AS s_de, " +
      "CAST(len(list_filter(toks, t -> t IN ('le','la','et','les','des'))) AS INTEGER) AS s_fr, " +
      "CAST(len(list_filter(toks, t -> t IN ('el','los','las','y','es'))) AS INTEGER) AS s_es FROM f) " +
      "SELECT doc_id, CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en' WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de' WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr' WHEN s_es > 0 THEN 'es' ELSE 'und' END AS guess_lang, " +
      s"CAST(n_ws AS INTEGER) AS n_ws_tokens, round(sr, 4) AS stop_ratio, " +
      s"CASE WHEN $bucket < 80 THEN 'train' WHEN $bucket < 90 THEN 'validation' ELSE 'test' END AS split FROM sda ORDER BY doc_id"
  }

  /** x41 hybrid-RRF oracle: the x32 oracle as a derived table for the
    * lexical ranking, a d20-style dense top-50 for the other side, full
    * join, 1/(60+rank) fusion. */
  private def x41OracleSql: String = {
    val k = graft.functions.Search.RrfK
    val depth = graft.functions.Search.RrfDepth
    s"WITH lex AS (SELECT doc_id AS id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex FROM ($x32OracleSql) x32), " +
      "qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0), " +
      "dtop AS (SELECT vec_id AS id, round(list_dot_product(CAST(embedding AS DOUBLE[]), qe) / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) * sqrt(list_dot_product(qe, qe))), 4) AS dscore " +
      s"FROM embeddings, qv WHERE vec_id != 0 ORDER BY dscore DESC, id LIMIT $depth), " +
      "dense AS (SELECT id, row_number() OVER (ORDER BY dscore DESC, id) AS r_dense FROM dtop), " +
      "f AS (SELECT coalesce(lex.id, dense.id) AS id, r_lex, r_dense, " +
      s"round(coalesce(1.0e0 / ($k + r_lex), 0.0e0) + coalesce(1.0e0 / ($k + r_dense), 0.0e0), 6) AS rrf " +
      "FROM lex FULL JOIN dense ON lex.id = dense.id) " +
      "SELECT id, CAST(r_lex AS INTEGER) AS r_lex, CAST(r_dense AS INTEGER) AS r_dense, rrf FROM f ORDER BY rrf DESC, id LIMIT 10"
  }

  /** x81 maintained-hybrid oracle: the x41 fusion arithmetic with both
    * rankings recomputed from scratch — r_lex from the x32 BM25 oracle
    * (the maintained text search is DEFINED ≡ x32 on the grown corpus,
    * the x79 contract), r_dense from the seed-trained IVFADC CTE unroll
    * for the single query vector (the x80 contract at depth 20 /
    * nprobe 3, `AnnOracleSql.x81DenseSql`). */
  private def x81OracleSql: String = {
    val k = graft.functions.Search.RrfK
    s"WITH lex AS (SELECT doc_id AS id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex FROM ($x32OracleSql) x32), " +
      s"dense AS (SELECT neighbor_id AS id, rk AS r_dense FROM (${AnnOracleSql.x81DenseSql}) dq), " +
      "f AS (SELECT coalesce(lex.id, dense.id) AS id, r_lex, r_dense, " +
      s"round(coalesce(1.0e0 / ($k + r_lex), 0.0e0) + coalesce(1.0e0 / ($k + r_dense), 0.0e0), 6) AS rrf " +
      "FROM lex FULL JOIN dense ON lex.id = dense.id) " +
      "SELECT id, CAST(r_lex AS INTEGER) AS r_lex, CAST(r_dense AS INTEGER) AS r_dense, rrf FROM f ORDER BY rrf DESC, id LIMIT 10"
  }

  /** x42 CDC-chunking oracle: recompute every window hash with the O(n·W)
    * refold (doubling as the rolling-subtraction correctness check — the
    * two agree only if the O(1) slide equals the window fold), then derive
    * chunks with lag() and fingerprint each chunk with the x15 fold. */
  private def x42OracleSql: String = cdcChunksOracleSql("text")

  /** u04 oracle: the x42 chunk recompute over the multibyte projection —
    * `substr`/`ascii`/`length` are all character (code-point) quantities
    * in DuckDB, matching the Spark expressions' code-point walk. */
  private def u04OracleSql: String =
    cdcChunksOracleSql("translate(lower(text), 'aet', 'äé数')")

  private def cdcChunksOracleSql(textExpr: String): String = {
    val w = graft.plans.CdcBoundaries.W
    val mask = 1 << graft.plans.CdcBoundaries.MaskBits
    val p = graft.plans.PolyFingerprint.P
    s"WITH d AS (SELECT doc_id, $textExpr AS text, length($textExpr) AS n FROM documents), " +
      s"pos AS (SELECT doc_id, text, n, unnest(range($w, n + 1)) AS i FROM d), " +
      s"h AS (SELECT doc_id, i, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(i - ${w - 1}, i + 1), j -> CAST(ascii(substr(text, CAST(j AS INTEGER), 1)) AS BIGINT))), (a, c) -> (a * 31 + c) % $p) AS wh FROM pos), " +
      s"ball AS (SELECT doc_id, i FROM h WHERE wh % $mask = 0 UNION SELECT doc_id, n FROM d), " +
      "b AS (SELECT doc_id, CAST(i AS INTEGER) AS end_cp, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS INTEGER) AS chunk_no, CAST(lag(i, 1, 0) OVER (PARTITION BY doc_id ORDER BY i) AS INTEGER) AS start_cp FROM ball) " +
      "SELECT b.doc_id, chunk_no, start_cp, end_cp - start_cp AS chunk_len, " +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, end_cp - start_cp + 1), j -> CAST(ascii(substr(text, start_cp + CAST(j AS INTEGER), 1)) AS BIGINT))), (a, c) -> (a * 31 + c) % $p) AS chunk_fp " +
      "FROM b JOIN d ON b.doc_id = d.doc_id ORDER BY b.doc_id, chunk_no"
  }
  /** x62's oracle, shared VERBATIM by x90 — the maintained near-dup
    * lifecycle (seed publish, restart reopen, stored-relation screen)
    * must hash-equal the batch screen topology: the x88/x31 sharing
    * pattern applied to the fourth pillar. Built by
    * [[nearDupScreenOracleSql]] with the full non-src19 corpus; x91
    * instantiates the same screen over (corpus − deleted slice). */
  /** x59's oracle, shared VERBATIM by x98 — the maintained exact-dedup
    * reader classify must equal the incremental screen's verdicts. */
  private val x59OracleSql: String =
    "WITH f AS (SELECT doc_id, source, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp FROM documents), " +
      "c AS (SELECT fp, min(doc_id) AS corpus_id FROM f WHERE source <> 'src19' GROUP BY fp), " +
      "b AS (SELECT doc_id, fp, min(doc_id) OVER (PARTITION BY fp) AS batch_min FROM f WHERE source = 'src19') " +
      "SELECT b.doc_id, b.fp, CASE WHEN c.corpus_id IS NOT NULL THEN 'dup_of_corpus' WHEN b.doc_id <> b.batch_min THEN 'dup_in_batch' ELSE 'new' END AS status, " +
      "coalesce(c.corpus_id, CASE WHEN b.doc_id <> b.batch_min THEN b.batch_min END) AS dup_of " +
      "FROM b LEFT JOIN c ON b.fp = c.fp ORDER BY b.doc_id"

  private val x62OracleSql: String = nearDupScreenOracleSql("source <> 'src19'")

  /** x91's oracle — the x62 screen recomputed over the post-takedown
    * membership: the engine GC'd the `doc_id % 10 == 3` slice at the
    * major, so the oracle's corpus side (candidates, bucket-cap counts,
    * AND the Jaccard verify's shingle reach, which only ever touches
    * candidate ids) excludes it relationally. */
  private val x91OracleSql: String =
    nearDupScreenOracleSql("source <> 'src19' AND doc_id % 10 <> 3")

  /** x89's oracle, shared VERBATIM by x94 (shadow-major twin): the
    * exact-dedup takedown lifecycle recomputed relationally — per-window
    * min-keeper folds, winner-only removal (loser ids are no-ops),
    * window-2 re-accepts of deleted fps read the index as absent ("new")
    * but are dropped by the major/shadow fold they ride into (the epoch
    * rule). */
  private val x89OracleSql: String =
    ("WITH d AS (SELECT doc_id, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp FROM documents), " +
     "m0 AS (SELECT fp, min(doc_id) AS id FROM d WHERE doc_id % 4 < 2 GROUP BY fp), " +
     "w0 AS (SELECT fp, min(doc_id) AS id FROM d WHERE doc_id % 4 = 2 GROUP BY fp), " +
     "d0 AS (SELECT w0.fp, w0.id FROM w0 LEFT JOIN m0 USING (fp) WHERE m0.fp IS NULL), " +
     "pre AS (SELECT * FROM m0 UNION ALL SELECT * FROM d0), " +
     "live AS (SELECT * FROM pre WHERE id >= 50), " +
     "del AS (SELECT fp FROM pre WHERE id < 50), " +
     "w1 AS (SELECT fp, min(doc_id) AS id FROM d WHERE doc_id % 4 = 3 GROUP BY fp), " +
     "s2 AS (SELECT w1.fp, w1.id FROM w1 LEFT JOIN live USING (fp) WHERE live.fp IS NULL), " +
     "s2k AS (SELECT s2.fp, s2.id FROM s2 LEFT JOIN del USING (fp) WHERE del.fp IS NULL) " +
     "SELECT fp, id AS corpus_id FROM live " +
     "UNION ALL SELECT fp, id AS corpus_id FROM s2k ORDER BY fp")

  /** The near-dup screen topology (x62/x90/x91 shared): MinHash band
    * signatures, capped LSH buckets, exact-Jaccard verify, portable
    * argmin best-match — parametrized ONLY by the corpus-side membership
    * predicate, so the maintained lifecycles' oracles stay structurally
    * identical to the batch form. */
  private def nearDupScreenOracleSql(corpusPred: String): String =
    ("WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
        "g AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])) ELSE CAST([] AS VARCHAR[]) END) AS tg FROM d), " +
        "g2 AS (SELECT doc_id, list_transform(tg, sh -> md5(sh)) AS tgh FROM g WHERE len(tg) > 0), " +
        "b AS (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS band), " +
        "sig AS (SELECT g2.doc_id, sr.source, band, list_min(list_transform(tgh, h -> substr(h, band * 4 + 1, 4))) AS min_hash FROM g2 JOIN (SELECT doc_id, source FROM documents) sr ON g2.doc_id = sr.doc_id CROSS JOIN b), " +
        "bs AS (SELECT doc_id AS batch_id, band, min_hash FROM sig WHERE source = 'src19'), " +
        s"cs0 AS (SELECT doc_id AS corpus_id, band, min_hash FROM sig WHERE $corpusPred), " +
        "ok AS (SELECT band, min_hash FROM cs0 GROUP BY band, min_hash HAVING count(*) <= 256), " +
        "cs AS (SELECT cs0.corpus_id, cs0.band, cs0.min_hash FROM cs0 JOIN ok ON cs0.band = ok.band AND cs0.min_hash = ok.min_hash), " +
        "p AS (SELECT DISTINCT batch_id, corpus_id FROM bs JOIN cs ON bs.band = cs.band AND bs.min_hash = cs.min_hash), " +
        "vp AS (SELECT batch_id, corpus_id, CASE WHEN len(list_distinct(list_concat(ga.tg, gb.tg))) = 0 THEN 0.0 ELSE round(len(list_filter(ga.tg, x -> list_contains(gb.tg, x))) / len(list_distinct(list_concat(ga.tg, gb.tg))), 4) END AS jaccard FROM p JOIN g ga ON ga.doc_id = p.batch_id JOIN g gb ON gb.doc_id = p.corpus_id), " +
        "v AS (SELECT * FROM vp WHERE jaccard >= 5.0e-1), " +
        "best AS (SELECT batch_id, CAST(count(*) AS BIGINT) AS n_matches, max(jaccard) AS best_jaccard, min_by(corpus_id, (10000 - CAST(round(jaccard * 1.0e4, 0) AS BIGINT)) * 17592186044416 + corpus_id) AS best_corpus_id FROM v GROUP BY batch_id) " +
        "SELECT dd.doc_id AS batch_id, coalesce(best.n_matches, 0) AS n_matches, best.best_jaccard, best.best_corpus_id FROM documents dd LEFT JOIN best ON dd.doc_id = best.batch_id WHERE dd.source = 'src19' ORDER BY batch_id")


  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. EVERY declared query has one — the last
    * rows-only holdouts fell to [[XxhashSql]] (xxhash64 recomputed in
    * SQL) and [[AnnOracleSql]] (k-means training unrolled as CTEs over
    * exact integer-unit Lloyd means). */
  def oracleSql: Map[String, String] = Map(
    "d01_scan_projection" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "d02_filter" ->
      "SELECT event_id, user_id, event_type, round(value, 2) AS value_r FROM events WHERE event_type IN ('purchase','signup') AND value > 50 AND props IS NOT NULL ORDER BY event_id",
    "d03_last_event_per_user" ->
      "SELECT user_id, event_id AS last_event_id, event_type AS last_event_type, round(value, 2) AS last_value FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events) t WHERE rn = 1 ORDER BY user_id",
    "d03b_salted_argmax" ->
      "SELECT user_id, event_id AS last_event_id, event_type AS last_event_type, round(value, 2) AS last_value FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn FROM events) t WHERE rn = 1 ORDER BY user_id",
    "d04_hash_agg" ->
      "SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value, round(avg(value), 2) AS avg_value, round(min(value), 2) AS min_value, round(max(value), 2) AS max_value FROM events GROUP BY event_type ORDER BY event_type",
    "d05_count_distinct" ->
      "SELECT count(DISTINCT user_id) AS n_users, count(DISTINCT event_type) AS n_types, count(*) AS n_events FROM events",
    "d06_join_orders_customer" ->
      "SELECT o_orderkey, c_name, c_mktsegment, round(o_totalprice, 2) AS total_r FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey",
    "d07_anti_join" ->
      "SELECT c_custkey, c_name FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') ORDER BY c_custkey",
    "d07_semi_join" ->
      "SELECT c_custkey, c_name FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000) ORDER BY c_custkey",
    "d07b_left_outer_join" ->
      "SELECT c_custkey, c_name, o_orderkey, round(o_totalprice, 2) AS total_r FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o ON c_custkey = o_custkey ORDER BY c_custkey, o_orderkey NULLS FIRST",
    "d07c_full_outer_join" ->
      "SELECT p.p_user, e.e_user FROM (SELECT DISTINCT user_id AS p_user FROM events WHERE event_type = 'purchase' AND value > 200) p FULL JOIN (SELECT DISTINCT user_id AS e_user FROM events WHERE event_type = 'error' AND value > 200) e ON p.p_user = e.e_user ORDER BY p_user NULLS FIRST, e_user NULLS FIRST",
    "d09b_window_family" ->
      "SELECT event_id, user_id, first_value(event_type) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type, last_value(event_type) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type, CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY event_id) AS INTEGER) AS q4, round(percent_rank() OVER (PARTITION BY user_id ORDER BY event_id), 4) AS pr, round(cume_dist() OVER (PARTITION BY user_id ORDER BY event_id), 4) AS cd FROM events ORDER BY event_id",
    "d26_scalar_subquery" ->
      "SELECT event_id, round(value, 2) AS value_r, round(value - (SELECT avg(value) FROM events), 2) AS delta FROM events WHERE value > (SELECT avg(value) FROM events) ORDER BY event_id",
    "d08_revenue_per_nation" ->
      "SELECT r_name, n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, count(*) AS n_lineitems FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey WHERE r_name IN ('ASIA','EUROPE') GROUP BY r_name, n_name ORDER BY r_name, n_name",
    "d09_window_running" ->
      "SELECT user_id, event_id, round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value, lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type, lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS next_type, CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS INTEGER) AS value_rank FROM events ORDER BY event_id",
    "d10_topk" ->
      "SELECT * FROM (SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total_r FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10) t ORDER BY total_r DESC, o_orderkey",
    "d11_except" ->
      "SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 200 EXCEPT SELECT user_id FROM events WHERE event_type = 'error' AND value > 200 ORDER BY user_id",
    "d11_intersect" ->
      "SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 200 INTERSECT SELECT user_id FROM events WHERE event_type = 'error' AND value > 200 ORDER BY user_id",
    "d11_union" ->
      "SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 200 UNION SELECT user_id FROM events WHERE event_type = 'error' AND value > 200 ORDER BY user_id",
    "d12_queue_ref_parse" ->
      "SELECT event_id, queue_ref, regexp_extract(queue_ref, '^([^.]+)\\.(.+)$', 1) AS q_schema, regexp_extract(queue_ref, '^([^.]+)\\.(.+)$', 2) AS q_name, CAST(length(queue_ref) AS INTEGER) AS ref_len, substr(queue_ref, 1, 5) AS ref_prefix FROM (SELECT event_id, concat('CDC', CAST(user_id % 3 AS VARCHAR), '.Q_', upper(event_type)) AS queue_ref FROM events) t ORDER BY event_id",
    "d13_events_per_day" ->
      "SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n_events, round(sum(value), 2) AS sum_value FROM events GROUP BY 1 ORDER BY day",
    "d14_json_extract" ->
      "SELECT event_id, json_extract_string(props, '$.k') AS k_val, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int FROM events ORDER BY event_id",
    "d15_dml_key" ->
      "SELECT event_id, concat('[\"event_id\",', CAST(event_id AS VARCHAR), ',\"user_id\",', CAST(user_id AS VARCHAR), ']') AS dml_key, concat('{\"id\":{\"event_id\":', CAST(event_id AS VARCHAR), ',\"user_id\":', CAST(user_id AS VARCHAR), '},\"type\":\"', event_type, '\",\"table\":\"events\"}') AS dml_raw FROM events ORDER BY event_id",
    "d15b_dml_key_native" ->
      "SELECT event_id, concat('[\"etype\",\"', event_type, '\",\"user\",\"u', CAST(user_id AS VARCHAR), '\"]') AS dml_key_native FROM events ORDER BY event_id",
    "d13b_hour_histogram" ->
      "SELECT CAST(hour(ts) AS INTEGER) AS hour_of_day, count(*) AS n_events, round(avg(value), 2) AS avg_value FROM events GROUP BY 1 ORDER BY hour_of_day",
    "d13c_date_arithmetic" ->
      "SELECT event_id, CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER) AS days_since, CAST(ts AS DATE) + 7 AS plus_week, CAST(year(ts) AS INTEGER) AS y, CAST(month(ts) AS INTEGER) AS m, CAST(day(ts) AS INTEGER) AS d, CAST(quarter(ts) AS INTEGER) AS q FROM events ORDER BY event_id",
    "d16_rollup" ->
      "SELECT coalesce(event_type, 'ALL') AS etype, coalesce(CAST(bucket AS VARCHAR), 'ALL') AS bucket_s, count(*) AS n, round(sum(value), 2) AS sum_value FROM (SELECT event_type, user_id % 4 AS bucket, value FROM events) t GROUP BY ROLLUP(event_type, bucket) ORDER BY etype, bucket_s",
    "d16b_cube" ->
      "SELECT coalesce(event_type, 'ALL') AS etype, coalesce(CAST(bucket AS VARCHAR), 'ALL') AS bucket_s, count(*) AS n, round(sum(value), 2) AS sum_value FROM (SELECT event_type, user_id % 4 AS bucket, value FROM events) t GROUP BY CUBE(event_type, bucket) ORDER BY etype, bucket_s",
    "d16c_grouping_sets" ->
      "SELECT coalesce(event_type, 'ALL') AS etype, coalesce(CAST(bucket AS VARCHAR), 'ALL') AS bucket_s, count(*) AS n, round(sum(value), 2) AS sum_value FROM (SELECT event_type, user_id % 4 AS bucket, value FROM events) t GROUP BY GROUPING SETS ((event_type), (bucket)) ORDER BY etype, bucket_s",
    "d17_distinct" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "d18_hourly_window" ->
      "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_s, event_type, count(*) AS n, round(sum(value), 2) AS sum_value FROM events GROUP BY 1, 2 ORDER BY hour_s, event_type",
    "d19_sessionize" ->
      "SELECT user_id, count(*) AS n_events, CAST(sum(CASE WHEN prev_ts IS NULL OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions FROM (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events) t GROUP BY user_id ORDER BY user_id",
    "d20_similarity_topk" ->
      "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb FROM embeddings WHERE vec_id = 0) SELECT vec_id AS neighbor_id, round(list_dot_product(CAST(embedding AS DOUBLE[]), q_emb) / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) * sqrt(list_dot_product(q_emb, q_emb))), 4) AS score FROM embeddings, q WHERE vec_id != 0 ORDER BY score DESC, neighbor_id LIMIT 5",
    "d21_token_topk" ->
      "SELECT token, count(*) AS n FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS token FROM documents) t WHERE length(token) > 0 GROUP BY token ORDER BY n DESC, token LIMIT 20",
    "d22_pivot" ->
      "SELECT CAST(date_trunc('day', ts) AS DATE) AS day, CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click, CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS \"error\", CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase, CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup, CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS \"view\" FROM events GROUP BY 1 ORDER BY day",
    "d24_exists_subquery" ->
      "SELECT c_custkey, c_name FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000) ORDER BY c_custkey",
    "d25_null_ops" ->
      "SELECT event_id, nullif(event_type, 'error') AS et_nn, coalesce(nullif(event_type, 'error'), 'was_error') AS et_c, CASE WHEN value > 250 THEN value END AS big_value, coalesce(CASE WHEN value > 250 THEN round(value, 2) END, 0.0) AS big_or_zero FROM events ORDER BY event_id",
    "d23_percentiles" ->
      "SELECT event_type, round(quantile_cont(value, 0.5), 2) AS p50, round(quantile_cont(value, 0.9), 2) AS p90, round(quantile_cont(value, 0.99), 2) AS p99 FROM events GROUP BY event_type ORDER BY event_type",
    "d27_array_agg" ->
      "SELECT event_type, array_to_string(list_sort(list(DISTINCT user_id)), ',') AS users, count(DISTINCT user_id) AS n_users FROM events WHERE value > 480 GROUP BY event_type ORDER BY event_type",
    "d28_unpivot" ->
      "WITH w AS (SELECT event_type, round(sum(value), 2) AS sum_value, round(avg(value), 2) AS avg_value, round(min(value), 2) AS min_value, round(max(value), 2) AS max_value FROM events GROUP BY event_type) SELECT event_type, metric, val FROM (UNPIVOT w ON sum_value, avg_value, min_value, max_value INTO NAME metric VALUE val) ORDER BY event_type, metric",
    "d29_asof_join" ->
      "WITH u AS (SELECT user_id, ts, event_id, CAST(NULL AS BIGINT) AS click_id, CAST(NULL AS DOUBLE) AS click_value, 1 AS side FROM events WHERE event_type = 'purchase' UNION ALL SELECT user_id, ts, CAST(NULL AS BIGINT), event_id, value, 0 FROM events WHERE event_type = 'click'), m AS (SELECT user_id, event_id, side, last_value(click_id IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, side, click_id NULLS FIRST ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_click_id, round(last_value(click_value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, side, click_id NULLS FIRST ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS asof_click_value FROM u) SELECT user_id, event_id, asof_click_id, asof_click_value FROM m WHERE side = 1 ORDER BY event_id",
    "d30_range_join" ->
      "SELECT event_id, round(value, 2) AS value_r, coalesce(band_name, 'none') AS band FROM events e LEFT JOIN (VALUES ('tiny', 0.0, 50.0), ('low', 50.0, 150.0), ('mid', 150.0, 300.0), ('high', 300.0, 450.0), ('top', 450.0, 1000.0)) AS b(band_name, lo, hi) ON e.value >= b.lo AND e.value < b.hi ORDER BY event_id",
    "d31_range_window" ->
      "WITH e AS (SELECT event_id, user_id, value, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events) SELECT event_id, user_id, round(sum(value) OVER (PARTITION BY user_id ORDER BY ts_sec RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2) AS hour_sum FROM e ORDER BY event_id",
    "x21_sequence_pack" ->
      "WITH d AS (SELECT doc_id, CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0)) AS INTEGER) AS n_tokens FROM documents), c AS (SELECT doc_id, n_tokens, CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset FROM d) SELECT doc_id, n_tokens, start_offset, CAST(start_offset // 2048 AS BIGINT) AS bin, CAST(start_offset % 2048 AS INTEGER) AS offset_in_bin FROM c ORDER BY doc_id",
    "x22_decontaminate" ->
      "WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), g AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])) ELSE CAST([] AS VARCHAR[]) END) AS tg FROM d), b AS (SELECT DISTINCT unnest(tg) AS sh FROM g WHERE doc_id < 20), c AS (SELECT doc_id, unnest(tg) AS sh FROM g WHERE doc_id >= 20), h AS (SELECT c.doc_id, count(DISTINCT c.sh) AS n_shared FROM c JOIN b ON c.sh = b.sh GROUP BY c.doc_id) SELECT g.doc_id, CAST(coalesce(h.n_shared, 0) AS BIGINT) AS n_shared, coalesce(h.n_shared, 0) >= 1 AS contaminated FROM g LEFT JOIN h ON g.doc_id = h.doc_id WHERE g.doc_id >= 20 ORDER BY g.doc_id",
    "d32_salted_join" ->
      "SELECT o_orderkey, c_name, round(o_totalprice, 2) AS total_r FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey",
    "x23_repetition_stats" ->
      "WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), g AS (SELECT doc_id, toks, len(toks) AS n, list_distinct(CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])) ELSE CAST([] AS VARCHAR[]) END) AS tg FROM d) SELECT doc_id, CAST(n AS INTEGER) AS n_tokens, round(CASE WHEN n > 0 THEN 1.0 - len(list_distinct(toks)) / n ELSE 0.0 END, 4) AS dup_token_frac, round(CASE WHEN n >= 3 THEN 1.0 - len(tg) / (n - 2) ELSE 0.0 END, 4) AS dup_trigram_frac, round(CASE WHEN n >= 3 THEN 1.0 - len(tg) / (n - 2) ELSE 0.0 END, 4) > 0.30 AS flagged FROM g ORDER BY doc_id",
    "x24_mixture_weights" ->
      "WITH a AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang), t AS (SELECT lang, n_docs, power(n_docs, 0.3) AS w_raw, sum(power(n_docs, 0.3)) OVER () AS w_sum, sum(n_docs) OVER () AS total FROM a) SELECT lang, n_docs, round(w_raw / w_sum, 4) AS weight, round((w_raw / w_sum) / (n_docs / total), 4) AS boost FROM t ORDER BY lang",
    "x25_token_count" ->
      "WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks, regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+') AS bpe FROM documents) SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_ws_tokens, CAST(len(bpe) AS INTEGER) AS n_bpe_tokens, round(CASE WHEN len(toks) > 0 THEN len(bpe) / len(toks) ELSE 0.0 END, 4) AS bpe_per_ws FROM d ORDER BY doc_id",
    "u01_utf8_tokens" ->
      ("WITH d AS (SELECT doc_id, translate(lower(text), 'aet', 'äé数') AS u FROM documents) " +
        "SELECT doc_id, CAST(length(u) AS INTEGER) AS n_cp, CAST(strlen(u) AS INTEGER) AS n_bytes, " +
        "CAST(len(list_filter(string_split_regex(u, '\\s+'), t -> length(t) > 0)) AS INTEGER) AS n_ws_tokens, " +
        "CAST(len(regexp_extract_all(u, '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+')) AS INTEGER) AS n_bpe_tokens, " +
        "md5(u) AS fp_md5 FROM d ORDER BY doc_id"),
    "u02_utf8_xxhash" ->
      ("WITH RECURSIVE ud AS (SELECT doc_id, translate(lower(text), 'aet', 'äé数') AS s FROM documents), " +
        "strs AS (SELECT DISTINCT s FROM ud), " +
        XxhashSql.xxh64StrCtes("strs", utf8Bytes = true) + " " +
        s"SELECT ud.doc_id, ${XxhashSql.signed("xh.hu")} AS fp64 FROM ud JOIN xh ON ud.s = xh.s ORDER BY ud.doc_id"),
    "u03_utf8_minhash" -> u03OracleSql,
    "u04_utf8_cdc_chunks" -> u04OracleSql,
    "u05_utf8_simhash" ->
      ("WITH d AS (SELECT doc_id, translate(lower(text), 'aet', 'äé数') AS u FROM documents), " +
        "t AS (SELECT doc_id, unnest(list_filter(string_split_regex(u, '\\s+'), tk -> length(tk) > 0)) AS token FROM d), " +
        "h AS (SELECT doc_id, md5(token) AS hx FROM t), " +
        "b AS (SELECT doc_id, hx, CAST(unnest(range(0, 32)) AS INTEGER) AS bit FROM h), " +
        "v AS (SELECT doc_id, bit, sum(CASE WHEN substr(hx, bit + 1, 1) IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END) AS votes FROM b GROUP BY doc_id, bit) " +
        "SELECT doc_id, CAST(sum(CASE WHEN votes > 0 THEN CAST(power(2, bit) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash32 FROM v GROUP BY doc_id ORDER BY doc_id"),
    "u06_utf8_polyfp" ->
      ("WITH d AS (SELECT doc_id, translate(lower(text), 'aet', 'äé数') AS u FROM documents), " +
        "f AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(u) + 1), i -> CAST(ascii(substr(u, i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) % 274876858367) AS fp64 FROM d) " +
        "SELECT fp64, count(*) AS n_docs, min(doc_id) AS keep_id FROM f GROUP BY fp64 ORDER BY fp64"),
    "u07_utf8_quality" ->
      ("WITH d0 AS (SELECT doc_id, translate(lower(text), 'aet', 'äé数') AS u FROM documents), " +
        "d AS (SELECT doc_id, u, list_filter(string_split_regex(u, '\\s+'), t -> length(t) > 0) AS toks FROM d0) " +
        "SELECT doc_id, CAST(length(u) AS INTEGER) AS text_len, " +
        "CAST(len(regexp_extract_all(u, '[A-Za-z0-9]+')) AS INTEGER) AS n_word_tokens, " +
        "CAST(len(toks) AS INTEGER) AS n_ws_tokens, " +
        "CASE WHEN length(u) > 0 THEN round(len(regexp_extract_all(u, '[.,;:!?]')) / length(u), 4) ELSE 0.0 END AS punct_ratio, " +
        "CASE WHEN len(toks) > 0 THEN round(len(list_filter(toks, t -> t IN ('数hé','ä','änd','of','数o','in'))) / len(toks), 4) ELSE 0.0 END AS stopword_ratio " +
        "FROM d ORDER BY doc_id"),
    "u08_utf8_gopher" ->
      ("WITH d0 AS (SELECT doc_id, translate(lower(text), 'aet', 'äé数') AS text FROM documents), " +
        "d AS (SELECT doc_id, text, list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 0) AS toks FROM d0), " +
        "b AS (SELECT doc_id, " +
        "CAST(coalesce(len(toks), 0) AS BIGINT) AS n_words, " +
        "round(CASE WHEN len(toks) > 0 THEN CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(toks, t -> CAST(length(t) AS BIGINT))), (a, b) -> a + b) AS DOUBLE) / len(toks) ELSE 0.0e0 END, 4) AS mean_word_len, " +
        "coalesce(CAST(length(text) - length(regexp_replace(text, '#', '', 'g')) AS BIGINT) + CAST((length(text) - length(regexp_replace(text, '\\.\\.\\.', '', 'g'))) / 3 AS BIGINT), 0) AS n_symbols, " +
        "round(CASE WHEN len(toks) > 0 THEN CAST(CAST(length(text) - length(regexp_replace(text, '#', '', 'g')) AS BIGINT) + CAST((length(text) - length(regexp_replace(text, '\\.\\.\\.', '', 'g'))) / 3 AS BIGINT) AS DOUBLE) / len(toks) ELSE 0.0e0 END, 4) AS symbol_ratio, " +
        "CAST(coalesce(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))), 0) AS BIGINT) AS n_alpha_words, " +
        "CAST(coalesce(len(list_intersect(list_distinct(toks), ['数hé','ä'])), 0) AS BIGINT) AS n_stop_hits FROM d), " +
        "r AS (SELECT *, " +
        "n_words >= 50 AND n_words <= 100000 AS ok_words, " +
        "mean_word_len >= 3.0e0 AND mean_word_len <= 1.0e1 AS ok_wlen, " +
        "symbol_ratio < 1.0e-1 AS ok_symbols, " +
        "n_words > 0 AND CAST(n_alpha_words AS DOUBLE) >= CAST(n_words AS DOUBLE) * 8.0e-1 AS ok_alpha, " +
        "n_stop_hits >= 2 AS ok_stops FROM b) " +
        "SELECT doc_id, n_words, mean_word_len, n_symbols, symbol_ratio, n_alpha_words, n_stop_hits, ok_words, ok_wlen, ok_symbols, ok_alpha, ok_stops, " +
        "ok_words AND ok_wlen AND ok_symbols AND ok_alpha AND ok_stops AS keep FROM r ORDER BY doc_id"),
    "u09_utf8_bpe_tokenize" -> u09OracleSql,
    "u10_utf8_bm25" -> u10OracleSql,
    "x27_pii_redact" ->
      ("WITH p AS (SELECT doc_id, concat(text, " +
        "CASE WHEN doc_id % 3 = 0 THEN concat(' contact user', CAST(doc_id AS VARCHAR), '@example.com') ELSE '' END, " +
        "CASE WHEN doc_id % 5 = 0 THEN concat(' call 555-', lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'), '-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) ELSE '' END, " +
        "CASE WHEN doc_id % 7 = 0 THEN concat(' host 10.0.', CAST(doc_id % 256 AS VARCHAR), '.', CAST(doc_id % 100 AS VARCHAR)) ELSE '' END) AS t FROM documents) " +
        "SELECT doc_id, " +
        "CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails, " +
        "CAST(len(regexp_extract_all(t, '\\b555-[0-9]{3}-[0-9]{4}\\b')) AS INTEGER) AS n_phones, " +
        "CAST(len(regexp_extract_all(t, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS INTEGER) AS n_ips, " +
        "(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) + len(regexp_extract_all(t, '\\b555-[0-9]{3}-[0-9]{4}\\b')) + len(regexp_extract_all(t, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'))) > 0 AS has_pii, " +
        "regexp_replace(regexp_replace(regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'), '\\b555-[0-9]{3}-[0-9]{4}\\b', '[PHONE]', 'g'), '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '[IP]', 'g') AS redacted " +
        "FROM p ORDER BY doc_id"),
    "x28_bigram_lm" ->
      ("WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
        "g AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)), i -> concat(toks[i], ' ', toks[i+1])) ELSE CAST([] AS VARCHAR[]) END) AS gram FROM d), " +
        "m AS (SELECT gram, count(*) AS c FROM g GROUP BY gram), " +
        "sc AS (SELECT g.doc_id, count(*) AS n_bigrams, round(avg(m.c), 4) AS avg_bigram_count, round(avg(CASE WHEN m.c = 1 THEN 1.0 ELSE 0.0 END), 4) AS rare_frac FROM g JOIN m USING (gram) GROUP BY g.doc_id) " +
        "SELECT d2.doc_id, CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams, coalesce(sc.avg_bigram_count, 0.0) AS avg_bigram_count, coalesce(sc.rare_frac, 0.0) AS rare_frac " +
        "FROM (SELECT doc_id FROM documents) d2 LEFT JOIN sc USING (doc_id) ORDER BY doc_id"),
    "x63_lm_perplexity" ->
      ("WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
        "g AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)), i -> concat(toks[i], ' ', toks[i+1])) ELSE CAST([] AS VARCHAR[]) END) AS gram FROM d), " +
        "m AS (SELECT gram, count(*) AS c FROM g GROUP BY gram), " +
        "c1 AS (SELECT split_part(gram, ' ', 1) AS w1, sum(c) AS c1 FROM m GROUP BY 1), " +
        "nlp AS (SELECT m.gram, -(ln(m.c) - ln(c1.c1)) AS nlp FROM m JOIN c1 ON split_part(m.gram, ' ', 1) = c1.w1), " +
        "sc AS (SELECT g.doc_id, count(*) AS n_bigrams, round(avg(nlp.nlp), 4) AS cross_entropy, round(exp(avg(nlp.nlp)), 4) AS ppl FROM g JOIN nlp USING (gram) GROUP BY g.doc_id) " +
        "SELECT d2.doc_id, CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams, coalesce(sc.cross_entropy, 0.0) AS cross_entropy, coalesce(sc.ppl, 1.0) AS ppl " +
        "FROM (SELECT doc_id FROM documents) d2 LEFT JOIN sc USING (doc_id) ORDER BY doc_id"),
    "x67_pmi_collocations" ->
      ("WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
        "g AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)), i -> concat(toks[i], ' ', toks[i+1])) ELSE CAST([] AS VARCHAR[]) END) AS gram FROM d), " +
        "m AS (SELECT gram, count(*) AS n_pair FROM g GROUP BY gram), " +
        "l AS (SELECT split_part(gram, ' ', 1) AS w1, sum(n_pair) AS n_left FROM m GROUP BY 1), " +
        "r AS (SELECT split_part(gram, ' ', 2) AS w2, sum(n_pair) AS n_right FROM m GROUP BY 1), " +
        "t AS (SELECT sum(n_pair) AS n_total FROM m), " +
        "p AS (SELECT m.gram, CAST(m.n_pair AS BIGINT) AS n_pair, CAST(l.n_left AS BIGINT) AS n_left, CAST(r.n_right AS BIGINT) AS n_right, round(ln((CAST(m.n_pair AS DOUBLE) * CAST(t.n_total AS DOUBLE)) / (CAST(l.n_left AS DOUBLE) * CAST(r.n_right AS DOUBLE))), 4) AS pmi FROM m JOIN l ON split_part(m.gram, ' ', 1) = l.w1 JOIN r ON split_part(m.gram, ' ', 2) = r.w2 CROSS JOIN t WHERE m.n_pair >= 5), " +
        "k AS (SELECT *, row_number() OVER (ORDER BY pmi DESC, gram) AS rk FROM p) " +
        "SELECT gram, n_pair, n_left, n_right, pmi, CAST(rk AS INTEGER) AS rk FROM k WHERE rk <= 100 ORDER BY rk"),
    "x66_length_histogram" ->
      ("WITH d AS (SELECT coalesce(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0)), 0) AS n_toks FROM documents), " +
        "h AS (SELECT CASE WHEN n_toks = 0 THEN 0 ELSE CAST(length(bin(CAST(n_toks AS BIGINT))) AS INTEGER) END AS bucket, count(*) AS n_docs, sum(n_toks) AS n_tokens FROM d GROUP BY 1) " +
        "SELECT bucket, CASE WHEN bucket = 0 THEN CAST(0 AS BIGINT) ELSE (CAST(1 AS BIGINT) << (bucket - 1)) END AS lo_tokens, " +
        "CASE WHEN bucket = 0 THEN CAST(0 AS BIGINT) ELSE (CAST(1 AS BIGINT) << bucket) - 1 END AS hi_tokens, " +
        "CAST(n_docs AS BIGINT) AS n_docs, CAST(n_tokens AS BIGINT) AS n_tokens, " +
        "CAST(sum(n_docs) OVER w AS BIGINT) AS cum_docs, " +
        "round(CAST(sum(n_docs) OVER w AS DOUBLE) / CAST(sum(n_docs) OVER () AS DOUBLE), 4) AS cum_doc_frac, " +
        "CASE WHEN sum(n_tokens) OVER () = 0 THEN 0.0 ELSE round(CAST(sum(n_tokens) OVER w AS DOUBLE) / CAST(sum(n_tokens) OVER () AS DOUBLE), 4) END AS cum_token_frac " +
        "FROM h WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) ORDER BY bucket"),
    "x65_label_centroids" ->
      ("WITH p AS (SELECT vec_id, label, CAST(i - 1 AS INTEGER) AS pos, emb[CAST(i AS INTEGER)] AS v FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings WHERE embedding IS NOT NULL) e, unnest(range(1, len(emb) + 1)) AS t(i)), " +
        "c AS (SELECT label, pos, avg(v) AS c FROM p GROUP BY 1, 2), " +
        "d AS (SELECT vec_id, p.label, sqrt(sum((p.v - c.c) * (p.v - c.c))) AS dist FROM p JOIN c ON p.label = c.label AND p.pos = c.pos GROUP BY 1, 2), " +
        "r AS (SELECT vec_id, label, dist, percent_rank() OVER (PARTITION BY label ORDER BY round(dist, 4), vec_id) AS pct FROM d) " +
        "SELECT vec_id, label, round(dist, 4) AS dist_r, round(pct, 4) AS pct_r, (pct >= 9.5e-1) AS is_outlier FROM r ORDER BY vec_id"),
    "x64_source_report" ->
      ("WITH f AS (SELECT source, lang, n_chars, coalesce(md5(regexp_replace(lower(text), '\\s+', ' ', 'g')), 'null') AS fp, coalesce(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0)), 0) AS n_toks FROM documents), " +
        "gs AS (SELECT fp, count(*) AS n_in_group FROM f GROUP BY fp), " +
        "dom AS (SELECT source, lang AS dominant_lang FROM (SELECT source, lang, row_number() OVER (PARTITION BY source ORDER BY count(*) DESC, lang) AS rn FROM f GROUP BY source, lang) t WHERE rn = 1), " +
        "r AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(CASE WHEN n_in_group > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs, round(avg(CASE WHEN n_in_group > 1 THEN 1.0e0 ELSE 0.0e0 END), 4) AS dup_frac, CAST(sum(n_toks) AS BIGINT) AS total_tokens, round(avg(n_chars), 2) AS avg_chars, CAST(count(DISTINCT lang) AS BIGINT) AS n_langs FROM f JOIN gs USING (fp) GROUP BY source) " +
        "SELECT r.source, r.n_docs, r.n_dup_docs, r.dup_frac, r.total_tokens, r.avg_chars, r.n_langs, dom.dominant_lang FROM r LEFT JOIN dom USING (source) ORDER BY r.source"),
    "x29_dup_spans" ->
      ("WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
        "g AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 5 THEN list_transform(range(1, len(toks) - 3), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2], ' ', toks[i+3], ' ', toks[i+4])) ELSE CAST([] AS VARCHAR[]) END) AS gram FROM d), " +
        "f AS (SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram), " +
        "sc AS (SELECT g.doc_id, count(*) AS n_grams, round(avg(CASE WHEN f.df >= 2 THEN 1.0 ELSE 0.0 END), 4) AS dup_frac FROM g JOIN f USING (gram) GROUP BY g.doc_id) " +
        "SELECT d2.doc_id, CAST(coalesce(sc.n_grams, 0) AS BIGINT) AS n_grams, coalesce(sc.dup_frac, 0.0) AS dup_frac, coalesce(sc.dup_frac, 0.0) > 0.5 AS flagged " +
        "FROM (SELECT doc_id FROM documents) d2 LEFT JOIN sc USING (doc_id) ORDER BY doc_id"),
    "x19_hash_split" ->
      "WITH d AS (SELECT doc_id, CAST(list_reduce(list_prepend(0, list_transform(range(1, 5), i -> strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)), (a, b) -> a * 16 + b) % 100 AS INTEGER) AS bucket FROM documents) SELECT doc_id, bucket, CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'validation' ELSE 'test' END AS split FROM d ORDER BY doc_id",
    "x20_stratified_sample" ->
      "WITH r AS (SELECT event_type, event_id, value, row_number() OVER (PARTITION BY event_type ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn FROM events) SELECT event_type, CAST(rn AS INTEGER) AS rn, event_id, round(value, 2) AS value_r FROM r WHERE rn <= 50 ORDER BY event_type, rn",
    "t1_slice" ->
      "SELECT event_type, count(*) AS n_users, count(DISTINCT concat('[\"user_id\",', CAST(user_id AS VARCHAR), ']')) AS n_keys, round(sum(value), 2) AS sum_value FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn FROM events) t WHERE rn = 1 AND value > 10 GROUP BY event_type ORDER BY event_type",
    "o02_changelog_compact" ->
      "SELECT user_id, max_by(props, event_id) AS last_props, max(event_id) AS last_offset FROM events GROUP BY user_id ORDER BY user_id",
    "o07_snapshot_union_tail" ->
      "SELECT user_id, max_by(event_type, event_id) AS last_type, max(event_id) AS last_offset FROM (SELECT * FROM events WHERE event_id < 5000 UNION ALL SELECT * FROM events WHERE event_id >= 5000) t GROUP BY user_id ORDER BY user_id",
    "o10_changelog_source" ->
      "SELECT event_id AS \"offset\", props AS value FROM events ORDER BY \"offset\"",
    "o13_malformed_routing" ->
      "SELECT event_id, json_valid(CASE WHEN event_id % 100 = 0 THEN substr(props, 1, 3) ELSE props END) AS is_valid FROM events ORDER BY event_id",
    "x01_dedup_exact" ->
      "SELECT md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp, count(*) AS n_docs, min(doc_id) AS keep_id FROM documents GROUP BY 1 ORDER BY fp",
    "x02_doc_quality" ->
      "WITH d AS (SELECT doc_id, text, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents) SELECT doc_id, CAST(length(text) AS INTEGER) AS text_len, CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS INTEGER) AS n_word_tokens, CAST(len(toks) AS INTEGER) AS n_ws_tokens, CASE WHEN length(text) > 0 THEN round(len(regexp_extract_all(text, '[.,;:!?]')) / length(text), 4) ELSE 0.0 END AS punct_ratio, CASE WHEN len(toks) > 0 THEN round(len(list_filter(toks, t -> t IN ('the','a','and','of','to','in'))) / len(toks), 4) ELSE 0.0 END AS stopword_ratio FROM d ORDER BY doc_id",
    "x03_lang_id" ->
      "WITH d AS (SELECT doc_id, lang, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), s AS (SELECT doc_id, lang, CAST(len(list_filter(toks, t -> t IN ('the','a','and','of','to'))) AS INTEGER) AS s_en, CAST(len(list_filter(toks, t -> t IN ('der','die','das','und','ist'))) AS INTEGER) AS s_de, CAST(len(list_filter(toks, t -> t IN ('le','la','et','les','des'))) AS INTEGER) AS s_fr, CAST(len(list_filter(toks, t -> t IN ('el','los','las','y','es'))) AS INTEGER) AS s_es FROM d) SELECT doc_id, CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en' WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de' WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr' WHEN s_es > 0 THEN 'es' ELSE 'und' END AS guess_lang, s_en AS score_en, lang FROM s ORDER BY doc_id",
    "x04_trigram_jaccard" ->
      "WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), g AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])) ELSE CAST([] AS VARCHAR[]) END) AS tg FROM d) SELECT a.doc_id AS d1, b.doc_id AS d2, CASE WHEN len(list_distinct(list_concat(a.tg, b.tg))) = 0 THEN 0.0 ELSE round(len(list_filter(a.tg, x -> list_contains(b.tg, x))) / len(list_distinct(list_concat(a.tg, b.tg))), 4) END AS jaccard FROM g a JOIN g b ON a.doc_id + 1 = b.doc_id ORDER BY d1",
    "x05_minhash_signatures" ->
      "WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), g AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])) ELSE CAST([] AS VARCHAR[]) END) AS tg FROM d), g2 AS (SELECT doc_id, list_transform(tg, sh -> md5(sh)) AS tgh FROM g WHERE len(tg) > 0), b AS (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS band) SELECT doc_id, band, list_min(list_transform(tgh, h -> substr(h, band * 4 + 1, 4))) AS min_hash FROM g2 CROSS JOIN b ORDER BY doc_id, band",
    "x06_neardup_pairs" ->
      "WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), g AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])) ELSE CAST([] AS VARCHAR[]) END) AS tg FROM d), g2 AS (SELECT doc_id, list_transform(tg, sh -> md5(sh)) AS tgh FROM g WHERE len(tg) > 0), b AS (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS band), sig AS (SELECT doc_id, band, list_min(list_transform(tgh, h -> substr(h, band * 4 + 1, 4))) AS min_hash FROM g2 CROSS JOIN b), ok AS (SELECT band, min_hash FROM sig GROUP BY band, min_hash HAVING count(*) BETWEEN 2 AND 256) SELECT DISTINCT a.doc_id AS d1, b2.doc_id AS d2 FROM sig a JOIN sig b2 ON a.band = b2.band AND a.min_hash = b2.min_hash AND a.doc_id < b2.doc_id JOIN ok ON a.band = ok.band AND a.min_hash = ok.min_hash ORDER BY d1, d2",
    "x14_simhash_neardups" ->
      "WITH t AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), tk -> length(tk) > 0)) AS token FROM documents), h AS (SELECT doc_id, md5(token) AS hx FROM t), b AS (SELECT doc_id, hx, CAST(unnest(range(0, 32)) AS INTEGER) AS bit FROM h), v AS (SELECT doc_id, bit, sum(CASE WHEN substr(hx, bit + 1, 1) IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END) AS votes FROM b GROUP BY doc_id, bit), sig AS (SELECT doc_id, CAST(sum(CASE WHEN votes > 0 THEN CAST(power(2, bit) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash32 FROM v GROUP BY doc_id), bb AS (SELECT doc_id, simhash32, band, (simhash32 >> (band * 8)) & 255 AS band_bits FROM sig CROSS JOIN (SELECT CAST(unnest(range(0, 4)) AS INTEGER) AS band) bands), ok AS (SELECT band, band_bits FROM bb GROUP BY band, band_bits HAVING count(*) BETWEEN 2 AND 256) SELECT DISTINCT a.doc_id AS d1, b2.doc_id AS d2, CAST(bit_count(xor(a.simhash32, b2.simhash32)) AS INTEGER) AS hamming FROM bb a JOIN bb b2 ON a.band = b2.band AND a.band_bits = b2.band_bits AND a.doc_id < b2.doc_id JOIN ok ON a.band = ok.band AND a.band_bits = ok.band_bits WHERE bit_count(xor(a.simhash32, b2.simhash32)) <= 3 ORDER BY d1, d2",
    "x10_embedding_neardups" -> x10OracleSql,
    "x09_ann_lsh" -> x09OracleSql,
    "x09b_ann_lsh_multi" -> x09bOracleSql,
    "x15_rolling_fingerprint" ->
      "WITH f AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(text) + 1), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) % 274876858367) AS fp64 FROM documents) SELECT fp64, count(*) AS n_docs, min(doc_id) AS keep_id FROM f GROUP BY fp64 ORDER BY fp64",
    "x16_verified_neardups" ->
      s"WITH $verifiedPairsCte SELECT d1, d2, jaccard FROM vp ORDER BY d1, d2",
    "x26_dup_clusters" -> x26OracleSql,
    "x32_bm25_topk" -> x32OracleSql,
    // x79 streams half the corpus into a maintained text index and
    // searches the standing terms — the result is DEFINED to equal the
    // batch x32 scorer on the full corpus, so it shares x32's oracle
    "x79_incremental_bm25" -> x32OracleSql,
    // x92 re-serves x79's index from a RESTARTED maintainer — same
    // defined result, so the reopen path shares the oracle verbatim
    "x92_text_reopen_serve" -> x32OracleSql,
    // x96 shares x32/x79's oracle VERBATIM: the lease-free reader handle
    // must serve exactly what the batch scorer computes over the full
    // corpus (the x92 pattern minus the lease)
    "x96_text_reader_serve" -> x32OracleSql,
    // x84 deletes the doc_id % 8 == 1 slice after indexing everything —
    // the post-major search is DEFINED to equal the batch scorer over
    // the remaining corpus
    "x84_text_index_delete" -> x84OracleSql,
    // x101 shares x84's oracle VERBATIM: the delete lifecycle searched
    // INSIDE the tombstoned-tier window (pre-major) must already equal
    // the batch scorer over corpus − deleted — the serve-time stats
    // resolution closes the round-18 `weak`
    "x101_text_tombstone_serve" -> x84OracleSql,
    // x102 shares x84's oracle VERBATIM too: the ASSEMBLED retrieval
    // service (control topic → GraftSystem → changelog streams → both
    // pillars → bulk control-topic takedown of the same pmod-8 slice →
    // no-op re-ingest drain) must converge on exactly the same final
    // text-pillar serve — the x100 pattern on the indexing composition
    "x102_assembled_retrieval" -> x84OracleSql,
    "x85_ann_index_delete" -> AnnOracleSql.x85OracleSql,
    // x103 shares x85's oracle VERBATIM (x102's pattern on the DENSE
    // pillar — the half x102 left to soak gating): the ASSEMBLED
    // retrieval service with a feature-store vectorSource, driven
    // through the running control-topic streams (delta ingest → bulk
    // takedown of the same pmod-8 slice + queue handover → no-op
    // re-ingest drain), must serve exactly the seed-trained batch
    // IVFADC topology over members − deleted
    "x103_assembled_dense_serve" -> AnnOracleSql.x85OracleSql,
    // x104 composes the two gated halves: x71's kept-CTE chain feeding
    // the x32 scorer — the curate-then-index platform handoff
    "x104_curated_text_serve" -> x104OracleSql,
    // the shadow major is DEFINED to be logically invisible: the
    // compacted serve must hash-match the same oracle as the tiered one
    "x86_ann_shadow_compact" -> AnnOracleSql.x85OracleSql,
    "x87_text_shadow_compact" -> x84OracleSql,
    // the shadow-retrain lifecycle resolves to the x31 batch topology
    // (train on the full grown corpus, pinned demo budget) — the SAME
    // oracle, verbatim: a swap defect breaks x88 while x31 stays green
    "x88_ann_retrain" -> AnnOracleSql.x31OracleSql,
    // x89: the exact-dedup takedown lifecycle recomputed relationally —
    // per-window min-keeper folds; removal of exactly the fps whose
    // WINNER id is requested (loser ids are no-ops); window 2 re-accepts
    // of deleted fps read the index as absent ("new") but are dropped by
    // the major they ride into (the documented epoch rule)
    "x89_dedup_takedown" -> x89OracleSql,
    // the exact-dedup SHADOW major is DEFINED to be logically invisible:
    // the raw-tier fold (tombstone wins its min group, GC filter,
    // sidecar rebuild) must hash-match x89's blocking-major oracle
    "x94_dedup_shadow_compact" -> x89OracleSql,
    // likewise the near-dup shadow major vs x91's blocking form
    "x95_neardup_shadow_compact" -> x91OracleSql,
    "x33_inverted_index" -> x33OracleSql,
    "d33_stats_moments" ->
      "SELECT event_type, count(*) AS n, round(stddev_pop(value), 4) AS sd_pop, round(stddev_samp(value), 4) AS sd_samp, round(var_pop(value), 4) AS v_pop, round(var_samp(value), 4) AS v_samp, round(corr(value, h), 4) AS corr_vh, round(covar_pop(value, h), 4) AS cov_pop, round(covar_samp(value, h), 4) AS cov_samp, round(regr_slope(value, h), 4) AS slope, round(regr_intercept(value, h), 4) AS intercept FROM (SELECT event_type, value, CAST(hour(ts) AS DOUBLE) AS h FROM events) t GROUP BY event_type ORDER BY event_type",
    // d34's oracle is the CONTAINMENT form: DuckDB recomputes the exact
    // band edges (quantile_cont parity, d23's pattern) and asserts every
    // sketch verdict came out true — the approximate values themselves are
    // audited by the Spark-side ok flags, which the hash compare pins.
    "d34_approx_percentiles" ->
      ("SELECT event_type, " +
        "round(quantile_cont(value, 0.49), 2) AS lo50, round(quantile_cont(value, 0.51), 2) AS hi50, TRUE AS ok50, " +
        "round(quantile_cont(value, 0.89), 2) AS lo90, round(quantile_cont(value, 0.91), 2) AS hi90, TRUE AS ok90, " +
        "round(quantile_cont(value, 0.98), 2) AS lo99, round(quantile_cont(value, 1.0), 2) AS hi99, TRUE AS ok99 " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "x37_bpe_merges" -> x37OracleSql,
    "x37b_bpe_merges_scaled" -> x37bOracleSql,
    "x55_bpe_tokenize" -> x55OracleSql,
    "x55b_bpe_tokenize_full" -> x55bOracleSql,
    "x05b_minhash_fast" -> x05bOracleSql,
    "x06b_neardup_fast" -> x06bOracleSql,
    "x07_simhash" -> x07OracleSql,
    // x77 oracle: same md5 hex-fold bucket, add-one smoothed bucket models,
    // the 256-row floor-quantized log-ratio table, exact-integer per-doc
    // dot product, top-N on the integer score
    "x77_dsir_select" ->
      ("WITH d AS (SELECT doc_id, source, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
        "fe AS (SELECT doc_id, source, unnest(list_concat(toks, CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)), i -> concat(toks[i], ' ', toks[i+1])) ELSE CAST([] AS VARCHAR[]) END)) AS f FROM d), " +
        "fb AS (SELECT doc_id, source, CAST(list_reduce(list_prepend(0, list_transform(range(1, 5), i -> strpos('0123456789abcdef', substr(md5(f), i, 1)) - 1)), (a, b) -> a * 16 + b) % 256 AS INTEGER) AS bucket FROM fe), " +
        "h AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cr, CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ct FROM fb GROUP BY bucket), " +
        "t AS (SELECT CAST(sum(cr) AS BIGINT) AS crt, CAST(sum(ct) AS BIGINT) AS ctt FROM h), " +
        "lq AS (SELECT bucket, CAST(floor((ln(CAST(ct + 1 AS DOUBLE) / CAST(ctt + 256 AS DOUBLE)) - ln(CAST(cr + 1 AS DOUBLE) / CAST(crt + 256 AS DOUBLE))) * 1.0e6) AS BIGINT) AS lq FROM h CROSS JOIN t), " +
        "pdb AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS c FROM fb GROUP BY doc_id, bucket), " +
        "sc AS (SELECT pdb.doc_id, CAST(sum(c) AS BIGINT) AS n_feats, CAST(sum(c * lq.lq) AS BIGINT) AS score_q FROM pdb JOIN lq ON pdb.bucket = lq.bucket GROUP BY pdb.doc_id), " +
        "al AS (SELECT dd.doc_id, coalesce(sc.n_feats, 0) AS n_feats, coalesce(sc.score_q, 0) AS score_q FROM documents dd LEFT JOIN sc ON dd.doc_id = sc.doc_id), " +
        "top AS (SELECT * FROM al ORDER BY score_q DESC, doc_id LIMIT 100) " +
        "SELECT CAST(row_number() OVER (ORDER BY score_q DESC, doc_id) AS INTEGER) AS rank, doc_id, n_feats, round(CAST(score_q AS DOUBLE) / 1.0e6, 4) AS log_weight FROM top ORDER BY rank"),
    "x77b_dsir_select_fast" ->
      ("WITH RECURSIVE d AS (SELECT doc_id, source, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
        "fe AS (SELECT doc_id, source, unnest(list_concat(toks, CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)), i -> concat(toks[i], ' ', toks[i+1])) ELSE CAST([] AS VARCHAR[]) END)) AS f FROM d), " +
        "strs AS (SELECT DISTINCT f AS s FROM fe), " +
        XxhashSql.xxh64StrCtes("strs") + ", " +
        s"fb AS (SELECT doc_id, source, CAST((((${XxhashSql.signed("xh.hu")}) % 256 + 256) % 256) AS INTEGER) AS bucket FROM fe JOIN xh ON fe.f = xh.s), " +
        "h AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cr, CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ct FROM fb GROUP BY bucket), " +
        "t AS (SELECT CAST(sum(cr) AS BIGINT) AS crt, CAST(sum(ct) AS BIGINT) AS ctt FROM h), " +
        "lq AS (SELECT bucket, CAST(floor((ln(CAST(ct + 1 AS DOUBLE) / CAST(ctt + 256 AS DOUBLE)) - ln(CAST(cr + 1 AS DOUBLE) / CAST(crt + 256 AS DOUBLE))) * 1.0e6) AS BIGINT) AS lq FROM h CROSS JOIN t), " +
        "pdb AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS c FROM fb GROUP BY doc_id, bucket), " +
        "sc AS (SELECT pdb.doc_id, CAST(sum(c) AS BIGINT) AS n_feats, CAST(sum(c * lq.lq) AS BIGINT) AS score_q FROM pdb JOIN lq ON pdb.bucket = lq.bucket GROUP BY pdb.doc_id), " +
        "al AS (SELECT dd.doc_id, coalesce(sc.n_feats, 0) AS n_feats, coalesce(sc.score_q, 0) AS score_q FROM documents dd LEFT JOIN sc ON dd.doc_id = sc.doc_id), " +
        "top AS (SELECT * FROM al ORDER BY score_q DESC, doc_id LIMIT 100) " +
        "SELECT CAST(row_number() OVER (ORDER BY score_q DESC, doc_id) AS INTEGER) AS rank, doc_id, n_feats, round(CAST(score_q AS DOUBLE) / 1.0e6, 4) AS log_weight FROM top ORDER BY rank"),
    "x78_gopher_rules" ->
      ("WITH d AS (SELECT doc_id, text, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
        "b AS (SELECT doc_id, " +
        "CAST(coalesce(len(toks), 0) AS BIGINT) AS n_words, " +
        "round(CASE WHEN len(toks) > 0 THEN CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(toks, t -> CAST(length(t) AS BIGINT))), (a, b) -> a + b) AS DOUBLE) / len(toks) ELSE 0.0e0 END, 4) AS mean_word_len, " +
        "coalesce(CAST(length(text) - length(regexp_replace(text, '#', '', 'g')) AS BIGINT) + CAST((length(text) - length(regexp_replace(text, '\\.\\.\\.', '', 'g'))) / 3 AS BIGINT), 0) AS n_symbols, " +
        "round(CASE WHEN len(toks) > 0 THEN CAST(CAST(length(text) - length(regexp_replace(text, '#', '', 'g')) AS BIGINT) + CAST((length(text) - length(regexp_replace(text, '\\.\\.\\.', '', 'g'))) / 3 AS BIGINT) AS DOUBLE) / len(toks) ELSE 0.0e0 END, 4) AS symbol_ratio, " +
        "CAST(coalesce(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))), 0) AS BIGINT) AS n_alpha_words, " +
        "CAST(coalesce(len(list_intersect(list_distinct(toks), ['the','a'])), 0) AS BIGINT) AS n_stop_hits FROM d), " +
        "r AS (SELECT *, " +
        "n_words >= 50 AND n_words <= 100000 AS ok_words, " +
        "mean_word_len >= 3.0e0 AND mean_word_len <= 1.0e1 AS ok_wlen, " +
        "symbol_ratio < 1.0e-1 AS ok_symbols, " +
        "n_words > 0 AND CAST(n_alpha_words AS DOUBLE) >= CAST(n_words AS DOUBLE) * 8.0e-1 AS ok_alpha, " +
        "n_stop_hits >= 2 AS ok_stops FROM b) " +
        "SELECT doc_id, n_words, mean_word_len, n_symbols, symbol_ratio, n_alpha_words, n_stop_hits, ok_words, ok_wlen, ok_symbols, ok_alpha, ok_stops, " +
        "ok_words AND ok_wlen AND ok_symbols AND ok_alpha AND ok_stops AS keep FROM r ORDER BY doc_id"),
    "x13_ann_ivf" -> AnnOracleSql.x13OracleSql,
    "x30_pq_ann" -> AnnOracleSql.x30OracleSql,
    "x31_ivfadc_ann" -> AnnOracleSql.x31OracleSql,
    // x80 streams half the embeddings into a maintained ANN index (model
    // trained on the seed half) and searches the grown corpus — the
    // oracle recomputes both k-means stages seed-restricted in SQL
    "x80_incremental_ivfadc" -> AnnOracleSql.x80OracleSql,
    // x93 re-serves x80's index from a RESTARTED maintainer — same
    // defined result, so the reopen path shares the oracle verbatim
    "x93_ann_reopen_serve" -> AnnOracleSql.x80OracleSql,
    // x97 shares x80's oracle VERBATIM (the reader-serve twin of x93)
    "x97_ann_reader_serve" -> AnnOracleSql.x80OracleSql,
    "x81_maintained_hybrid" -> x81OracleSql,
    // x82 screens the held-out quarter against the maintained index
    // (seed-trained model, encode restricted to index members) with the
    // SemDeDup distance-threshold verdict
    "x82_semantic_screen" -> AnnOracleSql.x82OracleSql,
    // x83 replays the admission loop: screen A vs the seed members,
    // admit A's novels, screen B vs the grown membership — B's verdicts
    // cascade from A's admissions, all over one shared encode
    "x83_admission_screen" -> AnnOracleSql.x83OracleSql,
    "x36_least_squares" -> x36OracleSql,
    "x34_semantic_dedup" -> x34OracleSql,
    "x35_bloom_decontaminate" -> x35OracleSql,
    "x38_cms_heavy_hitters" -> x38OracleSql,
    "x41_hybrid_rrf" -> x41OracleSql,
    "x42_cdc_chunks" -> x42OracleSql,
    "x44_chunk_neardups" ->
      (s"WITH c0 AS ($x42OracleSql), " +
        "c AS (SELECT DISTINCT doc_id, chunk_fp FROM c0), " +
        "sz AS (SELECT doc_id, count(*) AS n FROM c GROUP BY doc_id), " +
        "ok AS (SELECT chunk_fp FROM c GROUP BY chunk_fp HAVING count(*) BETWEEN 2 AND 256), " +
        "sh AS (SELECT c.doc_id, c.chunk_fp FROM c JOIN ok ON c.chunk_fp = ok.chunk_fp), " +
        "p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared FROM sh a JOIN sh b ON a.chunk_fp = b.chunk_fp AND a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id) " +
        "SELECT d1, d2, n_shared, jaccard FROM (SELECT p.d1, p.d2, p.n_shared, round(p.n_shared / (s1.n + s2.n - p.n_shared), 4) AS jaccard " +
        "FROM p JOIN sz s1 ON p.d1 = s1.doc_id JOIN sz s2 ON p.d2 = s2.doc_id) t " +
        "WHERE jaccard >= 0.5 ORDER BY d1, d2"),
    "x43_chunk_dedup_stats" ->
      (s"WITH c AS ($x42OracleSql), " +
        "g AS (SELECT chunk_fp, count(*) AS cnt, min(chunk_len) AS len FROM c GROUP BY chunk_fp) " +
        "SELECT CAST(sum(cnt) AS BIGINT) AS n_chunks, CAST(count(*) AS BIGINT) AS n_distinct, " +
        "CAST(sum(cnt * len) AS BIGINT) AS total_cp, CAST(sum(len) AS BIGINT) AS unique_cp, " +
        "round(1.0e0 - CAST(sum(len) AS DOUBLE) / CAST(sum(cnt * len) AS DOUBLE), 4) AS saved_frac FROM g"),
    "x39_curation_pipeline" -> x39OracleSql,
    "d35_lateral_topn" ->
      "SELECT c_custkey, c_name, t.o_orderkey, t.total_r FROM customer c JOIN LATERAL (SELECT o_orderkey, round(o_totalprice, 2) AS total_r FROM orders o WHERE o.o_custkey = c.c_custkey ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t ON true WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey, total_r DESC, o_orderkey",
    "d36_outliers" ->
      "SELECT event_id, event_type, round(value, 2) AS value_r, round((value - avg(value) OVER (PARTITION BY event_type)) / stddev_samp(value) OVER (PARTITION BY event_type), 4) AS z, abs((value - avg(value) OVER (PARTITION BY event_type)) / stddev_samp(value) OVER (PARTITION BY event_type)) > 2.5e0 AS is_outlier FROM events ORDER BY event_id",
    "d39_funnel" ->
      ("WITH cnt AS (SELECT user_id, CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks, CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases FROM events GROUP BY user_id), " +
        "conv AS (SELECT DISTINCT c.user_id FROM events c JOIN events p ON p.user_id = c.user_id AND c.event_type = 'click' AND p.event_type = 'purchase' AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 3600 SECONDS) " +
        "SELECT cnt.user_id, n_clicks, n_purchases, conv.user_id IS NOT NULL AS converted FROM cnt LEFT JOIN conv ON cnt.user_id = conv.user_id WHERE n_clicks > 0 ORDER BY cnt.user_id"),
    "d38_winsorize" ->
      "WITH b AS (SELECT event_type, quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi FROM events GROUP BY event_type) SELECT event_id, e.event_type, round(value, 2) AS value_r, round(greatest(lo, least(hi, value)), 2) AS winsorized, (value < lo OR value > hi) AS clamped FROM events e JOIN b ON e.event_type = b.event_type ORDER BY event_id",
    "d37_gap_fill" ->
      ("WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n, round(sum(value), 2) AS sum_value FROM events WHERE event_type = 'error' AND value > 185 GROUP BY 1), " +
        "b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily), " +
        "spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b) " +
        "SELECT spine.day, CAST(coalesce(daily.n, 0) AS BIGINT) AS n, coalesce(daily.sum_value, 0.0) AS sum_value FROM spine LEFT JOIN daily ON spine.day = daily.day ORDER BY spine.day"),
    "d40_ntile" ->
      "SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS total_r, CAST(ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile FROM orders ORDER BY o_orderpriority, o_orderkey",
    "d42_retention_cohorts" ->
      ("WITH e AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events), " +
        "f AS (SELECT user_id, min(day) AS first_day FROM e GROUP BY user_id), " +
        "a AS (SELECT DISTINCT user_id, day FROM e) " +
        "SELECT first_day, CAST(datediff('day', first_day, day) AS INTEGER) AS day_offset, CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users " +
        "FROM a JOIN f USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2"),
    "d41_forward_asof" ->
      "WITH u AS (SELECT user_id, ts, event_id, CAST(NULL AS BIGINT) AS click_id, CAST(NULL AS DOUBLE) AS click_value, 0 AS side FROM events WHERE event_type = 'purchase' UNION ALL SELECT user_id, ts, CAST(NULL AS BIGINT), event_id, value, 1 FROM events WHERE event_type = 'click'), m AS (SELECT user_id, event_id, side, first_value(click_id IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, side, click_id NULLS FIRST ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_click_id, round(first_value(click_value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, side, click_id NULLS FIRST ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 2) AS next_click_value FROM u) SELECT user_id, event_id, next_click_id, next_click_value FROM m WHERE side = 0 ORDER BY event_id",
    "x50_quality_tiers" ->
      "WITH d AS (SELECT doc_id, lang, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), q AS (SELECT doc_id, lang, CASE WHEN len(toks) > 0 THEN round(len(list_filter(toks, t -> t IN ('the','a','and','of','to','in'))) / len(toks), 4) ELSE 0.0 END AS stop_r FROM d) SELECT doc_id, lang, stop_r, CAST(ntile(10) OVER (PARTITION BY lang ORDER BY stop_r DESC, doc_id) AS INTEGER) AS tier FROM q ORDER BY doc_id",
    "x51_dup_pagerank" -> x51OracleSql,
    "x56_context_windows" ->
      ("WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks, len(list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0)) AS n FROM documents), " +
        "w AS (SELECT doc_id, toks, CAST(i AS INTEGER) AS win_no FROM d, unnest(range(0, CAST(floor((greatest(n - 64, 0) + 47) / 48) + 1 AS BIGINT))) AS t(i) WHERE n > 0) " +
        "SELECT doc_id, win_no, CAST(win_no * 48 AS BIGINT) AS start_tok, CAST(len(list_slice(toks, win_no * 48 + 1, win_no * 48 + 64)) AS INTEGER) AS n_win_tokens, md5(list_aggregate(list_slice(toks, win_no * 48 + 1, win_no * 48 + 64), 'string_agg', ' ')) AS win_hash FROM w ORDER BY doc_id, win_no"),
    "x52_cluster_split" -> x52OracleSql,
    "x71_pretrain_pipeline" -> x71OracleSql,
    // x100 shares x71's kept-CTE chain verbatim, with the assembled
    // run's takedown id-mapping epilogue: the ASSEMBLED service (control
    // topic → GraftSystem → per-queue changelog streams → curation
    // composition → control-topic takedown → clone admission → original
    // re-ingest) must converge on exactly the relationally-recomputed
    // final corpus — a dropped batch, a dropped/misrouted takedown, or a
    // torn serve breaks this hash while x71 stays green
    "x100_assembled_curation" -> x100OracleSql,
    "x74_negative_samples" -> x74OracleSql,
    "x75_reshard_plan" -> x75OracleSql,
    "x76_minhash_calibration" ->
      ("WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
        "g AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])) ELSE CAST([] AS VARCHAR[]) END) AS tg FROM d), " +
        "g2 AS (SELECT doc_id, list_transform(tg, sh -> md5(sh)) AS tgh FROM g WHERE len(tg) > 0), " +
        "b AS (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS band), " +
        "sig AS (SELECT doc_id, band, list_min(list_transform(tgh, h -> substr(h, band * 4 + 1, 4))) AS min_hash FROM g2 CROSS JOIN b), " +
        "ok AS (SELECT band, min_hash FROM sig GROUP BY band, min_hash HAVING count(*) BETWEEN 2 AND 256), " +
        "p AS (SELECT DISTINCT a.doc_id AS d1, b2.doc_id AS d2 FROM sig a JOIN sig b2 ON a.band = b2.band AND a.min_hash = b2.min_hash AND a.doc_id < b2.doc_id JOIN ok ON a.band = ok.band AND a.min_hash = ok.min_hash), " +
        "agree AS (SELECT p.d1, p.d2, CAST(sum(CASE WHEN s1.min_hash = s2.min_hash THEN 1 ELSE 0 END) AS BIGINT) AS n_agree FROM p JOIN sig s1 ON s1.doc_id = p.d1 JOIN sig s2 ON s2.doc_id = p.d2 AND s2.band = s1.band GROUP BY p.d1, p.d2), " +
        "sc AS (SELECT agree.n_agree, CASE WHEN len(list_distinct(list_concat(ga.tg, gb.tg))) = 0 THEN 0.0 ELSE round(len(list_filter(ga.tg, x -> list_contains(gb.tg, x))) / len(list_distinct(list_concat(ga.tg, gb.tg))), 4) END AS jaccard FROM agree JOIN g ga ON ga.doc_id = agree.d1 JOIN g gb ON gb.doc_id = agree.d2), " +
        "u AS (SELECT n_agree, CAST(round(jaccard * 1.0e4, 0) AS BIGINT) AS j4 FROM sc), " +
        "a2 AS (SELECT n_agree, CAST(count(*) AS BIGINT) AS n_pairs, CAST(sum(j4) AS BIGINT) AS sj4, CAST(sum(abs(n_agree * 1250 - j4)) AS BIGINT) AS se4 FROM u GROUP BY n_agree) " +
        "SELECT n_agree, n_pairs, round(CAST(sj4 AS DOUBLE) / (1.0e4 * CAST(n_pairs AS DOUBLE)), 4) AS mean_jaccard, round(CAST(se4 AS DOUBLE) / (1.0e4 * CAST(n_pairs AS DOUBLE)), 4) AS mean_abs_err FROM a2 ORDER BY n_agree"),
    "x57_priority_dedup" ->
      ("WITH p AS (SELECT md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp, doc_id, source, " +
        "(CAST(CASE WHEN source = 'src1' THEN 0 WHEN source = 'src0' THEN 1 ELSE 2 END AS BIGINT) * 17592186044416 + doc_id) AS rank_key FROM documents) " +
        "SELECT fp, CAST(count(*) AS BIGINT) AS n_docs, min_by(doc_id, rank_key) AS keep_id, min_by(source, rank_key) AS keep_source FROM p GROUP BY fp ORDER BY fp"),
    "x58_corpus_shuffle" ->
      ("WITH d AS (SELECT doc_id, md5('graft:' || CAST(doc_id AS VARCHAR)) AS order_key FROM documents), " +
        "s AS (SELECT doc_id, order_key, CAST(list_reduce(list_prepend(0, list_transform(range(1, 5), i -> strpos('0123456789abcdef', substr(order_key, i, 1)) - 1)), (a, b) -> a * 16 + b) % 8 AS INTEGER) AS shard FROM d) " +
        "SELECT shard, CAST(row_number() OVER (PARTITION BY shard ORDER BY order_key, doc_id) AS INTEGER) AS pos, doc_id, order_key FROM s ORDER BY shard, pos"),
    "x59_incremental_dedup" -> x59OracleSql,
    // x98 shares x59's oracle VERBATIM: the lease-free reader handle's
    // classify over the seeded fp index must produce exactly the
    // incremental screen's verdicts
    "x98_dedup_reader_classify" -> x59OracleSql,
    "x60_length_outliers" ->
      ("WITH p AS (SELECT doc_id, lang, n_chars, percent_rank() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS pct FROM documents) " +
        "SELECT doc_id, lang, n_chars, round(pct, 4) AS pct_r, (pct >= 5.0e-2 AND pct <= 9.5e-1) AS is_kept FROM p ORDER BY doc_id"),
    "x61_zipf_fit" ->
      ("WITH tf AS (SELECT t AS term, count(*) AS cnt FROM documents, unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> length(x) > 0)) AS u(t) GROUP BY 1), " +
        "top AS (SELECT term, cnt FROM tf ORDER BY cnt DESC, term LIMIT 1000), " +
        "r AS (SELECT ln(CAST(row_number() OVER (ORDER BY cnt DESC, term) AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y FROM top), " +
        "g AS (SELECT CAST(count(*) AS DOUBLE) AS n, CAST(count(*) AS BIGINT) AS n_terms, sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx, sum(x*y) AS sxy FROM r) " +
        "SELECT n_terms, round((n*sxy - sx*sy)/(n*sxx - sx*sx), 4) AS slope, round((sy - ((n*sxy - sx*sy)/(n*sxx - sx*sx))*sx)/n, 4) AS intercept FROM g"),
    "x53_source_overlap" -> x53OracleSql,
    "x62_incremental_neardup" -> x62OracleSql,
    "x90_neardup_screen" -> x62OracleSql,
    // x99 shares x62/x90's oracle VERBATIM (the reader-serve screen)
    "x99_neardup_reader_screen" -> x62OracleSql,
    "x91_neardup_takedown" -> x91OracleSql,
    "x54_span_removal" ->
      ("WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
        "gi AS (SELECT doc_id, i AS pos, concat(toks[i], ' ', toks[i+1], ' ', toks[i+2], ' ', toks[i+3], ' ', toks[i+4]) AS gram FROM d, unnest(range(1, len(toks) - 3)) AS t(i) WHERE len(toks) >= 5), " +
        "df AS (SELECT gram FROM gi GROUP BY gram HAVING count(DISTINCT doc_id) >= 2), " +
        "cov AS (SELECT DISTINCT gi.doc_id, p FROM gi JOIN df ON gi.gram = df.gram, unnest(range(gi.pos, gi.pos + 5)) AS u(p)), " +
        "tokpos AS (SELECT doc_id, i AS pos, toks[i] AS tok FROM d, unnest(range(1, len(toks) + 1)) AS t(i)), " +
        "kept AS (SELECT t.doc_id, t.pos, t.tok FROM tokpos t LEFT JOIN cov ON t.doc_id = cov.doc_id AND t.pos = cov.p WHERE cov.p IS NULL), " +
        "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept, string_agg(tok, ' ' ORDER BY pos) AS cleaned FROM kept GROUP BY doc_id) " +
        "SELECT d.doc_id, CAST(coalesce(len(d.toks), 0) AS BIGINT) AS n_tokens, CAST(coalesce(len(d.toks), 0) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed, coalesce(agg.cleaned, '') AS cleaned FROM d LEFT JOIN agg ON d.doc_id = agg.doc_id ORDER BY d.doc_id"),
    "x73_hashed_features" ->
      ("WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
        "t AS (SELECT doc_id, unnest(toks) AS term FROM d), " +
        "h AS (SELECT doc_id, CAST(list_reduce(list_prepend(0, list_transform(range(1, 5), i -> strpos('0123456789abcdef', substr(md5(term), i, 1)) - 1)), (a, b) -> a * 16 + b) % 64 AS INTEGER) AS bucket FROM t), " +
        "g1 AS (SELECT doc_id, bucket, count(*) AS v FROM h GROUP BY 1, 2), " +
        "g2 AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS n_tokens, CAST(sum(v * v) AS BIGINT) AS norm_sq FROM g1 GROUP BY 1), " +
        "dense AS (SELECT g.doc_id, CAST(i AS INTEGER) AS bucket FROM (SELECT DISTINCT doc_id FROM g1) g, unnest(range(0, 64)) AS u(i)), " +
        "vv AS (SELECT dense.doc_id, dense.bucket, coalesce(g1.v, 0) AS v FROM dense LEFT JOIN g1 ON dense.doc_id = g1.doc_id AND dense.bucket = g1.bucket), " +
        "vs AS (SELECT doc_id, string_agg(CAST(v AS VARCHAR), ',' ORDER BY bucket) AS vec FROM vv GROUP BY doc_id) " +
        "SELECT d.doc_id, coalesce(g2.n_tokens, 0) AS n_tokens, coalesce(g2.norm_sq, 0) AS norm_sq, coalesce(vs.vec, repeat('0,', 63) || '0') AS vec " +
        "FROM d LEFT JOIN g2 ON d.doc_id = g2.doc_id LEFT JOIN vs ON d.doc_id = vs.doc_id ORDER BY d.doc_id"),
    "x72_score_calibration" ->
      ("WITH d AS (SELECT source, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
        "sc AS (SELECT source, CASE WHEN len(toks) > 0 THEN round(len(list_filter(toks, t -> t IN ('the','a','and','of','to','in'))) / len(toks), 4) ELSE 0.0 END AS score FROM d), " +
        "h AS (SELECT source, score, count(*) AS n_sv FROM sc GROUP BY 1, 2), " +
        "g AS (SELECT score, sum(n_sv) AS n_v FROM h GROUP BY 1), " +
        "g2 AS (SELECT score, coalesce(sum(n_v) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_g, sum(n_v) OVER () AS n_total FROM g), " +
        "s2 AS (SELECT source, score, n_sv, coalesce(sum(n_sv) OVER (PARTITION BY source ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_s, sum(n_sv) OVER (PARTITION BY source) AS n_s FROM h), " +
        "j AS (SELECT s2.source, s2.n_sv, s2.n_s, CAST(s2.cum_s AS DOUBLE) / CAST(s2.n_s AS DOUBLE) AS fs, CAST(g2.cum_g AS DOUBLE) / CAST(g2.n_total AS DOUBLE) AS fg FROM s2 JOIN g2 ON s2.score = g2.score) " +
        "SELECT source, CAST(max(n_s) AS BIGINT) AS n_docs, round(sum(CAST(n_sv AS DOUBLE) * abs(fs - fg)) / CAST(max(n_s) AS DOUBLE), 4) AS drift, round(sum(CAST(n_sv AS DOUBLE) * (fg - fs)) / CAST(max(n_s) AS DOUBLE), 4) AS bias FROM j GROUP BY source ORDER BY source"),
    "x70_distinctive_terms" ->
      ("WITH t AS (SELECT source, unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> length(x) > 0)) AS term FROM documents), " +
        "tf AS (SELECT source, term, count(*) AS c FROM t GROUP BY 1, 2), " +
        "tw AS (SELECT term, sum(c) AS cw FROM tf GROUP BY 1), " +
        "st AS (SELECT source, sum(c) AS ns FROM tf GROUP BY 1), " +
        "n AS (SELECT sum(c) AS n FROM tf), " +
        "sc AS (SELECT tf.source, tf.term, CAST(tf.c AS BIGINT) AS c, round(ln((CAST(tf.c AS DOUBLE) + 1.0e0) / (CAST(st.ns AS DOUBLE) - CAST(tf.c AS DOUBLE) + 1.0e0)) - ln((CAST(tw.cw AS DOUBLE) - CAST(tf.c AS DOUBLE) + 1.0e0) / (CAST(n.n AS DOUBLE) - CAST(st.ns AS DOUBLE) - (CAST(tw.cw AS DOUBLE) - CAST(tf.c AS DOUBLE)) + 1.0e0)), 4) AS log_odds FROM tf JOIN tw ON tf.term = tw.term JOIN st ON tf.source = st.source CROSS JOIN n WHERE tf.c >= 5), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY log_odds DESC, term) AS rk FROM sc) " +
        "SELECT source, CAST(rk AS INTEGER) AS rk, term, c, log_odds FROM r WHERE rk <= 5 ORDER BY source, rk"),
    "x69_containment_screen" ->
      ("WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
        "g AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])) ELSE CAST([] AS VARCHAR[]) END) AS tg FROM d), " +
        "g2 AS (SELECT doc_id, list_transform(tg, sh -> md5(sh)) AS tgh FROM g WHERE len(tg) > 0), " +
        "b AS (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS band), " +
        "sig AS (SELECT doc_id, band, list_min(list_transform(tgh, h -> substr(h, band * 4 + 1, 4))) AS min_hash FROM g2 CROSS JOIN b), " +
        "ok AS (SELECT band, min_hash FROM sig GROUP BY band, min_hash HAVING count(*) BETWEEN 2 AND 256), " +
        "p AS (SELECT DISTINCT a.doc_id AS d1, b2.doc_id AS d2 FROM sig a JOIN sig b2 ON a.band = b2.band AND a.min_hash = b2.min_hash AND a.doc_id < b2.doc_id JOIN ok ON a.band = ok.band AND a.min_hash = ok.min_hash), " +
        "sc AS (SELECT p.d1, p.d2, len(list_filter(ga.tg, x -> list_contains(gb.tg, x))) AS n_common, len(ga.tg) AS n1, len(gb.tg) AS n2 FROM p JOIN g ga ON ga.doc_id = p.d1 JOIN g gb ON gb.doc_id = p.d2), " +
        "dd AS (SELECT d1 AS contained, d2 AS container, n_common, n1 AS n_contained, n2 AS n_container FROM sc UNION ALL SELECT d2, d1, n_common, n2, n1 FROM sc) " +
        "SELECT contained, container, CAST(n_common AS BIGINT) AS n_common, CAST(n_contained AS BIGINT) AS n_contained, CAST(n_container AS BIGINT) AS n_container, round(CAST(n_common AS DOUBLE) / n_contained, 4) AS containment " +
        "FROM dd WHERE n_contained > 0 AND round(CAST(n_common AS DOUBLE) / n_contained, 4) >= 9.0e-1 ORDER BY contained, container"),
    "x68_self_repetition" ->
      ("WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
        "gi AS (SELECT doc_id, i AS pos, concat(toks[i], ' ', toks[i+1], ' ', toks[i+2], ' ', toks[i+3], ' ', toks[i+4]) AS gram FROM d, unnest(range(1, len(toks) - 3)) AS t(i) WHERE len(toks) >= 5), " +
        "rep AS (SELECT doc_id, gram FROM gi GROUP BY doc_id, gram HAVING count(*) >= 2), " +
        "cov AS (SELECT DISTINCT gi.doc_id, p FROM gi JOIN rep ON gi.doc_id = rep.doc_id AND gi.gram = rep.gram, unnest(range(gi.pos, gi.pos + 5)) AS u(p)), " +
        "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_covered FROM cov GROUP BY doc_id) " +
        "SELECT d.doc_id, CAST(coalesce(len(d.toks), 0) AS BIGINT) AS n_tokens, CAST(coalesce(agg.n_covered, 0) AS BIGINT) AS n_self_repeat, " +
        "round(CASE WHEN coalesce(len(d.toks), 0) > 0 THEN CAST(coalesce(agg.n_covered, 0) AS DOUBLE) / len(d.toks) ELSE 0.0 END, 4) AS self_repeat_frac " +
        "FROM d LEFT JOIN agg ON d.doc_id = agg.doc_id ORDER BY d.doc_id"),
    "x45_knn_label" ->
      ("WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb FROM embeddings WHERE vec_id < 20), " +
        "s AS (SELECT q.query_id, e.vec_id AS neighbor_id, e.label, round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.q_emb) / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) * sqrt(list_dot_product(q.q_emb, q.q_emb))), 4) AS score FROM embeddings e CROSS JOIN q WHERE e.vec_id >= 20 AND e.vec_id != q.query_id), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rk FROM s), " +
        "v AS (SELECT query_id, label, CAST(count(*) AS BIGINT) AS n_votes FROM r WHERE rk <= 5 GROUP BY query_id, label), " +
        "p AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY n_votes DESC, label) AS pr FROM v) " +
        "SELECT query_id, label AS pred_label, n_votes FROM p WHERE pr = 1 ORDER BY query_id"),
    "x46_token_budget_mix" ->
      ("WITH d AS (SELECT source, doc_id, CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0)) AS BIGINT) AS n_tokens FROM documents), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn, CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before FROM d) " +
        "SELECT source, CAST(rn AS INTEGER) AS rn, doc_id, n_tokens, cum_before FROM r WHERE cum_before < 4000 ORDER BY source, rn"),
    "x47_tfidf_topk" ->
      ("WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
        "t AS (SELECT doc_id, unnest(toks) AS term FROM d), " +
        "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY doc_id, term), " +
        "df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term), " +
        "n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents), " +
        "sc AS (SELECT tf.doc_id, tf.term, round(tf.tf * ((n.n + 1.0) / (df.df + 1.0)), 4) AS score FROM tf JOIN df ON tf.term = df.term CROSS JOIN n), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk FROM sc) " +
        "SELECT doc_id, CAST(rk AS INTEGER) AS rk, term, score FROM r WHERE rk <= 3 ORDER BY doc_id, rk"),
    "x48_split_leakage" ->
      ("WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
        "g AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])) ELSE CAST([] AS VARCHAR[]) END) AS tg FROM d), " +
        "bk AS (SELECT doc_id, tg, CAST(list_reduce(list_prepend(0, list_transform(range(1, 5), i -> strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)), (a, b) -> a * 16 + b) % 100 AS INTEGER) AS bucket FROM g), " +
        "tr AS (SELECT DISTINCT unnest(tg) AS sh FROM bk WHERE bucket < 80), " +
        "te AS (SELECT doc_id, unnest(tg) AS sh FROM bk WHERE bucket >= 90), " +
        "h AS (SELECT te.doc_id, count(DISTINCT te.sh) AS n_leaked FROM te JOIN tr ON te.sh = tr.sh GROUP BY te.doc_id) " +
        "SELECT bk.doc_id, CAST(coalesce(h.n_leaked, 0) AS BIGINT) AS n_leaked, coalesce(h.n_leaked, 0) >= 1 AS leaked FROM bk LEFT JOIN h ON bk.doc_id = h.doc_id WHERE bk.bucket >= 90 ORDER BY bk.doc_id"),
    "x49_ngram_novelty" ->
      ("WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS toks FROM documents), " +
        "g AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])) ELSE CAST([] AS VARCHAR[]) END) AS tg FROM d), " +
        "e AS (SELECT doc_id, unnest(tg) AS sh FROM g), " +
        "f AS (SELECT sh, min(doc_id) AS first_doc FROM e GROUP BY sh), " +
        "p AS (SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_grams, CAST(sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel FROM e JOIN f ON e.sh = f.sh GROUP BY e.doc_id) " +
        "SELECT g.doc_id, CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams, CAST(coalesce(p.n_novel, 0) AS BIGINT) AS n_novel, round(CASE WHEN coalesce(p.n_grams, 0) > 0 THEN CAST(p.n_novel AS DOUBLE) / p.n_grams ELSE 0.0 END, 4) AS novelty FROM g LEFT JOIN p ON g.doc_id = p.doc_id ORDER BY g.doc_id"),
    "x40_mixture_resample" ->
      ("WITH a AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang), " +
        "t AS (SELECT lang, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS w_raw, sum(sqrt(CAST(n_docs AS DOUBLE))) OVER () AS w_sum, sum(n_docs) OVER () AS total FROM a), " +
        "k AS (SELECT lang, CAST(floor(floor(0.4e0 * total) * w_raw / w_sum) AS BIGINT) AS n_keep FROM t), " +
        "r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn FROM documents) " +
        "SELECT doc_id, lang, CAST(rn AS INTEGER) AS rn FROM r JOIN k USING (lang) WHERE rn <= n_keep ORDER BY doc_id"),
    "x07b_simhash_md5" ->
      "WITH t AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), tk -> length(tk) > 0)) AS token FROM documents), h AS (SELECT doc_id, md5(token) AS hx FROM t), b AS (SELECT doc_id, hx, CAST(unnest(range(0, 32)) AS INTEGER) AS bit FROM h), v AS (SELECT doc_id, bit, sum(CASE WHEN substr(hx, bit + 1, 1) IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END) AS votes FROM b GROUP BY doc_id, bit) SELECT doc_id, CAST(sum(CASE WHEN votes > 0 THEN CAST(power(2, bit) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash32 FROM v GROUP BY doc_id ORDER BY doc_id",
    "x07c_simhash64_md5" ->
      "WITH t AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), tk -> length(tk) > 0)) AS token FROM documents), h AS (SELECT doc_id, md5(token) AS hx FROM t), b AS (SELECT doc_id, hx, CAST(unnest(range(0, 64)) AS INTEGER) AS bit FROM h), v AS (SELECT doc_id, bit, sum(CASE WHEN (((strpos('0123456789abcdef', substr(hx, CASE WHEN bit < 32 THEN 16 - (bit // 4) ELSE 8 - ((bit - 32) // 4) END, 1)) - 1) >> (bit % 4)) & 1) = 1 THEN 1 ELSE -1 END) AS votes FROM b GROUP BY doc_id, bit) SELECT doc_id, CAST(sum(CASE WHEN votes > 0 THEN (CASE WHEN bit = 63 THEN -9223372036854775807 - 1 ELSE (CAST(1 AS BIGINT) << bit) END) ELSE 0 END) AS BIGINT) AS simhash64 FROM v GROUP BY doc_id ORDER BY doc_id",
    "x08_ann_multi_query" ->
      "WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb FROM embeddings WHERE vec_id < 20), s AS (SELECT q.query_id, e.vec_id AS neighbor_id, round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.q_emb) / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) * sqrt(list_dot_product(q.q_emb, q.q_emb))), 4) AS score FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.query_id), r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rk FROM s) SELECT query_id, neighbor_id, score, CAST(rk AS INTEGER) AS rk FROM r WHERE rk <= 3 ORDER BY query_id, rk",
    "x08b_ann_topk_agg" ->
      "WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb FROM embeddings WHERE vec_id < 20), s AS (SELECT q.query_id, e.vec_id AS neighbor_id, round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.q_emb) / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) * sqrt(list_dot_product(q.q_emb, q.q_emb))), 4) AS score FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.query_id), r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rk FROM s) SELECT query_id, neighbor_id, score, CAST(rk AS INTEGER) AS rk FROM r WHERE rk <= 3 ORDER BY query_id, rk",
    "x11_multimodal_meta" ->
      "SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS payload_bytes, CAST((n_chars % 640) + 16 AS INTEGER) AS width, CAST(((doc_id * 37) % 480) + 16 AS INTEGER) AS height, CASE WHEN doc_id % 3 = 0 THEN 'image/png' ELSE 'image/jpeg' END AS media_type FROM documents ORDER BY doc_id",
    "x12_multimodal_features" ->
      "SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes, CASE WHEN length(text) = 0 THEN 0.0 ELSE round(list_avg(list_transform(range(1, length(text) + 1), i -> CAST(ascii(substr(text, i, 1)) AS DOUBLE))), 4) END AS mean_byte, CASE WHEN length(text) = 0 THEN -1 ELSE CAST(ascii(substr(text, 1, 1)) AS INTEGER) END AS first_byte, CAST((n_chars % 640) + 16 AS INTEGER) AS width, CAST(((doc_id * 37) % 480) + 16 AS INTEGER) AS height FROM documents ORDER BY doc_id",
    "x17_frame_sample" ->
      "WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents) SELECT doc_id, CAST(i AS INTEGER) AS frame_no, CAST(least(64, n - i*64) AS INTEGER) AS frame_bytes FROM d, unnest(range(0, CAST(ceil(n / 64.0) AS BIGINT))) AS t(i) WHERE i % 4 = 0 ORDER BY doc_id, frame_no",
    "x18_resize_meta" ->
      "WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n, (n_chars % 640) + 16 AS w0, ((doc_id * 37) % 480) + 16 AS h0 FROM documents) SELECT doc_id, CAST(greatest(0, least(n, CAST(round(n * (1024.0 / (w0 * h0))) AS BIGINT))) AS INTEGER) AS new_len, CAST(32 AS INTEGER) AS width, CAST(32 AS INTEGER) AS height FROM d ORDER BY doc_id",
  )
}
