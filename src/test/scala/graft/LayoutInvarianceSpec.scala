package graft

import org.apache.spark.sql.functions._

/** Input-layout invariance: every declared query must produce IDENTICAL
  * output when the input parquet arrives with a different partition count
  * and row order — which is exactly what a real cluster does (splits,
  * speculative re-reads, compaction all reorder rows). Same-plan
  * determinism (DeterminismSpec) cannot catch an order-dependent
  * collect_list / first / sum-float that happens to be stable within one
  * layout; this spec re-lays the corpus out adversarially (md5-shuffled
  * row order, 7 partitions) and compares bit-for-bit. */
class LayoutInvarianceSpec extends SparkSpec {

  /** sf0.001 rewritten with shuffled row order and a different partition
    * count (the "other cluster" layout). */
  private lazy val shuffledDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    Tables.documents(spark, sf0001)
      .orderBy(md5(concat(lit("re"), col("doc_id").cast("string"))))
      .repartition(7)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables.embeddings(spark, sf0001)
      .orderBy(md5(concat(lit("re"), col("vec_id").cast("string"))))
      .repartition(7)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // events carries TIMESTAMP NANOS — rewrite through the Tables reader
    Tables.events(spark, sf0001)
      .orderBy(md5(col("event_id").cast("string")))
      .repartition(7)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // the round-7 surface plus the order-sensitive older shapes (collect_list
  // rebuild, prefix sums, iterative loops, heap top-k)
  private val names = Seq(
    "x01_dedup_exact", "x21_sequence_pack", "x38_cms_heavy_hitters",
    "x54_span_removal", "x57_priority_dedup", "x58_corpus_shuffle",
    "x59_incremental_dedup", "x60_length_outliers", "x61_zipf_fit",
    "x63_lm_perplexity", "x64_source_report", "x65_label_centroids",
    "x66_length_histogram", "x67_pmi_collocations", "x68_self_repetition",
    "x70_distinctive_terms", "x71_pretrain_pipeline", "x72_score_calibration",
    "x62_incremental_neardup", "x69_containment_screen",
    "x73_hashed_features", // collect_list→map rebuild is the classic order trap
    "x74_negative_samples", "x75_reshard_plan",
    "d42_retention_cohorts",
    // round-8-touched shapes: BPE's iterative argmax (tie-break must be
    // layout-free), the d34 sketch containment (percentile_approx merges
    // sketches in task order), x44's collect_list combination emission,
    // and the xxhash64 forms now under oracle
    "x37_bpe_merges", "x55_bpe_tokenize", "d34_approx_percentiles",
    "x44_chunk_neardups", "x05b_minhash_fast", "x06b_neardup_fast",
    "x07_simhash",
    // the k-means family: order-free quantized training makes even the
    // TRAINED MODEL layout-invariant (float-avg training was not)
    "x13_ann_ivf", "x30_pq_ann", "x31_ivfadc_ann",
    "x77_dsir_select", // integer-quantized importance scores
    "x78_gopher_rules")

  test("declared queries are invariant to input partitioning and row order") {
    for (n <- names) {
      val q = SparkEntry.queries(n)
      val base = q(spark, sf0001).collect().map(_.toString).toSeq
      val relaid = q(spark, shuffledDir).collect().map(_.toString).toSeq
      assert(base == relaid, s"$n changed under input re-layout")
      assert(base.nonEmpty, s"$n returned no rows")
    }
  }
}
