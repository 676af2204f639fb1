package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables._

/** Deterministic sampling / splitting for training-data curation — the ops a
  * 100 TB pipeline needs where `rand()` is unusable (results must be
  * reproducible across retries, resumable across job restarts, and stable
  * under repartitioning):
  *
  *  - hash split: route every doc to train/validation/test by a bucket
  *    derived from md5(doc_id) — pure map, no shuffle, no state; adding new
  *    docs never reassigns old ones;
  *  - stratified sample: fixed-size per-stratum sample ranked by a content
  *    hash — a deterministic reservoir. The row_number window compiles with
  *    WindowGroupLimit, so each map task pre-prunes to its local top-n
  *    before the single shuffle on the stratum key.
  *
  * Both are md5-based and therefore bit-reproducible in the DuckDB oracle.
  */
object Sampling {

  /** Split bucket in [0, 100): value of the first 4 hex chars of
    * md5(doc_id) mod 100 — uniform by md5 avalanche, independent of row
    * order and partitioning. */
  def hashBucket(id: org.apache.spark.sql.Column, buckets: Int = 100): org.apache.spark.sql.Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("int"), lit(buckets))

  /** x19 — deterministic 80/10/10 train/validation/test split of the
    * documents table. Map-only: the assignment is a pure per-row expression. */
  def x19HashSplit(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"), hashBucket(col("doc_id")).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "validation")
          .otherwise("test"))
      .orderBy(col("doc_id"))

  /** x20 — stratified deterministic sample: up to `perStratum` events per
    * event_type, ranked by md5 of the event id (a seedless shuffle that every
    * rerun reproduces). One exchange on the stratum key; WindowGroupLimit
    * prunes map-side. */
  def x20StratifiedSample(s: SparkSession, dir: String, perStratum: Int = 50): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(md5(col("event_id").cast("string")), col("event_id"))
    events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perStratum)
      .select(col("event_type"), col("rn"), col("event_id"), round(col("value"), 2).as("value_r"))
      .orderBy(col("event_type"), col("rn"))
  }

  /** x21 — sequence packing (the concat-then-chunk layout LLM training
    * uses): concatenate documents in doc_id order into one token stream and
    * assign each doc its start offset, context-window bin (`capacity`
    * tokens) and offset within the bin.
    *
    * The start offset is a GLOBAL prefix sum, which a naive
    * `Window.orderBy` (no partition) would compute on a single task. The
    * scale shape is the classic two-phase distributed prefix sum:
    * deterministic chunks (`doc_id / chunkSize`), per-chunk local cumulative
    * sums (partitioned window), and per-chunk base offsets computed from the
    * chunk totals — a control-plane-sized aggregate (one long per chunk) —
    * broadcast back as a map expression. At 100 TB the only global data
    * motion is the chunk-total aggregate.
    *
    * `chunkSize` is derived from the corpus's doc_id span so the number of
    * chunks stays ~4× the parallelism regardless of corpus size — the bases
    * map is then genuinely control-plane-sized (a literal of ≲O(100)
    * entries, never |docs|/constant). The chunk assignment preserves doc_id
    * order across chunk boundaries, so the result is chunkSize-invariant.
    * Bin arithmetic is integer (long DIV/MOD): no double-division precision
    * loss past 2^53 tokens and no int overflow past 2^31 bins; only
    * offset_in_bin (< capacity) narrows to int.
    *
    * NOTE: phase 1 (the doc_id-span probe + chunk-total aggregate) runs
    * eagerly at DataFrame-construction time — two small Spark jobs before
    * the returned plan executes. */
  def x21SequencePack(s: SparkSession, dir: String, capacity: Int = 2048): DataFrame =
    // row repartition before tokenizing: a small parquet file is one split,
    // which would serialize the compute-bound stage on one core
    packSequences(documents(s, dir).repartition(s.sparkContext.defaultParallelism), capacity)

  /** Core of [[x21SequencePack]] over any (doc_id, text) relation. */
  def packSequences(docs: DataFrame, capacity: Int = 2048): DataFrame = {
    val s = docs.sparkSession
    // size chunks off the doc_id span: ~4 chunks per core, at least 1 doc each
    val targetChunks = math.max(1, 4 * s.sparkContext.defaultParallelism)
    val span = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    if (span.isNullAt(0)) { // empty corpus: the packed layout is empty too
      return docs.select(col("doc_id"), lit(0).as("n_tokens"),
        lit(0L).as("start_offset"), lit(0L).as("bin"), lit(0).as("offset_in_bin"))
    }
    val chunkSize = math.max(1L, (span.getLong(1) - span.getLong(0) + 1) / targetChunks)
    val withTok = docs
      .select(col("doc_id"), size(Text.tokens(col("text"))).as("n_tokens"),
        expr(s"doc_id DIV $chunkSize").as("chunk"))
    // phase 1: per-chunk totals -> driver (<= ~4x parallelism longs) -> bases
    val totals = withTok.groupBy(col("chunk")).agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val bases: Map[Long, Long] =
      totals.scanLeft((Long.MinValue, 0L)) { case ((_, acc), (c, t)) => (c, acc + t) }
        .tail.zip(totals).map { case ((c, after), (_, t)) => c -> (after - t) }.toMap
    val baseExpr = coalesce(
      element_at(
        map(bases.toSeq.sortBy(_._1).flatMap { case (c, b) => Seq(lit(c), lit(b)) }: _*),
        col("chunk")),
      lit(0L))
    // phase 2: local prefix within chunk + chunk base
    val wLocal = Window.partitionBy("chunk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    withTok
      .withColumn("start_offset",
        (baseExpr + coalesce(sum(col("n_tokens")).over(wLocal), lit(0L))).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("start_offset"),
        expr(s"start_offset DIV $capacity").as("bin"),
        pmod(col("start_offset"), lit(capacity.toLong)).cast("int").as("offset_in_bin"))
      .orderBy(col("doc_id"))
  }

  /** x23 — repetition-based quality stats (the Gopher-rule family): per
    * document, the duplicate-token fraction (1 − distinct/total) and the
    * duplicate-trigram fraction (1 − distinct trigrams / total trigram
    * positions), with a flag at the conventional 0.30 trigram threshold.
    * Pure per-row array expressions — map-only, no shuffle, no UDF. */
  def x23RepetitionStats(s: SparkSession, dir: String, maxDupTrigram: Double = 0.30): DataFrame =
    documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism) // row split, see x21
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), size(col("toks")).as("n_tokens"),
        col("toks"), Text.shingles(col("toks")).as("tg"))
      .select(col("doc_id"), col("n_tokens"),
        round(when(col("n_tokens") > 0,
          lit(1.0) - size(array_distinct(col("toks"))) / col("n_tokens"))
          .otherwise(lit(0.0)), 4).as("dup_token_frac"),
        round(when(col("n_tokens") >= 3,
          lit(1.0) - size(col("tg")) / (col("n_tokens") - 2))
          .otherwise(lit(0.0)), 4).as("dup_trigram_frac"))
      .withColumn("flagged", col("dup_trigram_frac") > maxDupTrigram)
      .orderBy(col("doc_id"))

  /** x24 — language mixture weights (temperature / importance sampling for
    * multilingual corpora): per language, sampling weight ∝ n_docs^alpha
    * normalized over languages, and the resulting upsampling boost relative
    * to natural frequency. The per-language aggregate is control-plane
    * sized (|langs| rows), so the normalizing window over it is trivially
    * single-partition — the corpus itself is touched once by the count. */
  def x24MixtureWeights(s: SparkSession, dir: String, alpha: Double = 0.3): DataFrame = {
    val byLang = documents(s, dir).groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy()
    byLang
      .withColumn("w_raw", pow(col("n_docs"), alpha))
      .withColumn("w_sum", sum(col("w_raw")).over(w))
      .withColumn("total", sum(col("n_docs")).over(w))
      .select(col("lang"), col("n_docs"),
        round(col("w_raw") / col("w_sum"), 4).as("weight"),
        round((col("w_raw") / col("w_sum")) / (col("n_docs") / col("total")), 4).as("boost"))
      .orderBy(col("lang"))
  }

  /** x40 — mixture RESAMPLE: materialize x24's temperature mixture as an
    * actual deterministic per-language sample. Per language, the keep
    * budget is `floor(target · w(lang)/Σw)` with `w = √n` (α = 0.5 — sqrt
    * is IEEE-correctly-rounded, so the budget arithmetic is reproducible
    * bit-for-bit in the oracle, unlike pow(·, 0.3)); within a language,
    * docs are ranked by md5(doc_id) (x20's seedless shuffle) and the top
    * `n_keep` survive. This is the operator that actually BUILDS the
    * training mix the x24 weights describe. One tiny per-lang aggregate
    * broadcast back + one WindowGroupLimit-prunable window per language —
    * the corpus shuffles once on lang. */
  def x40MixtureResample(s: SparkSession, dir: String,
                         targetFrac: Double = 0.4): DataFrame = {
    val docs = documents(s, dir).select(col("doc_id"), col("lang"))
    val w = Window.partitionBy()
    val keep = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .withColumn("w_raw", sqrt(col("n_docs").cast("double")))
      .withColumn("w_sum", sum(col("w_raw")).over(w))
      .withColumn("total", sum(col("n_docs")).over(w))
      .select(col("lang"),
        floor(floor(lit(targetFrac) * col("total")) * col("w_raw") / col("w_sum"))
          .cast("long").as("n_keep"))
    // the per-lang budgets are control-plane sized (|langs| rows): collect
    // the max as a LITERAL rank cap — WindowGroupLimit only fires on a
    // literal bound, and with it the per-lang sort keeps just maxKeep rows
    // map-side instead of ranking the whole corpus through the shuffle
    val maxKeep = Option(keep.agg(max(col("n_keep"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val ranked = docs.withColumn("rn", row_number().over(
      Window.partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .filter(col("rn") <= maxKeep)
    ranked.join(broadcast(keep), Seq("lang"))
      .filter(col("rn") <= col("n_keep"))
      .select(col("doc_id"), col("lang"), col("rn"))
      .orderBy(col("doc_id"))
  }

  /** x22 — benchmark decontamination: per corpus document, the number of
    * distinct 3-token shingles shared with ANY document of a benchmark set
    * (here: doc_id < 20 stands in for the eval suite). The benchmark shingle
    * set is tiny relative to the corpus — broadcast it, so the corpus is
    * scanned once with a map-side semi-match and the only shuffle is the
    * per-doc count. Zero-match documents are kept (contaminated = false). */
  def x22Decontaminate(s: SparkSession, dir: String, benchMaxId: Long = 20L,
                       minShared: Int = 1): DataFrame = {
    // cached shingle relation (row-repartitioned before the compute, shared
    // with the x16 verifier); explode_outer + post-filter instead of
    // explode, because explode's inferred `size(tg) > 0` filter is pushed
    // below the exchange and re-inlines the whole tokenize+shingle pipeline
    // ~8x into a single-core scan predicate (measured 17 s -> ~2 s at sf0.1)
    val sh = Dedup.cachedShingles(s, dir)
    val bench = sh.filter(col("doc_id") < benchMaxId)
      .select(explode_outer(col("tg")).as("sh"))
      .filter(col("sh").isNotNull).distinct()
    val corpus = sh.filter(col("doc_id") >= benchMaxId)
    val hits = corpus.select(col("doc_id"), explode_outer(col("tg")).as("sh"))
      .filter(col("sh").isNotNull)
      .join(broadcast(bench), Seq("sh"))
      .groupBy(col("doc_id")).agg(countDistinct(col("sh")).as("n_shared"))
    corpus.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) >= minShared).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Per-source token budget for the declared x46 slice. */
  val TokenBudget = 4000L

  /** x46 — token-budget mixture: fill each source's slice of the training
    * mix by TOKENS, not documents (what a real data mix is specified in).
    * Per source, docs are ranked by md5(doc_id) (the x20 seedless shuffle)
    * and a doc is kept iff the tokens accumulated BEFORE it are still
    * under the budget — so the doc that crosses the line is the last one
    * in. Exactly one shuffle (on source) and one running-sum window; the
    * budget predicate prunes everything past the line at the filter. */
  def x46TokenBudgetMix(s: SparkSession, dir: String,
                        budget: Long = TokenBudget): DataFrame = {
    val ord = Seq(md5(col("doc_id").cast("string")), col("doc_id"))
    val w = Window.partitionBy("source").orderBy(ord: _*)
    documents(s, dir)
      .select(col("source"), col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("cum_before") < budget)
      .select(col("source"), col("rn"), col("doc_id"), col("n_tokens"),
        col("cum_before"))
      .orderBy(col("source"), col("rn"))
  }

  /** Context-window shape for the declared x56 slice. */
  val WinTokens = 64
  val WinStride = 48

  /** x56 — overlapping context windows (RAG-style chunking): each document
    * becomes sliding token windows of [[WinTokens]] tokens at stride
    * [[WinStride]] (16-token overlap), the retrieval-chunk layout that
    * complements x21's dense packing (train layout) and x42's
    * content-defined chunks (dedup layout). Emits window coordinates +
    * md5 of the window text (hash, not text — keeps the result narrow and
    * the oracle comparable). Map-only: windows are a per-row
    * explode(sequence) + slice; no shuffle except the output sort. */
  def x56ContextWindows(s: SparkSession, dir: String, w: Int = WinTokens,
                        stride: Int = WinStride): DataFrame = {
    val docs = documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("n", size(col("toks")))
    // windows start at 0, stride, 2·stride… ; count = 1 + ceil(max(n−w,0)/stride)
    // (floor() on both engines — a bare int cast truncates in Spark but
    // ROUNDS in DuckDB)
    val nw = (floor((greatest(col("n") - w, lit(0)) + (stride - 1))
      / lit(stride)) + 1).cast("int")
    docs
      .select(col("doc_id"), col("toks"),
        explode(when(col("n") > 0, sequence(lit(0), nw - 1))
          .otherwise(array().cast("array<int>"))).as("win_no"))
      .select(col("doc_id"), col("win_no"),
        (col("win_no") * stride).cast("long").as("start_tok"),
        slice(col("toks"), col("win_no") * stride + 1, lit(w)).as("wt"))
      .select(col("doc_id"), col("win_no"), col("start_tok"),
        size(col("wt")).as("n_win_tokens"),
        md5(concat_ws(" ", col("wt"))).as("win_hash"))
      .orderBy(col("doc_id"), col("win_no"))
  }

  /** x58 — deterministic corpus shuffle + sharding: the training-order
    * randomization step a dataloader expects. Each doc gets a seedless
    * pseudo-random order key (md5 of `seed:doc_id` — rerun-stable, resumable,
    * independent of input partitioning, unlike `rand()`), a shard from the
    * key's leading hex (so shard routing and in-shard order derive from ONE
    * hash), and its position within the shard. One exchange on the shard
    * key; the in-shard `row_number` is exactly the order a per-shard writer
    * would lay rows out with `sortWithinPartitions`, so at 100 TB this IS
    * the shard-dump plan — no extra global sort (the trailing `orderBy` is
    * presentation-only for the oracle compare). */
  def x58CorpusShuffle(s: SparkSession, dir: String, nShards: Int = 8,
                       seed: String = "graft"): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col("order_key"), col("doc_id"))
    documents(s, dir)
      .select(col("doc_id"),
        md5(concat(lit(seed + ":"), col("doc_id").cast("string"))).as("order_key"))
      .withColumn("shard",
        pmod(conv(substring(col("order_key"), 1, 4), 16, 10).cast("int"), lit(nShards)))
      .withColumn("pos", row_number().over(w))
      .select(col("shard"), col("pos"), col("doc_id"), col("order_key"))
      .orderBy(col("shard"), col("pos"))
  }

  /** x60 — per-language length-outlier trim: within each language keep the
    * docs whose `n_chars` rank-percentile lies in [lo, hi] (tail trim for
    * the truncation stubs and concatenation blobs that survive per-doc
    * quality scoring — x02 scores a doc against itself; this scores it
    * against its language's length distribution). `percent_rank` over
    * (n_chars, doc_id) is deterministic under ties; one exchange on the
    * language key, and the filter compares the UNROUNDED rank so the kept
    * set is exactly the oracle's. */
  def x60LengthOutliers(s: SparkSession, dir: String, lo: Double = 0.05,
                        hi: Double = 0.95): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))
    documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("pct", percent_rank().over(w))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        round(col("pct"), 4).as("pct_r"),
        (col("pct") >= lo && col("pct") <= hi).as("is_kept"))
      .orderBy(col("doc_id"))
  }

  /** x66 — token-length histogram + CDF: docs and tokens per power-of-two
    * length bucket with cumulative shares — the distribution a pipeline
    * reads before choosing a context length or packing capacity (the
    * input to x21's `capacity` and x56's window size). The bucket is
    * `length(bin(n))` — integer bit-length, never a float log2, so the
    * boundary docs (n exactly 2^k) land identically in every engine.
    * Map-only bucket assign + one tiny agg; the running-sum windows run
    * on the ≤64-row bucket relation (control plane), like x61's fit. */
  def x66LengthHistogram(s: SparkSession, dir: String): DataFrame = {
    val nToks = coalesce(size(Text.tokens(col("text"))), lit(0))
    val hist = documents(s, dir)
      .select(nToks.as("n_toks"))
      .select(when(col("n_toks") === 0, lit(0))
        .otherwise(length(bin(col("n_toks").cast("long")))).cast("int").as("bucket"),
        col("n_toks"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks").cast("long")).as("n_tokens"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    hist.select(col("bucket"),
        expr("CASE WHEN bucket = 0 THEN CAST(0 AS BIGINT) ELSE shiftleft(CAST(1 AS BIGINT), bucket - 1) END").as("lo_tokens"),
        expr("CASE WHEN bucket = 0 THEN CAST(0 AS BIGINT) ELSE shiftleft(CAST(1 AS BIGINT), bucket) - 1 END").as("hi_tokens"),
        col("n_docs"), col("n_tokens"),
        sum(col("n_docs")).over(w).as("cum_docs"),
        round(sum(col("n_docs")).over(w).cast("double") /
          sum(col("n_docs")).over(tot).cast("double"), 4).as("cum_doc_frac"),
        when(sum(col("n_tokens")).over(tot) === 0, lit(0.0))
          .otherwise(round(sum(col("n_tokens")).over(w).cast("double") /
            sum(col("n_tokens")).over(tot).cast("double"), 4)).as("cum_token_frac"))
      .orderBy(col("bucket"))
  }

  /** Buckets for x74's partner pick. */
  val NegBuckets = 64

  /** x74 — deterministic negative sampling: for each document, `k`
    * pseudo-random partner documents that are NOT near-duplicates — the
    * negative-pair generator contrastive/embedding training feeds on,
    * where `rand()` would break replay and resume. Partner j of doc i is
    * the min-id member of the md5(i:j)-selected [[NegBuckets]]-bucket
    * (second-min when that member is i itself), then (i, partner) pairs
    * that collide with the x16 verified near-dup set are anti-joined away
    * (a negative that is secretly a positive poisons the loss). Scale
    * shape: bucket representatives come from a rn ≤ 2 window
    * (WindowGroupLimit map-side prune — never a per-bucket collect), the
    * candidate join keys on the bucket id against that 2·B-row broadcast,
    * and the near-dup exclusion is an anti-join against the LSH-bounded
    * pair set. */
  def x74NegativeSamples(s: SparkSession, dir: String, k: Int = 3): DataFrame =
    x74NegativeSamplesOf(s, documents(s, dir),
      Dedup.x16VerifiedNearDups(s, dir).select(col("d1"), col("d2")), k)

  /** Steady-state form of x74: the near-dup exclusion comes in as a
    * RELATION (in production the maintained verified-pair table that x62
    * keeps current per ingest) instead of being recomputed from the raw
    * corpus per sampling run — at the 100k-doc clone probe recomputation
    * is ~714 s of the dir form's wall clock; the sampling itself is
    * seconds. The dir form delegates here with the freshly computed x16
    * pair set, so both forms emit identical rows by construction. */
  def x74NegativeSamplesOf(s: SparkSession, docs: DataFrame,
                           nearDupPairs: DataFrame, k: Int = 3): DataFrame = {
    val ids = docs.select(col("doc_id"))
    val wB = Window.partitionBy("bucket").orderBy(col("doc_id"))
    val reps = ids
      .withColumn("bucket", hashBucket(col("doc_id"), NegBuckets))
      .withColumn("rn", row_number().over(wB))
      .filter(col("rn") <= 2)
      .groupBy(col("bucket"))
      .agg(min(col("doc_id")).as("min1"),
        max(col("doc_id")).as("min2")) // of the two smallest: max = second-min
    val cand = ids.select(col("doc_id"),
        explode(sequence(lit(1), lit(k))).as("j"))
      .withColumn("bucket",
        pmod(conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
          col("j").cast("string"))), 1, 4), 16, 10).cast("int"), lit(NegBuckets)))
      .join(broadcast(reps), Seq("bucket"))
      .select(col("doc_id"), col("j"),
        when(col("min1") =!= col("doc_id"), col("min1"))
          .otherwise(when(col("min2") =!= col("doc_id"), col("min2"))).as("neg_id"))
      .filter(col("neg_id").isNotNull)
    val dups = nearDupPairs.select(col("d1"), col("d2"))
    val banned = dups.unionByName(dups.select(col("d2").as("d1"), col("d1").as("d2")))
    cand.join(banned,
        cand("doc_id") === banned("d1") && cand("neg_id") === banned("d2"),
        "left_anti")
      .orderBy(col("doc_id"), col("j"))
  }

  private def md5Point(sd: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Integer.parseInt(
      md.digest(sd.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 4), 16)
  }

  /** Consistent-hash ring nodes for `n` shards: (point on the 2^16 ring,
    * shard), sorted by point. The salt is per-NODE, not per-ring-size —
    * that is the whole trick: growing n → n+2 keeps the existing nodes'
    * points fixed and only inserts the new nodes' points, so only the arc
    * segments the new nodes claim move. Driver-side md5 matches the SQL
    * md5 the oracle embeds, so both engines see the same literals. */
  private[graft] def ringNodes(n: Int): Seq[(Int, Int)] =
    (0 until n).map(s => md5Point(s"node:$s") -> s).sortBy(_._1)

  /** First ring node at or after point `p`, wrapping to the smallest. */
  private[graft] def ringAssign(p: Column, nodes: Seq[(Int, Int)]): Column =
    nodes.foldRight(lit(nodes.head._2): Column) { case ((pt, sh), els) =>
      when(p <= pt, lit(sh)).otherwise(els)
    }

  /** x75 — reshard plan: when the shard count grows `from` → `to`, how many
    * documents MOVE under (a) mod placement (x58's simple rule) versus
    * (b) consistent-hash ring placement — the operational planning query
    * behind the choice: mod reshuffles ~(1 − 1/to) of a 100 TB corpus,
    * the ring only the slices claimed by the new nodes (~(to−from)/to).
    * Map-only per-doc expressions over one scan + a single scalar agg;
    * ring nodes are driver-computed md5 literals folded into a when-chain
    * (codegen'd, no join). Emits one row per method with the movement
    * fraction. */
  def x75ReshardPlan(s: SparkSession, dir: String, from: Int = 8,
                     to: Int = 10): DataFrame = {
    val p = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("int")
    val base = documents(s, dir).select(p.as("p"))
    val modMoved = (pmod(col("p"), lit(from)) =!= pmod(col("p"), lit(to))).cast("long")
    val ringMoved = (ringAssign(col("p"), ringNodes(from)) =!=
      ringAssign(col("p"), ringNodes(to))).cast("long")
    base
      .agg(count(lit(1)).as("n_docs"), sum(modMoved).as("mod_moved"),
        sum(ringMoved).as("ring_moved"))
      .filter(col("n_docs") > 0)
      .select(expr("stack(2, 'mod', mod_moved, 'ring', ring_moved) AS (method, n_moved)"),
        col("n_docs"))
      .select(col("method"), col("n_docs"), col("n_moved"),
        round(col("n_moved").cast("double") / col("n_docs").cast("double"), 4)
          .as("moved_frac"))
      .orderBy(col("method"))
  }

  /** x48 — split-leakage audit: for every TEST document of the x19 hash
    * split, the number of distinct 3-token shingles it shares with any
    * TRAIN document — the contamination check a pipeline runs before
    * trusting its held-out metrics (x22's topology, but between x19's own
    * splits instead of against an external benchmark set). The train
    * shingle set is corpus-scale, so the match is a shuffle equi-join on
    * the shingle key (both sides hash-partitioned by shingle), not a
    * broadcast; the per-doc count is the only other exchange. */
  def x48SplitLeakage(s: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.cachedShingles(s, dir)
      .withColumn("bucket", hashBucket(col("doc_id")))
    val train = sh.filter(col("bucket") < 80)
      .select(explode_outer(col("tg")).as("sh"))
      .filter(col("sh").isNotNull).distinct()
    val test = sh.filter(col("bucket") >= 90)
    val hits = test.select(col("doc_id"), explode_outer(col("tg")).as("sh"))
      .filter(col("sh").isNotNull)
      .join(train, Seq("sh"))
      .groupBy(col("doc_id")).agg(countDistinct(col("sh")).as("n_leaked"))
    test.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_leaked"), lit(0L)).as("n_leaked"),
        (coalesce(col("n_leaked"), lit(0L)) >= 1).as("leaked"))
      .orderBy(col("doc_id"))
  }

  /** Feature buckets for x77's hashed n-gram model. */
  val DsirBuckets = 256

  // x77's (doc, source, bucket) count relation, session-cached per dir —
  // the cachedGrams rationale: BOTH the bucket histogram and the per-doc
  // score consume it, and their different column pruning makes the two
  // aggregate subtrees non-identical, so plain exchange reuse does not
  // fire and each consumer would re-pay the corpus tokenize+md5 pass
  // (measured: the explode runs twice without this). At 100 TB this
  // relation is the operator's one corpus-scale artifact.
  private val dsirCache = graft.GraftCaches.register(new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())

  /** xxhash64 feature bucket — the production hash path (one codegen'd
    * 64-bit hash per feature vs md5's full digest + hex + conv chain; the
    * x05/x05b twin-form rationale). `pmod` matches the oracle's
    * ((h % B) + B) % B over the signed hash. */
  private[functions] def hashBucketFast(f: Column, buckets: Int): Column =
    pmod(xxhash64(f), lit(buckets.toLong)).cast("int")

  private def cachedDsirCounts(s: SparkSession, dir: String,
                               fast: Boolean = false): DataFrame = {
    val key = s"${System.identityHashCode(s)}|$dir|fast=$fast"
    dsirCache.computeIfAbsent(key, _ => {
      val toks = documents(s, dir)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("source"), Text.tokens(col("text")).as("toks"))
      toks
        .select(col("doc_id"), col("source"),
          explode(concat(coalesce(col("toks"), array().cast("array<string>")),
            Corpus.bigrams(col("toks")))).as("f"))
        .select(col("doc_id"), col("source"),
          (if (fast) hashBucketFast(col("f"), DsirBuckets)
           else hashBucket(col("f"), DsirBuckets)).as("bucket"))
        .groupBy(col("doc_id"), col("source"), col("bucket"))
        .agg(count(lit(1)).as("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    })
  }

  /** x77 — DSIR-style importance selection (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling", the
    * hashed-n-gram variant): score every document by how much more likely
    * its features are under a TARGET distribution (the docs of
    * `targetSource` — the curated slice you want more of) than under the
    * raw-corpus distribution, and keep the `keepN` highest-scoring docs.
    * Features are unigrams + adjacent bigrams md5-hashed into
    * [[DsirBuckets]] buckets; both bag-of-buckets models use add-one
    * smoothing; a doc's log importance weight is Σ_b c_b·(ln p_t[b] −
    * ln p_r[b]).
    *
    * Determinism/oracle posture: the per-bucket log-ratio is
    * floor-quantized to exact integer 1e-6 units ONCE (a 256-row,
    * order-free computation — ln enters nowhere else), so each doc's
    * score is an exact BIGINT dot product: order-free under any
    * partitioning, totally ordered for the top-N (score desc, doc_id —
    * no float-tie ambiguity), and bit-reproducible by DuckDB. The
    * deterministic top-N replaces the paper's Gumbel resampling the same
    * way x19/x20 replace rand() — replayable selection is what a 100 TB
    * pipeline needs to resume.
    *
    * Scale shape: one corpus-scale feature explode (map-only), a
    * 256-row histogram aggregate (map-side partials), the per-(doc,
    * bucket) count exchange, a broadcast join against the 256-row
    * log-ratio table, the per-doc aggregate, and a global
    * TakeOrdered(keepN) — no corpus-side sort. */
  /** The STORED MODEL of the x77 family: the complete
    * [[DsirBuckets]]-row quantized log-ratio table (bucket → lq), one row
    * per bucket including buckets the corpus never hit (their lq is the
    * pure-smoothing ratio), so a NEW batch whose features land in an
    * unseen bucket still scores — this is what the streaming twin
    * broadcasts/freezes. Floor-quantized to exact integer 1e-6 units: ln
    * enters nowhere else, so every downstream score is an exact BIGINT
    * dot product. */
  def dsirLogRatioModel(s: SparkSession, dir: String,
                        targetSource: String = "src0",
                        fast: Boolean = false): DataFrame = {
    val pdb = cachedDsirCounts(s, dir, fast)
    val seen = pdb.groupBy(col("bucket"))
      .agg(sum(col("c")).as("cr"),
        sum(when(col("source") === targetSource, col("c")).otherwise(0L)).as("ct"))
    val spine = s.range(DsirBuckets).select(col("id").cast("int").as("bucket"))
    val hist = spine.join(seen, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("cr"), lit(0L)).as("cr"), coalesce(col("ct"), lit(0L)).as("ct"))
    val tot = hist.agg(sum(col("cr")).as("crt"), sum(col("ct")).as("ctt"))
    hist.crossJoin(broadcast(tot))
      .select(col("bucket"),
        floor((log((col("ct") + 1).cast("double") /
            (col("ctt") + DsirBuckets).cast("double")) -
          log((col("cr") + 1).cast("double") /
            (col("crt") + DsirBuckets).cast("double"))) * lit(1.0e6)).as("lq"))
  }

  /** Persist a trained [[dsirLogRatioModel]] as a VERSIONED parquet
    * artifact under `root/v=<N>` (next N = latest + 1; 256 rows → one
    * file). This is the piece that makes the "retrains offline, restart
    * picks up the new table" story real: the model survives the JVM, and
    * a restarted scoring stream ([[graft.streaming.Pipelines
    * .importanceScoreStored]]) resolves the LATEST version at plan build
    * — no session cache involved. Returns the written version. */
  def saveDsirModel(model: DataFrame, root: String): Int = {
    val s = model.sparkSession
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val next = latestDsirModelVersion(s, root).map(_ + 1).getOrElse(0)
    // version discovery skips TORN dirs (no committed footer — a crash
    // mid-write), so `next` may name one: clear it before the
    // errorifexists write, which otherwise guards against racing a
    // COMMITTED version, not a crash remnant
    val target = s"$root/v=$next"
    if (fs.exists(new org.apache.hadoop.fs.Path(target)) &&
        !graft.VersionedDirs.hasCommittedData(fs, target))
      fs.delete(new org.apache.hadoop.fs.Path(target), true)
    model.select(col("bucket").cast("int").as("bucket"), col("lq").cast("long").as("lq"))
      .coalesce(1)
      .write.mode("errorifexists").parquet(target)
    next
  }

  /** Load a stored model version (`version < 0` → latest). Fails loudly
    * when nothing is stored — a scoring stream must not silently start
    * with an empty model. */
  def loadDsirModel(s: SparkSession, root: String, version: Int = -1): DataFrame = {
    val v =
      if (version >= 0) version
      else latestDsirModelVersion(s, root).getOrElse(
        throw new IllegalStateException(s"no stored DSIR model under $root"))
    s.read.parquet(s"$root/v=$v")
  }

  private def latestDsirModelVersion(s: SparkSession, root: String): Option[Int] = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    graft.VersionedDirs.latest(fs, root, "v=")
  }

  def x77DsirSelect(s: SparkSession, dir: String, targetSource: String = "src0",
                    keepN: Int = 100, fast: Boolean = false): DataFrame = {
    val pdb = cachedDsirCounts(s, dir, fast)
    // 256-row log-ratio model ([[dsirLogRatioModel]]): the only
    // floating-point in the operator, quantized once
    val lq = dsirLogRatioModel(s, dir, targetSource, fast)
    val scored = pdb.join(broadcast(lq), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_feats"), sum(col("c") * col("lq")).as("score_q"))
    val top = documents(s, dir).select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("score_q"), lit(0L)).as("score_q"))
      // distributed top-N (TakeOrderedAndProject), never a global sort;
      // the rank window runs over the keepN survivors only
      .orderBy(col("score_q").desc, col("doc_id"))
      .limit(keepN)
    top
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score_q").desc, col("doc_id"))))
      .select(col("rank").cast("int").as("rank"), col("doc_id"), col("n_feats"),
        round(col("score_q").cast("double") / lit(1.0e6), 4).as("log_weight"))
      .orderBy(col("rank"))
  }

  /** x77b — x77 with the xxhash64 feature bucket ([[hashBucketFast]]):
    * the production hash path. At ~100M features per 1M docs the md5
    * digest+hex+conv chain is the probe-measured dominant cost; one
    * codegen'd XXH64 per feature removes it. Selection semantics, model
    * smoothing, quantization, and the top-N order are exactly x77's; the
    * oracle recomputes the bucket from the generated XXH64 SQL over the
    * (vocabulary-bounded) distinct-feature relation. */
  def x77bDsirSelectFast(s: SparkSession, dir: String): DataFrame =
    x77DsirSelect(s, dir, fast = true)
}
