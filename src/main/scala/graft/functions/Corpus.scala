package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables._

/** Corpus-frequency operators: statistics that need one global pass over
  * the corpus's n-grams and then score every document against the result —
  * the shape behind n-gram LM quality filtering (CCNet/Gopher-style) and
  * substring-level deduplication (Lee et al. 2022, approximated at n-gram
  * granularity).
  *
  * Scale shape, both operators: the exploded gram relation is computed ONCE
  * and persisted (the same shared-relation topology as Dedup.cachedShingles
  * — it feeds both the model aggregation and the scoring join); the model
  * side is aggregated with map-side partial counts. For x28 the model is
  * vocabulary-bounded (|vocab|² rows worst case, independent of corpus
  * size) so the scoring join BROADCASTS it and the corpus never shuffles on
  * the gram; for x29 the gram-frequency relation is corpus-sized by nature,
  * so the scoring join is a plain shuffle join on the gram key — that
  * shuffle IS the substring-dedup cost at 100 TB (hash-partitioned, AQE
  * handles skewed hot grams), and the final per-doc aggregate shuffles once
  * more on doc_id.
  */
object Corpus {

  /** Positional (non-distinct) bigrams — LM events, one per adjacent token
    * pair. Distinctness would undercount repeated events. */
  def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Positional word n-grams (default n=5): one per start position, NOT
    * deduplicated — x29 measures the fraction of *positions* covered by
    * cross-doc repeats, so every occurrence counts. Native single-pass
    * expression ([[graft.plans.WordGrams]]); [[posGramsHof]] is the
    * parity reference. */
  def posGrams(toks: Column, n: Int = 5): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.WordGrams(
        org.apache.spark.sql.graft.ColumnBridge.expression(toks),
        n, distinct = false))

  /** The pre-r21 HOF form of [[posGrams]] (parity reference). */
  private[graft] def posGramsHof(toks: Column, n: Int = 5): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  // one persisted exploded-gram relation per (session, dir, kind): both the
  // model/frequency aggregation and the scoring join consume it, and
  // without the persist Spark would re-run the tokenize+explode pipeline
  // for each consumer (the x22 lesson: inferred filters re-inline staged
  // expensive columns)
  private val gramCache = graft.GraftCaches.register(new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())

  /** (doc_id, gram) exploded relation; explode_outer keeps a null-gram row
    * for docs too short to produce any gram, so every doc survives into the
    * per-doc aggregate with a zero count. */
  def gramRelation(docs: DataFrame, mk: Column => Column): DataFrame =
    docs
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode_outer(mk(col("toks"))).as("gram"))

  private def cachedGrams(s: SparkSession, dir: String, kind: String,
                          mk: Column => Column): DataFrame = {
    val key = s"${System.identityHashCode(s)}|$dir|$kind"
    // persist PARTITIONED BY gram: the cached partitioning then satisfies
    // the model/frequency aggregates and the x29 scoring join with zero
    // further gram exchanges (InMemoryTableScan reports the cached plan's
    // partitioning) — one shuffle at fill time replaces two per consumer.
    // The doc-side repartition before the explode still balances the
    // tokenize work across cores (it is the map side of the gram shuffle).
    gramCache.computeIfAbsent(key, _ =>
      gramRelation(
        documents(s, dir).repartition(s.sparkContext.defaultParallelism), mk)
        .repartition(col("gram"))
        .persist(StorageLevel.MEMORY_AND_DISK))
  }

  /** x28 — bigram LM quality scoring: score every document against the
    * corpus's own bigram statistics. Per doc: event count, the average
    * corpus frequency of its bigram events (high = formulaic/templated
    * text), and the fraction of events seen nowhere else in the corpus
    * (high = unique — or garbled — text). This is the integer-arithmetic
    * core of perplexity-based quality filtering: avg corpus frequency is a
    * monotone proxy for avg log-probability under the corpus LM, kept
    * log-free so the DuckDB oracle matches bit-for-bit. */
  def bigramLm(grams: DataFrame): DataFrame = {
    // vocabulary-bounded model: |distinct bigrams| ≤ |vocab|² regardless of
    // corpus row count -> broadcast, the corpus side never shuffles
    val model = grams.filter(col("gram").isNotNull)
      .groupBy(col("gram")).agg(count(lit(1)).as("c"))
    grams
      .join(broadcast(model), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("gram")).as("n_bigrams"),
        round(coalesce(avg(col("c")), lit(0.0)), 4).as("avg_bigram_count"),
        round(coalesce(avg((col("c") === 1).cast("double")), lit(0.0)), 4).as("rare_frac"))
      .orderBy(col("doc_id"))
  }

  def x28BigramLm(s: SparkSession, dir: String): DataFrame =
    bigramLm(cachedGrams(s, dir, "bigram", bigrams(_)))

  /** x63 — LM perplexity scoring (the CCNet quality signal x28 keeps
    * log-free): per-doc cross-entropy and perplexity under the corpus's
    * own MLE bigram model, p(w2|w1) = c(w1 w2) / Σ_w c(w1 w) — the
    * conditional is normalized over OBSERVED successors, so every scored
    * event has positive probability and no smoothing constant enters the
    * oracle. Scale shape is x28's: the model and its first-token context
    * totals are vocabulary-bounded (≤ |vocab|² rows) and pre-joined into
    * one (gram → −ln p) relation broadcast against the cached gram
    * relation — the corpus never shuffles, and the per-doc aggregate rides
    * the gram relation's existing partitioning. Docs with no bigrams score
    * cross_entropy 0 / ppl 1 (the empty-product convention). */
  def x63LmPerplexity(s: SparkSession, dir: String): DataFrame = {
    val grams = cachedGrams(s, dir, "bigram", bigrams(_))
    val model = grams.filter(col("gram").isNotNull)
      .groupBy(col("gram")).agg(count(lit(1)).as("c"))
    val ctx = model.groupBy(substring_index(col("gram"), " ", 1).as("w1"))
      .agg(sum(col("c")).as("c1"))
    val nlp = model
      .withColumn("w1", substring_index(col("gram"), " ", 1))
      .join(ctx, "w1")
      .select(col("gram"), (-(log(col("c")) - log(col("c1")))).as("nlp"))
    grams.join(broadcast(nlp), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("gram")).as("n_bigrams"),
        round(coalesce(avg(col("nlp")), lit(0.0)), 4).as("cross_entropy"),
        round(coalesce(exp(avg(col("nlp"))), lit(1.0)), 4).as("ppl"))
      .orderBy(col("doc_id"))
  }

  /** x67 — PMI collocations: the top-`topK` word pairs by pointwise mutual
    * information, PMI = ln(c12·N / (c1·c2)) with marginals derived FROM the
    * bigram model itself (c1 = Σ c12(w,·), c2 = Σ c12(·,w), N = Σ c12) —
    * the standard collocation miner ("new york"-style units) a tokenizer
    * pipeline runs before vocabulary decisions (x37's BPE learns them
    * implicitly; this surfaces them as a ranked relation). Everything
    * after the shared gram cache runs on the vocab-bounded model relation:
    * marginals are control-plane aggs joined back, N is one scalar
    * broadcast (x32's discipline), and the top-K is a heap. Every input to
    * the PMI expression is an exact integer, so the double arithmetic is
    * bit-identical across engines — no rounding dependence in the ranking.
    * Products are computed in doubles (counts² overflows BIGINT at corpus
    * scale). Rare pairs below `minCount` are noise-floored out first. */
  def x67PmiCollocations(s: SparkSession, dir: String, minCount: Int = 5,
                         topK: Int = 100): DataFrame = {
    val m = cachedGrams(s, dir, "bigram", bigrams(_))
      .filter(col("gram").isNotNull)
      .groupBy(col("gram")).agg(count(lit(1)).as("n_pair"))
    val left = m.groupBy(substring_index(col("gram"), " ", 1).as("w1"))
      .agg(sum(col("n_pair")).as("n_left"))
    val right = m.groupBy(substring_index(col("gram"), " ", -1).as("w2"))
      .agg(sum(col("n_pair")).as("n_right"))
    val total = m.agg(sum(col("n_pair")).as("n_total"))
    val ranked = m.filter(col("n_pair") >= minCount)
      .withColumn("w1", substring_index(col("gram"), " ", 1))
      .withColumn("w2", substring_index(col("gram"), " ", -1))
      .join(left, "w1").join(right, "w2")
      .crossJoin(broadcast(total))
      .select(col("gram"), col("n_pair"), col("n_left"), col("n_right"),
        round(log((col("n_pair").cast("double") * col("n_total").cast("double")) /
          (col("n_left").cast("double") * col("n_right").cast("double"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("gram")).limit(topK)
    ranked.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("pmi").desc, col("gram"))))
      .orderBy(col("rk"))
  }

  /** Minimum distinct-document frequency for a gram to count as a
    * cross-doc repeat in x29. */
  val DupSpanMinDocs = 2

  /** Flag threshold: docs whose positional grams are mostly cross-doc
    * repeats are boilerplate/template shells. */
  val DupSpanFlag = 0.5

  /** x29 — cross-doc repeated n-gram spans (substring-dedup signal): for
    * each document, the fraction of its positional 5-grams that also occur
    * in at least one OTHER document. Lee et al. remove the repeated spans
    * themselves; the per-doc fraction is the query-shaped summary (the span
    * remover consumes the same joined relation). Two shuffles by design:
    * gram -> distinct-doc frequency, then doc_id -> per-doc fraction. */
  def dupSpans(grams: DataFrame): DataFrame = {
    val df = grams.filter(col("gram").isNotNull)
      .groupBy(col("gram")).agg(countDistinct(col("doc_id")).as("df"))
    grams
      .join(df, Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("gram")).as("n_grams"),
        round(coalesce(avg((col("df") >= DupSpanMinDocs).cast("double")), lit(0.0)), 4)
          .as("dup_frac"))
      .withColumn("flagged", col("dup_frac") > DupSpanFlag)
      .orderBy(col("doc_id"))
  }

  def x29DupSpans(s: SparkSession, dir: String): DataFrame =
    dupSpans(cachedGrams(s, dir, "pos5", posGrams(_)))

  /** x54 — cross-doc repeated-span REMOVAL: the rewrite step x29 only
    * measures (Lee et al. 2022 remove the repeated spans themselves
    * before training). A token position is covered iff some positional
    * 5-gram starting at-or-spanning it occurs in ≥ [[DupSpanMinDocs]]
    * distinct documents; covered positions are dropped and the remaining
    * tokens re-joined in order.
    *
    * Scale shape: the indexed gram relation is tokenized, fanned out and
    * gram-partitioned ONCE into a persisted cache shared by BOTH the
    * document-frequency aggregate and the coverage join (plain exchange
    * reuse cannot serve here — the df side prunes `pos`, so the two
    * subtrees differ); coverage expansion is ≤ n rows per repeated gram;
    * the rebuild is one (doc, pos) anti-join plus one per-doc aggregate. */
  /** Indexed positional-gram relation (doc_id, pos, gram), gram-partitioned
    * and persisted — x54's df aggregate and coverage join both consume it,
    * and WITHOUT the persist each consumer re-runs the tokenize+fan-out
    * pipeline (column pruning makes the two subtrees differ — the df side
    * drops `pos` — so AQE exchange reuse cannot kick in; measured as two
    * materialized gram exchanges). Same cache discipline as [[cachedGrams]]. */
  private def cachedIndexedGrams(s: SparkSession, dir: String, n: Int): DataFrame = {
    val key = s"${System.identityHashCode(s)}|$dir|pos${n}i"
    gramCache.computeIfAbsent(key, _ =>
      documents(s, dir)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
        .select(col("doc_id"), posexplode(posGrams(col("toks"), n)).as(Seq("pos", "gram")))
        .repartition(col("gram"))
        .persist(StorageLevel.MEMORY_AND_DISK))
  }

  /** x68 — intra-doc self-repetition spans: the fraction of a document's
    * token positions covered by a positional n-gram occurring ≥2 times
    * WITHIN THE SAME document — the within-doc complement of x29/x54's
    * cross-doc signal (catches looped boilerplate and generation
    * degeneration that x23's ratio stats only hint at). One exchange: the
    * gram-partitioned cache is repartitioned by doc_id once, and the
    * repeat-count window, coverage explode, (doc, pos) distinct, and
    * per-doc aggregate ALL ride that single partitioning (each needs only
    * doc_id-clustering, which hash(doc_id) satisfies). */
  def x68SelfRepetition(s: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val byDoc = cachedIndexedGrams(s, dir, n).repartition(col("doc_id"))
    val wk = org.apache.spark.sql.expressions.Window.partitionBy("doc_id", "gram")
    val covered = byDoc.withColumn("k", count(lit(1)).over(wk))
      .filter(col("k") >= 2)
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("cpos"))
      .distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_covered"))
    documents(s, dir)
      .select(col("doc_id"),
        coalesce(size(Text.tokens(col("text"))), lit(0)).cast("long").as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_covered"), lit(0L)).as("n_self_repeat"),
        when(col("n_tokens") > 0,
          round(coalesce(col("n_covered"), lit(0L)).cast("double") /
            col("n_tokens").cast("double"), 4)).otherwise(0.0).as("self_repeat_frac"))
      .orderBy(col("doc_id"))
  }

  def x54SpanRemoval(s: SparkSession, dir: String, n: Int = 5,
                     minDocs: Int = DupSpanMinDocs): DataFrame = {
    val gi = cachedIndexedGrams(s, dir, n)
    val df = gi.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDocs)
    // everything downstream of the coverage expansion is doc_id-keyed, so
    // cluster BOTH relations by doc_id alone (hash(doc_id) satisfies the
    // (doc_id, cpos) distinct, the (doc_id, pos) anti join, AND the per-doc
    // rebuild aggregate — guide §2.4 "share one exchange"): the old shape
    // paid three corpus-scale exchanges here ((doc_id,cpos) distinct,
    // (doc_id,pos) anti-join side, doc_id rebuild), the new one pays two —
    // and the token-position exchange is shared by the rebuild count, so
    // the corpus is tokenized ONCE, not twice (the old final join re-ran
    // Text.tokens over every document just for size(toks))
    val covered = gi.join(df, Seq("gram"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("cpos"))
      .repartition(col("doc_id"))
      .dropDuplicates(Seq("doc_id", "cpos"))
    val tokPos = documents(s, dir)
      .select(col("doc_id"), posexplode(Text.tokens(col("text"))).as(Seq("pos", "tok")))
      .repartition(col("doc_id"))
    // per-doc counts are DERIVED, not re-tokenized: every covered position
    // is a valid token position (cpos ≤ size(toks) − 1 by construction)
    // and kept = positions ∖ covered, so n_tokens = n_kept + n_covered
    // and n_removed = n_covered — both ride the relations' existing
    // doc_id clustering, and the corpus is tokenized exactly ONCE (a
    // second size(toks) pass, or a twin count subtree over tokPos, cannot
    // share the tokenize: column pruning differentiates the subtrees and
    // defeats exchange reuse — PlanAuditSpec pins the single tokenize)
    val nCov = covered.groupBy(col("doc_id")).agg(count(lit(1)).as("n_covered"))
    val kept = tokPos.join(covered,
      tokPos("doc_id") === covered("doc_id") && tokPos("pos") === covered("cpos"),
      "left_anti")
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", expr("transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)"))
          .as("cleaned"))
    documents(s, dir).select(col("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left")
      .join(nCov, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("n_kept"), lit(0L)) + coalesce(col("n_covered"), lit(0L)))
          .as("n_tokens"),
        coalesce(col("n_covered"), lit(0L)).as("n_removed"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
      .orderBy(col("doc_id"))
  }

  /** x49 — n-gram novelty: per document, the fraction of its distinct
    * 3-token shingles whose FIRST corpus occurrence (min doc_id) is this
    * document. The running novelty curve is how a pipeline detects that a
    * crawl snapshot has gone stale (novelty → 0 means the new batch is
    * re-crawling what the corpus already holds). Same two-shuffle shape as
    * x29 — gram → first-occurrence aggregate, then doc_id roll-up — and
    * both ride the gram-partitioned cached relation, so the first-seen
    * aggregate and the scoring join add zero further gram exchanges. */
  def x49NgramNovelty(s: SparkSession, dir: String): DataFrame = {
    val g = cachedGrams(s, dir, "tri", Text.shingles(_))
    val first = g.filter(col("gram").isNotNull)
      .groupBy(col("gram")).agg(min(col("doc_id")).as("first_doc"))
    g.join(first, Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("gram")).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), lit(1L)).otherwise(lit(0L)))
          .as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        round(when(col("n_grams") > 0,
          col("n_novel").cast("double") / col("n_grams")).otherwise(lit(0.0)), 4)
          .as("novelty"))
      .orderBy(col("doc_id"))
  }
}
