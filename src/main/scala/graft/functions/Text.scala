package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language-ID heuristic,
  * n-gram shingling + Jaccard. All are pure column expressions (whole-stage
  * codegen, no UDFs), so they scale to 100 TB as embarrassingly parallel
  * map work followed by standard hash aggregation.
  */
object Text {

  /** Whitespace tokens, lowercased, empty-free. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => length(t) > 0)

  /** BPE-ish word-token count via regex (alnum runs), plus whitespace-token
    * count — two standard "token count" notions for corpus budgeting. */
  def wordTokenCount(c: Column): Column = regexp_count(c, lit("[A-Za-z0-9]+"))

  /** Distinct word-level n-gram shingles (default n=3). Empty when the
    * document has fewer than n tokens. Native single-pass expression
    * ([[graft.plans.WordGrams]]); [[shinglesHof]] is the declarative
    * reference form it is parity-pinned against (WordGramsParitySpec). */
  def shingles(toks: Column, n: Int = 3): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.WordGrams(
        org.apache.spark.sql.graft.ColumnBridge.expression(toks),
        n, distinct = true))

  /** The pre-r21 HOF form of [[shingles]] (interpreted lambda per gram per
    * document — kept as the parity reference). */
  private[graft] def shinglesHof(toks: Column, n: Int = 3): Column = {
    val grams = transform(sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    array_distinct(when(size(toks) >= n, grams).otherwise(array().cast("array<string>")))
  }

  /** Document fingerprint: md5 of whitespace-collapsed lowercase text —
    * the exact-dedup key (see Dedup.exactDedup). */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(c), "\\s+", " "))

  /** x70 — distinctive terms per source: top-5 terms by add-1 log-odds
    * versus the REST of the corpus, lo = ln((c+1)/(n_s−c+1)) −
    * ln((c_rest+1)/(n_rest−c_rest+1)) — the "what makes this source
    * different" inspection a curator runs before weighting sources (x64
    * says how much each source has; this says what it talks about).
    * Scale shape: one exploded-token shuffle into the (source, term)
    * relation, whose partial aggregation bounds the exchange by
    * |sources|·|vocab|; the term marginal joins on the SAME relation
    * (control-plane), source totals broadcast, and the per-source top-5
    * is a literal-bounded rank window (WindowGroupLimit map-side prune).
    * Every log input is an exact integer, so the ranking is bit-stable
    * across engines. Terms below `minCount` in a source are floored out. */
  def x70DistinctiveTerms(s: SparkSession, dir: String, minCount: Int = 5,
                          topK: Int = 5): DataFrame = {
    val tf = documents(s, dir)
      .select(col("source"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c"))
    val termTot = tf.groupBy(col("term")).agg(sum(col("c")).as("cw"))
    val srcTot = tf.groupBy(col("source")).agg(sum(col("c")).as("ns"))
    val n = tf.agg(sum(col("c")).as("n"))
    val lo = log((col("c").cast("double") + 1.0) /
        (col("ns").cast("double") - col("c").cast("double") + 1.0)) -
      log((col("cw").cast("double") - col("c").cast("double") + 1.0) /
        (col("n").cast("double") - col("ns").cast("double") -
          (col("cw").cast("double") - col("c").cast("double")) + 1.0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("log_odds").desc, col("term"))
    tf.filter(col("c") >= minCount)
      .join(termTot, "term")
      .join(broadcast(srcTot), "source")
      .crossJoin(broadcast(n))
      .select(col("source"), col("term"), col("c"), round(lo, 4).as("log_odds"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("source"), col("rk"), col("term"), col("c"), col("log_odds"))
      .orderBy(col("source"), col("rk"))
  }

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  /** Stopword-overlap score for one language. */
  def langScore(toks: Column, lang: String): Column = {
    val markers = langMarkers.toMap.apply(lang)
    size(filter(toks, t => t.isin(markers.map(m => m: Any): _*)))
  }

  /** Language-ID heuristic: argmax of marker-stopword hit counts, 'und'
    * (undetermined) when no marker hits. Deterministic tie-break by the
    * declaration order en > de > fr > es. */
  def langGuess(toks: Column): Column = {
    val scores = langMarkers.map { case (l, _) => l -> langScore(toks, l) }
    val maxScore = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, sc), els) =>
      when(sc === maxScore && sc > 0, lit(l)).otherwise(els)
    }
  }

  // ---- declared queries (oracle-checked) ----

  /** D21 — top-20 corpus tokens by frequency. Shuffle on token with map-side
    * partial counts; top-k via TakeOrderedAndProject (no global sort). */
  def d21TokenTopK(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(explode_outer(tokens(col("text"))).as("token"))
      .filter(col("token").isNotNull) // explode_outer: no inferred size()>0
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  /** Per-doc quality metrics: sizes, token counts, punctuation and stopword
    * ratios. */
  def x02DocQuality(s: SparkSession, dir: String): DataFrame = {
    val stop = Seq("the", "a", "and", "of", "to", "in")
    // stage the token array once — inlining `tokens(text)` into each consumer
    // would re-run the regex split per reference (CollapseProject keeps the
    // staging projection because the expression is non-cheap + multi-ref)
    documents(s, dir)
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"),
        length(col("text")).as("text_len"),
        wordTokenCount(col("text")).as("n_word_tokens"),
        size(col("toks")).as("n_ws_tokens"),
        // ANSI guard: int/int division THROWS on a zero denominator, and a
        // 100 TB crawl contains empty and null documents — the ratio of an
        // empty doc is defined as 0.0 (the x12 precedent)
        round(when(length(col("text")) > 0,
          regexp_count(col("text"), lit("[.,;:!?]")) / length(col("text")))
          .otherwise(lit(0.0)), 4).as("punct_ratio"),
        round(when(size(col("toks")) > 0,
          size(filter(col("toks"), t => t.isin(stop.map(x => x: Any): _*)))
            / size(col("toks"))).otherwise(lit(0.0)), 4)
          .as("stopword_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Language-ID guess per document with the en-marker score exposed. */
  def x03LangId(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), langGuess(col("toks")).as("guess_lang"),
        langScore(col("toks"), "en").as("score_en"), col("lang"))
      .orderBy(col("doc_id"))

  /** Rolling-hash document fingerprint (x15): the native codegen'd
    * Rabin–Karp polynomial fold ([[graft.plans.PolyFingerprint]]) as the
    * dedup key, with the group shape of x01 — fingerprint → group size +
    * kept doc. One map pass (no md5 hex materialization) + one shuffle on
    * the 8-byte key; the fingerprint family is *rolling* (O(1) window
    * slide), so the same expression underlies content-defined chunking. */
  def x15RollingFingerprint(s: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.register(s)
    documents(s, dir)
      .groupBy(call_function("poly_fingerprint", col("text")).as("fp64"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
      .orderBy(col("fp64"))
  }

  /** GPT-2-style pretokenizer regex, ASCII classes only and no lookahead so
    * Java (Spark) and RE2 (DuckDB) produce identical matches: contraction
    * suffixes, space-prefixed letter runs, digit runs, punctuation runs,
    * then bare whitespace. */
  val BpeTokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"

  /** x25 — token counting, whitespace vs BPE-ish: the pretraining-cost
    * estimator (BPE token counts are what context windows and training
    * budgets are measured in; the whitespace count is the cheap proxy).
    * Pure map-only column expressions over one staged regex pass each. */
  def x25TokenCount(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism) // row split, compute-bound
      .withColumn("toks", tokens(col("text")))
      .withColumn("bpe", regexp_extract_all(col("text"), lit(BpeTokenPattern), lit(0)))
      .select(col("doc_id"),
        size(col("toks")).as("n_ws_tokens"),
        size(col("bpe")).as("n_bpe_tokens"),
        round(when(size(col("toks")) > 0, size(col("bpe")) / size(col("toks")))
          .otherwise(lit(0.0)), 4).as("bpe_per_ws"))
      .orderBy(col("doc_id"))

  /** Deterministic multibyte projection of the corpus: lowercase, then
    * code-point substitutions that inject 2-byte (ä, é) and 3-byte (数)
    * UTF-8 sequences into every document. The testdata corpus is
    * ASCII-only by data contract, so the multibyte surface (tokenizer,
    * byte-length vs code-point arithmetic, fingerprints over UTF-8 bytes)
    * would otherwise go unexercised by the oracle gate; this projection is
    * the SAME expression in Spark and DuckDB (both `translate`s are
    * code-point-based), making the u-queries a real multibyte slice over
    * the driver's own tables rather than a synthetic side corpus. */
  def utf8Text(c: Column): Column =
    translate(lower(c), "aet", "äé数")

  /** u01 — the tokenizer/counting surface over MULTIBYTE text: code-point
    * vs byte lengths (equal only on ASCII — this query pins the
    * distinction), whitespace tokens, the GPT-2-style pretokenizer (its
    * ASCII classes put multibyte runs in the punctuation branch — Java and
    * RE2 agree code-point-wise on BMP input), and the md5 fingerprint of
    * the UTF-8 bytes. Map-only except the output sort. */
  def u01Utf8Tokens(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .withColumn("utext", utf8Text(col("text")))
      .select(col("doc_id"),
        length(col("utext")).as("n_cp"),
        expr("octet_length(utext)").as("n_bytes"),
        size(tokens(col("utext"))).as("n_ws_tokens"),
        size(regexp_extract_all(col("utext"), lit(BpeTokenPattern), lit(0))).as("n_bpe_tokens"),
        md5(col("utext").cast("binary")).as("fp_md5"))
      .orderBy(col("doc_id"))

  /** u02 — the xxhash64 fingerprint family over MULTIBYTE text: Spark's
    * `xxhash64` hashes the UTF-8 bytes, and the oracle recomputes XXH64
    * over the true byte sequence (hex-materialized — `XxhashSql`'s UTF-8
    * mode), so the engine's fast non-cryptographic fingerprint path is
    * oracle-verified beyond the ASCII data contract. */
  def u02Utf8Xxhash(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .withColumn("utext", utf8Text(col("text")))
      .select(col("doc_id"), xxhash64(col("utext")).as("fp64"))
      .orderBy(col("doc_id"))

  /** x42 — content-defined chunking: split every document at rolling-hash
    * boundaries ([[graft.plans.CdcBoundaries]], O(n) codegen'd sliding
    * window) and fingerprint each chunk. Insert-shift-stable: an edit early
    * in a doc changes at most the chunks it touches, so downstream chunk-
    * level dedup (group by chunk_fp — x01's shape on chunk granularity)
    * survives byte-offset shifts that defeat fixed-size chunking. Map-only:
    * boundary detection, explode, and fingerprints never shuffle; the only
    * exchange is the output sort. Positions are code points (== chars on
    * this ASCII corpus, which is what lets the DuckDB oracle recompute the
    * windows with substr arithmetic). */
  def x42CdcChunks(s: SparkSession, dir: String): DataFrame =
    cdcChunksOf(s, documents(s, dir))

  /** u04 — CDC chunking over MULTIBYTE text ([[utf8Text]]): boundary
    * positions, chunk lengths, and the substring arithmetic feeding each
    * chunk's fingerprint are all CODE-POINT quantities ([[graft.plans
    * .CdcBoundaries]] and [[graft.plans.PolyFingerprint]] walk
    * `codePointAt`; Spark `substring` and DuckDB `substr`/`ascii` count
    * characters), so the oracle pins that none of them silently degrade
    * to byte offsets once 2- and 3-byte sequences appear. */
  def u04Utf8CdcChunks(s: SparkSession, dir: String): DataFrame =
    cdcChunksOf(s, documents(s, dir).withColumn("text", utf8Text(col("text"))))

  /** u06 — the rolling polynomial fingerprint over MULTIBYTE text: the
    * native codegen'd [[graft.plans.PolyFingerprint]] folds CODE POINTS
    * (h·31 + cp mod p, walking `codePointAt`), and the oracle replays the
    * same fold with DuckDB's character-counted `substr` + code-point
    * `ascii()` — so the custom-Expression fingerprint path (x15's dedup
    * grouping key) is pinned to code-point semantics, not bytes, once 2-
    * and 3-byte sequences appear. */
  def u06Utf8RollingFingerprint(s: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.register(s)
    documents(s, dir)
      .withColumn("text", utf8Text(col("text")))
      .groupBy(call_function("poly_fingerprint", col("text")).as("fp64"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
      .orderBy(col("fp64"))
  }

  /** The [[utf8Text]] mapping applied to a Scala literal: a stop list (or
    * any marker vocabulary) matched against the projected corpus must be
    * projected with it, or every multibyte-touched stop silently stops
    * matching and the quality signals degrade to noise. Same 1:1
    * code-point substitution as the SQL `translate`. */
  private[graft] def utf8Lit(x: String): String =
    x.toLowerCase.map {
      case 'a' => 'ä'; case 'e' => 'é'; case 't' => '数'; case c => c
    }

  /** u07 — the QUALITY-SIGNAL surface over MULTIBYTE text: the x02
    * length / word-token / punctuation / stopword measures computed on the
    * [[utf8Text]] projection, with the stop list projected alongside the
    * corpus ([[utf8Lit]]). Pins that every quality ratio stays a
    * CODE-POINT quantity (`length`, `regexp_count` and the token regexes
    * count characters in both engines — a byte-based regress would shift
    * `punct_ratio` denominators and break the hash) and that multibyte
    * string equality in the stop filter matches whole code points. The
    * u01–u06 slice covers tokenize/fingerprint; this extends it to the
    * quality-scoring family (Rae et al. 2021's filters are exactly these
    * measures), the last text family still exercised only under the ASCII
    * data contract. Map-only except the output sort, like x02. */
  def u07Utf8Quality(s: SparkSession, dir: String): DataFrame = {
    val stop = Seq("the", "a", "and", "of", "to", "in").map(utf8Lit)
    documents(s, dir)
      .withColumn("utext", utf8Text(col("text")))
      .withColumn("toks", tokens(col("utext")))
      .select(col("doc_id"),
        length(col("utext")).as("text_len"),
        wordTokenCount(col("utext")).as("n_word_tokens"),
        size(col("toks")).as("n_ws_tokens"),
        round(when(length(col("utext")) > 0,
          regexp_count(col("utext"), lit("[.,;:!?]")) / length(col("utext")))
          .otherwise(lit(0.0)), 4).as("punct_ratio"),
        round(when(size(col("toks")) > 0,
          size(filter(col("toks"), t => t.isin(stop.map(x => x: Any): _*)))
            / size(col("toks"))).otherwise(lit(0.0)), 4)
          .as("stopword_ratio"))
      .orderBy(col("doc_id"))
  }

  /** The standing x32 query terms under the [[utf8Text]] code-point map
    * ([[utf8Lit]] — the one place the mapping lives): "häsh", "join",
    * "window", "véc数or" — terms carrying 2- AND 3-byte sequences, plus
    * untouched ASCII controls. */
  val U10Terms: Seq[String] = Search.QueryTerms.map(utf8Lit)

  /** u10 — BM25 retrieval over MULTIBYTE text: the x32 scorer
    * ([[Search.bm25TopK]], unchanged arithmetic) with query terms
    * carrying 2- and 3-byte code points over the [[utf8Text]] projection.
    * Term equality, per-doc tf counting, df aggregation, and the dl
    * arithmetic (code-point token lengths) are all exercised on
    * multibyte tokens — the retrieval family's slice of the multibyte
    * contract u01–u09 established for the dedup/fingerprint/quality/BPE
    * families. */
  def u10Utf8Bm25(s: SparkSession, dir: String): DataFrame =
    Search.bm25TopK(
      documents(s, dir).select(col("doc_id"), utf8Text(col("text")).as("text")),
      U10Terms, 20)

  /** u08 — the Gopher repetition/format gate over MULTIBYTE text: x78's
    * rule battery on the [[utf8Text]] projection with the stop list
    * projected ([[utf8Lit]]). Beyond u07's ratios this pins the
    * mean-word-length arithmetic (token `length` = code points, so a
    * 3-byte 数 counts 1), the symbol counts (the `#`/`...` regexes must
    * not double-count inside multibyte sequences), and the `[a-z]` alpha
    * test (a projected word like "ä" has NO remaining ASCII letter and
    * must drop out of `n_alpha_words` in both engines). */
  def u08Utf8Gopher(s: SparkSession, dir: String,
                    stops: Seq[String] = GopherStops,
                    minStopHits: Int = 2): DataFrame =
    gopherRulesOf(documents(s, dir).withColumn("text", utf8Text(col("text"))),
      stops.map(utf8Lit), minStopHits)

  private def cdcChunksOf(s: SparkSession, docs: DataFrame): DataFrame = {
    graft.plans.GraftExtensions.register(s)
    docs
      .withColumn("b", call_function("cdc_chunks", col("text")))
      .select(col("doc_id"), col("text"), posexplode(col("b")), col("b"))
      .select(col("doc_id"), col("text"),
        col("pos").as("chunk_no"),
        when(col("pos") === 0, lit(0)).otherwise(element_at(col("b"), col("pos")))
          .as("start_cp"),
        col("col").as("end_cp"))
      .withColumn("chunk_len", col("end_cp") - col("start_cp"))
      .withColumn("chunk_fp", call_function("poly_fingerprint",
        expr("substring(text, start_cp + 1, chunk_len)")))
      .select(col("doc_id"), col("chunk_no"), col("start_cp"),
        col("chunk_len"), col("chunk_fp"))
      .orderBy(col("doc_id"), col("chunk_no"))
  }

  /** x43 — chunk-level dedup statistics: what content-defined chunking
    * saves. Group x42's chunk fingerprints corpus-wide (one shuffle on the
    * 8-byte fp — x01's shape at chunk granularity) and report the
    * deduplicated storage fraction: chunks sharing a fingerprint store one
    * copy. The one-row summary is the capacity-planning number a
    * CDC-chunked object store quotes. */
  def x43ChunkDedupStats(s: SparkSession, dir: String): DataFrame =
    x42CdcChunks(s, dir)
      .groupBy(col("chunk_fp"))
      .agg(count(lit(1)).as("cnt"), min(col("chunk_len")).as("len"))
      .agg(
        sum(col("cnt")).as("n_chunks"),
        count(lit(1)).as("n_distinct"),
        sum(col("cnt") * col("len")).as("total_cp"),
        sum(col("len")).as("unique_cp"))
      .select(col("n_chunks"), col("n_distinct"), col("total_cp"), col("unique_cp"),
        round(lit(1.0) - col("unique_cp").cast("double") / col("total_cp"), 4)
          .as("saved_frac"))

  /** x44 — chunk-level near-dup pairs: docs sharing ≥ [[ChunkNearDupThreshold]]
    * Jaccard over their CDC chunk-fingerprint SETS. Because x42 boundaries
    * are content-defined, this pair relation is robust to insertions that
    * shift every byte offset (the failure mode of offset-based similarity)
    * — the chunk-granularity complement to x16's shingle-level verifier.
    * Scale shape mirrors x06: one shuffle groups docs by chunk_fp with
    * degenerate fps capped at [[Dedup.MaxBucket]] sharers (a boilerplate
    * chunk shared by everything must not emit n²/2 pairs), and each
    * surviving bucket emits exactly C(n,2) combination rows via
    * posexplode + slice (no within-bucket self-join squaring the rows
    * before the d1<d2 filter); shared counts aggregated per pair, sizes
    * joined back broadcast-wise. */
  val ChunkNearDupThreshold = 0.5

  def x44ChunkNearDups(s: SparkSession, dir: String): DataFrame = {
    val chunks = x42CdcChunks(s, dir)
      .select(col("doc_id"), col("chunk_fp")).distinct()
    val sizes = chunks.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pairs = Dedup.combinationPairs(chunks
        .groupBy(col("chunk_fp"))
        .agg(collect_list(col("doc_id")).as("ids"))
        .filter(size(col("ids")).between(2, Dedup.MaxBucket)))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))
      .withColumn("jaccard",
        round(col("n_shared") / (col("n1") + col("n2") - col("n_shared")), 4))
      .filter(col("jaccard") >= ChunkNearDupThreshold)
      .select(col("d1"), col("d2"), col("n_shared"), col("jaccard"))
      .orderBy(col("d1"), col("d2"))
  }

  /** Trigram Jaccard similarity between consecutive doc pairs (doc_id,
    * doc_id+1) — the SQL-oracle-checkable slice of n-gram near-dup. */
  def x04TrigramJaccard(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), shingles(col("toks")).as("tg"))
    val a = d.select(col("doc_id").as("d1"), col("tg").as("tg1"))
    val b = d.select(col("doc_id").as("d2"), col("tg").as("tg2"))
    val inter = size(array_intersect(col("tg1"), col("tg2")))
    val uni = size(array_union(col("tg1"), col("tg2")))
    a.join(b, col("d1") + 1 === col("d2"))
      .select(col("d1"), col("d2"),
        when(uni === 0, lit(0.0)).otherwise(round(inter / uni, 4)).as("jaccard"))
      .orderBy(col("d1"))
  }

  /** x50 — per-language quality tiers: rank every document into a decile
    * by its stopword-density quality signal (x02's ratio, rounded before
    * ranking so the order is fp-stable) WITHIN its language — the tier
    * assignment curriculum-style training mixes sample from ("tier 1 of
    * each language first"). Composition of x02's map-only scoring with
    * d40's rank-family window: one shuffle on the language key, total tie
    * order via doc_id. */
  def x50QualityTiers(s: SparkSession, dir: String): DataFrame = {
    val stop = Seq("the", "a", "and", "of", "to", "in")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("stop_r").desc, col("doc_id"))
    documents(s, dir)
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), col("lang"),
        round(when(size(col("toks")) > 0,
          size(filter(col("toks"), t => t.isin(stop.map(x => x: Any): _*)))
            / size(col("toks"))).otherwise(lit(0.0)), 4).as("stop_r"))
      .withColumn("tier", ntile(10).over(w))
      .orderBy(col("doc_id"))
  }

  /** Gopher-rule word-count band (Rae et al. 2021 App. A1.1). */
  val GopherMinWords = 50
  val GopherMaxWords = 100000
  /** The Gopher stopword-presence list (≥ 2 must appear). */
  val GopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** x78 — Gopher-style rule filter (Rae et al. 2021, Appendix A1.1): the
    * composite document-level quality gate most pretraining corpora start
    * from. Per doc, the rule SIGNALS and per-rule verdicts:
    *
    *  - word count within [[GopherMinWords]]..[[GopherMaxWords]];
    *  - mean word length in [3, 10];
    *  - symbol-to-word ratio (`#` and `...`) below 0.1;
    *  - ≥ 80% of words contain an alphabetic character;
    *  - ≥ 2 distinct members of [[GopherStops]] present;
    *
    * plus the AND of all five (`keep`). Every signal is exact integer
    * arithmetic with one guarded division (rounded to 4), so the oracle
    * reproduces it bit-for-bit; line-level rules (bullet/ellipsis line
    * fractions) are omitted because the synthetic corpus is single-line —
    * the signals here are the content-bearing subset. Map-only: one scan,
    * one staged token projection, no shuffle but the output sort.
    *
    * The stopword-presence list is a parameter because it is
    * language/domain-specific by Gopher's own account: [[GopherStops]] is
    * the paper's English list, and the DECLARED query passes the
    * synthetic corpus's actual function words ("the", "a" — the only
    * members of any standard list in its 31-word vocabulary), which keeps
    * the rule discriminative instead of vacuously false. */
  def x78GopherRules(s: SparkSession, dir: String,
                     stops: Seq[String] = GopherStops,
                     minStopHits: Int = 2): DataFrame =
    gopherRulesOf(documents(s, dir), stops, minStopHits)

  /** The x78 rule battery over an arbitrary `(doc_id, text)` relation —
    * shared by the declared x78 (raw corpus) and u08 (the [[utf8Text]]
    * multibyte projection). */
  private[graft] def gopherRulesOf(docs: DataFrame, stops: Seq[String],
                                   minStopHits: Int): DataFrame = {
    val d = docs.withColumn("toks", tokens(col("text")))
    val nWords = size(col("toks"))
    val sumLen = coalesce(
      aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t)), lit(0L))
    val nSymbols =
      (length(col("text")) - length(regexp_replace(col("text"), lit("#"), lit("")))).cast("long") +
        ((length(col("text")) - length(regexp_replace(col("text"), lit("\\.\\.\\."), lit("")))) / 3).cast("long")
    val nAlpha = size(filter(col("toks"), t => t.rlike("[a-z]")))
    val nStops = size(array_intersect(array_distinct(col("toks")),
      typedlit(stops)))
    d.select(col("doc_id"),
        coalesce(nWords, lit(0)).cast("long").as("n_words"),
        round(when(nWords > 0, sumLen.cast("double") / nWords).otherwise(lit(0.0)), 4)
          .as("mean_word_len"),
        coalesce(nSymbols, lit(0L)).as("n_symbols"),
        round(when(nWords > 0, nSymbols.cast("double") / nWords).otherwise(lit(0.0)), 4)
          .as("symbol_ratio"),
        coalesce(nAlpha, lit(0)).cast("long").as("n_alpha_words"),
        coalesce(nStops, lit(0)).cast("long").as("n_stop_hits"))
      .withColumn("ok_words",
        col("n_words") >= GopherMinWords && col("n_words") <= GopherMaxWords)
      .withColumn("ok_wlen",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("ok_symbols", col("symbol_ratio") < 0.1)
      .withColumn("ok_alpha",
        col("n_words") > 0 &&
          col("n_alpha_words").cast("double") >= col("n_words").cast("double") * 0.8)
      .withColumn("ok_stops", col("n_stop_hits") >= minStopHits)
      .withColumn("keep",
        col("ok_words") && col("ok_wlen") && col("ok_symbols") &&
          col("ok_alpha") && col("ok_stops"))
      .orderBy(col("doc_id"))
  }
}
