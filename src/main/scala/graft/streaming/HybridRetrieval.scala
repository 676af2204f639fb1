package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval served ENTIRELY from maintained artifacts — the x41
  * reciprocal-rank fusion (Cormack et al. 2009) with both source
  * rankings read from stored indexes instead of per-session builds:
  *
  *  - lexical: [[MaintainedTextIndex.search]] over the stored postings
  *    (term-pruned scan, x32-exact BM25 arithmetic);
  *  - dense: [[MaintainedAnnIndex.searchRerank]] over the stored PQ
  *    codes (ADC shortlist + exact re-rank against the caller's raw
  *    vectors).
  *
  * Both rankings are top-`depth` heaps — control-plane sized — so the
  * fusion itself ([[graft.functions.Search.rrfFuse]], the identical x41
  * arithmetic) is broadcast work; the corpus cost is exactly one
  * term-pruned postings scan plus one ADC code scan, neither of which
  * re-reads raw text or re-encodes vectors. This is the serving-path
  * composition a production retrieval stack runs per query, which is
  * why it must come from the maintained artifacts: at 100 TB nobody
  * re-tokenizes the corpus or retrains a quantizer to answer a query. */
object HybridRetrieval {

  /** The lexical ranking both entry points fuse: BM25 top-depth from the
    * stored postings, ranked by (bm25 desc, doc_id) — the x41 lex
    * transform. One helper so a tie-break change cannot silently apply
    * to only one entry point. */
  private def lexRanked(text: MaintainedTextIndex, terms: Seq[String],
                        depth: Int): DataFrame =
    text.search(terms, depth)
      .select(col("doc_id").as("id"),
        row_number().over(
          Window.orderBy(col("bm25").desc, col("doc_id"))).as("r_lex"))

  /** The fusion is single-query (x41's shape): Ivfadc ranks restart per
    * query_id, so fusing a multi-query relation on id alone would
    * silently interleave rank lists into one garbage top-k — fail loudly
    * instead. */
  private def requireOneQuery(query: DataFrame): Unit = {
    val n = query.limit(2).count()
    require(n == 1,
      s"hybrid RRF fuses ONE query's rankings; got a $n-row query relation " +
        "— fuse per query (or extend the fuse to carry query_id)")
  }

  /** RRF top-k for one query: `terms` drive the lexical side, `query`
    * (a one-row `(vec_id, embedding)` relation) the dense side, and
    * `corpus` supplies raw vectors for the exact re-rank (only
    * shortlist-sized slices of it are read, via the broadcast semi-join
    * inside searchRerank). Output: (id, r_lex, r_dense, rrf) — x41's
    * shape. */
  def searchRrf(text: MaintainedTextIndex, ann: MaintainedAnnIndex,
                corpus: DataFrame, terms: Seq[String], query: DataFrame,
                k: Int = 10, depth: Int = graft.functions.Search.RrfDepth,
                nprobe: Int = 8): DataFrame = {
    requireOneQuery(query)
    val dense = ann.searchRerank(corpus, query, depth, nprobe)
      .select(col("neighbor_id").as("id"), col("rk").as("r_dense"))
    graft.functions.Search.rrfFuse(lexRanked(text, terms, depth), dense, k)
  }

  /** RRF top-k with the dense side ranked by ADC distance alone — for
    * callers that do not hold a raw-vector relation (the code store
    * deliberately stores only the 8-byte codes, and rank fusion never
    * compares score scales, so the quantized ranking slots straight in).
    * Deterministic: ADC distances tie-break on neighbor_id. */
  def searchRrfAdc(text: MaintainedTextIndex, ann: MaintainedAnnIndex,
                   terms: Seq[String], query: DataFrame,
                   k: Int = 10, depth: Int = graft.functions.Search.RrfDepth,
                   nprobe: Int = 8): DataFrame = {
    requireOneQuery(query)
    val dense = ann.search(query, depth, nprobe)
      .select(col("neighbor_id").as("id"), col("rk").as("r_dense"))
    graft.functions.Search.rrfFuse(lexRanked(text, terms, depth), dense, k)
  }

  /** x81 — the declared maintained-hybrid slice, the capstone of the
    * incremental-retrieval contract: build BOTH maintained pillars the
    * x79/x80 way (seed half, two live delta windows each), then answer
    * one hybrid query ENTIRELY from the stored artifacts via
    * [[searchRrf]] — term-pruned postings for the lexical ranking, the
    * stored model + tiered PQ codes (ADC shortlist depth 20, nprobe 3,
    * exact re-rank) for the dense ranking, fused by the x41 arithmetic.
    * The DuckDB oracle recomputes the whole stack from scratch: the x32
    * BM25 SQL for `r_lex` ⊕ the seed-trained IVFADC CTE unroll for
    * `r_dense` ([[graft.AnnOracleSql]]), so the full serving composition
    * — two index lifecycles plus the fusion — is hash-verified.
    * Scratch-root lifecycle in [[ScratchRoots]]. */
  def x81MaintainedHybridRrf(s: org.apache.spark.sql.SparkSession,
                             dir: String): DataFrame = {
    val docs = graft.Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val emb = graft.Tables.embeddings(s, dir)
    val text = new MaintainedTextIndex(s, ScratchRoots.create("graft_x81t_"),
      flushEvery = 1, maxDeltas = 2)
    val ann = new MaintainedAnnIndex(s, ScratchRoots.create("graft_x81a_"),
      flushEvery = 1, maxDeltas = 2)
    try {
      text.initIndex(docs.filter(pmod(col("doc_id"), lit(4)) < 2))
      text.ingestBatch(docs.filter(pmod(col("doc_id"), lit(4)) === 2), 0)(_ => ())
      text.ingestBatch(docs.filter(pmod(col("doc_id"), lit(4)) === 3), 1)(_ => ())
      ann.initIndex(emb.filter(pmod(col("vec_id"), lit(4)) < 2))
      ann.ingestBatch(emb.filter(pmod(col("vec_id"), lit(4)) === 2), 0)(_ => ())
      ann.ingestBatch(emb.filter(pmod(col("vec_id"), lit(4)) === 3), 1)(_ => ())
      searchRrf(text, ann, emb, graft.functions.Search.QueryTerms,
        emb.filter(col("vec_id") === 0), k = 10, depth = 20, nprobe = 3)
    } finally { text.close(); ann.close() }
  }
}
