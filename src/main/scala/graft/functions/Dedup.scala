package graft.functions

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables._
import graft.functions.Text.{fingerprint, shingles, tokens}

/** Deduplication operators, exact and near-dup, for training-data curation:
  *
  *  - exact: md5 fingerprint of normalized text → hash groupBy (one shuffle
  *    on the fingerprint; the canonical 100 TB dedup);
  *  - MinHash + LSH banding: shingle → per-band min-hash → equi-join on
  *    (band, hash) buckets — candidate pairs without the all-pairs product;
  *  - SimHash: 64-bit near-dup signature per doc, plus a bit-band bucketed
  *    Hamming-distance pair consumer;
  *  - n-gram Jaccard: verification metric for candidate pairs;
  *  - embedding cosine near-dup: LSH-bucketed pair generation.
  *
  * MinHash here comes in two parity-tested forms: an md5-derived string-hash
  * form (`substr(md5(shingle), band*4, 4)`) that the DuckDB oracle can
  * reproduce bit-for-bit, and an xxhash64 form (native codegen'd long hash,
  * no hex materialization, ~150x the hash throughput at 100k docs per
  * ScaleProbe) that a 100 TB run would use.
  *
  * Documents with no shingles (fewer than 3 tokens) are filtered out before
  * banding: under MinHash an empty shingle set has no similarity evidence,
  * and routing all short docs to a shared sentinel bucket would both emit
  * O(n²) false-positive pairs and concentrate every short doc on one reducer.
  *
  * LSH buckets are capped at [[MaxBucket]] members: a degenerate clone
  * family (n near-identical docs) otherwise lands n ids in one
  * `collect_list` (single-task OOM at scale) and emits n²/2 pairs from one
  * task. Oversized buckets are skipped — their members are, by construction,
  * exact or near-exact duplicates better handled by the exact-dedup pass —
  * and the skip count is surfaced as an observed metric
  * (`lsh_skipped_buckets`).
  */
object Dedup {

  val NumBands = 8

  /** LSH bucket-size cap; buckets larger than this are dropped from pair
    * generation (counted in the `lsh_buckets` observation). */
  val MaxBucket = 256

  /** Exact dedup over documents: group size + kept (min) doc per
    * fingerprint. */
  def x01ExactDedup(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .groupBy(fingerprint(col("text")).as("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
      .orderBy(col("fp"))

  /** MinHash signature per (doc, band): md5 each shingle ONCE, then derive
    * the per-band hash as a 4-hex-char slice of that digest (standard
    * "k hash functions from one strong hash" construction — md5's avalanche
    * makes the slices independent). Pure map + array_min — no shuffle until
    * the candidate join. Docs with no shingles are filtered out (see class
    * doc). */
  def minhashSignatures(docs: DataFrame, nBands: Int = NumBands): DataFrame = {
    // compute-bound: spread rows across all cores — a bytes-based split of
    // a small parquet file yields 1 partition and serializes the hashing.
    // Tokens/shingles/digests are staged as separate projections so each
    // runs once per row, not once per downstream reference.
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), shingles(col("toks")).as("tg"))
      .select(col("doc_id"), expr("transform(tg, sh -> md5(sh))").as("tgh"))
      .select(col("doc_id"), explode(sequence(lit(0), lit(nBands - 1))).as("band"), col("tgh"))
      .select(col("doc_id"), col("band"),
        expr("array_min(transform(tgh, h -> substring(h, band * 4 + 1, 4)))").as("min_hash"))
      // array_min is null exactly when the shingle set is empty — this IS
      // the short-doc filter, applied after the staged projections so the
      // shingle pipeline isn't re-inlined into a pushed-down predicate
      // (an early filter(size(tg) > 0) doubles the hash work via
      // CollapseProject + predicate pushdown: measured 1.2 s -> 9.9 s).
      .filter(col("min_hash").isNotNull)
  }

  def x05MinhashSignatures(s: SparkSession, dir: String): DataFrame =
    minhashSignatures(documents(s, dir)).orderBy(col("doc_id"), col("band"))

  /** Production-scale MinHash: xxhash64 (native codegen'd long hash, no hex
    * string materialization) instead of md5. Each shingle string is hashed
    * ONCE; the per-band hash re-mixes the resulting 8-byte long with the
    * band id (xxhash64 over 12 bytes — the long-hash analogue of the md5
    * slice trick). Same banding semantics and short-doc filter as
    * [[minhashSignatures]]; this is what a 100 TB run would use (the md5
    * form stays the DuckDB-oracle-checked one). */
  def minhashSignaturesFast(docs: DataFrame, nBands: Int = NumBands): DataFrame = {
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), shingles(col("toks")).as("tg"))
      .select(col("doc_id"), expr("transform(tg, sh -> xxhash64(sh))").as("tgh"))
      .select(col("doc_id"), explode(sequence(lit(0), lit(nBands - 1))).as("band"), col("tgh"))
      .select(col("doc_id"), col("band"),
        expr("array_min(transform(tgh, h -> xxhash64(h, band)))").as("min_hash"))
      .filter(col("min_hash").isNotNull) // empty-shingle docs, see md5 form
  }

  def x05bMinhashFast(s: SparkSession, dir: String): DataFrame =
    minhashSignaturesFast(documents(s, dir)).orderBy(col("doc_id"), col("band"))

  /** u03 — the x05b fast-minhash signature pipeline over MULTIBYTE text
    * ([[graft.functions.Text.utf8Text]]'s deterministic 2-/3-byte
    * projection): tokenize, shingle, and xxhash64 multibyte shingle
    * strings. Spark's xxhash64 reads UTF-8 bytes, and the oracle
    * recomputes XXH64 in `XxhashSql`'s UTF-8 byte mode, so the DEDUP
    * stack's fingerprint path — not just the tokenizer — is
    * oracle-verified past the ASCII data contract. */
  def u03Utf8MinhashFast(s: SparkSession, dir: String): DataFrame =
    minhashSignaturesFast(
      documents(s, dir).withColumn("text", graft.functions.Text.utf8Text(col("text"))))
      .orderBy(col("doc_id"), col("band"))

  // --- signature cache: at 100 TB signatures are computed once and shared
  // between the signature output and pair generation; within a process the
  // same sharing means x06 does not re-pay x05's hash pipeline. Keyed by
  // (session identity, tag, bands, form) so a new session recomputes; the
  // tag is the table dir for the corpus forms and a caller-chosen stable
  // string for derived relations (e.g. "<dir>|x71survivors"), so repeated
  // bench attempts of a survivor-table consumer reuse one build too.
  private val sigCache = graft.GraftCaches.register(new ConcurrentHashMap[String, DataFrame]())

  private[graft] def signaturesFor(s: SparkSession, docs: => DataFrame, tag: String,
                                   nBands: Int = NumBands,
                                   fast: Boolean = false): DataFrame = {
    val key = s"${System.identityHashCode(s)}|$tag|$nBands|$fast"
    sigCache.computeIfAbsent(key, _ => {
      val sig = if (fast) minhashSignaturesFast(docs, nBands)
                else minhashSignatures(docs, nBands)
      sig.persist(StorageLevel.MEMORY_AND_DISK)
    })
  }

  private[graft] def cachedSignatures(s: SparkSession, dir: String,
                                      nBands: Int, fast: Boolean): DataFrame =
    signaturesFor(s, documents(s, dir), dir, nBands, fast)

  /** C(n,2) combination rows `(d1 < d2)` from a relation carrying an
    * `ids` array column: posexplode + slice emits exactly each group's
    * combinations (never n² rows filtered in half), with least/greatest
    * normalizing the pair key against collect_list's
    * scheduling-dependent order. Shared by the LSH bucket pairs and
    * x44's chunk-fingerprint pairs. */
  private[graft] def combinationPairs(grouped: DataFrame): DataFrame =
    grouped
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "a")))
      .select(col("a"), explode(expr("slice(ids, i + 2, size(ids))")).as("b"))
      .select(least(col("a"), col("b")).as("d1"), greatest(col("a"), col("b")).as("d2"))

  /** Candidate pairs from a signature relation: group by (band, min_hash)
    * bucket, cap the bucket, emit within-bucket pairs. One shuffle on the
    * bucket key; never an all-pairs product. */
  def nearDupPairsFromSignatures(sig: DataFrame, maxBucket: Int = MaxBucket): DataFrame =
    combinationPairs(sig
        .groupBy(col("band"), col("min_hash"))
        .agg(collect_list(col("doc_id")).as("ids"))
        .observe("lsh_buckets",
          sum(when(size(col("ids")) > maxBucket, lit(1)).otherwise(lit(0)))
            .as("lsh_skipped_buckets"))
        .filter(size(col("ids")).between(2, maxBucket)))
      .distinct()

  /** Near-dup candidate pairs: docs sharing any (band, min_hash) bucket.
    * Equi-grouping on the bucket key — the LSH trick that avoids O(n²); at
    * 100 TB both sides hash-partition on (band, min_hash). */
  def nearDupCandidates(docs: DataFrame, nBands: Int = NumBands,
                        maxBucket: Int = MaxBucket): DataFrame =
    nearDupPairsFromSignatures(minhashSignatures(docs, nBands), maxBucket)

  def nearDupCandidatesFast(docs: DataFrame, nBands: Int = NumBands,
                            maxBucket: Int = MaxBucket): DataFrame =
    nearDupPairsFromSignatures(minhashSignaturesFast(docs, nBands), maxBucket)

  def x06NearDupPairs(s: SparkSession, dir: String): DataFrame =
    nearDupPairsFromSignatures(cachedSignatures(s, dir, NumBands, fast = false))
      .orderBy(col("d1"), col("d2"))

  /** The full MinHash dedup pipeline: LSH candidates verified by exact
    * shingle Jaccard ≥ `minJaccard`. The candidate set (LSH output, tiny
    * relative to the corpus) joins the shingle relation twice on doc_id —
    * two hash shuffles keyed on the id, never an all-pairs product; at
    * 100 TB the verify cost is O(candidates · shingles), the whole point
    * of LSH pruning. */
  def verifiedNearDups(sig: DataFrame, shingled: DataFrame,
                       minJaccard: Double = 0.5,
                       maxBucket: Int = MaxBucket): DataFrame = {
    val cands = nearDupPairsFromSignatures(sig, maxBucket)
    val a = shingled.select(col("doc_id").as("d1"), col("tg").as("tg1"))
    val b = shingled.select(col("doc_id").as("d2"), col("tg").as("tg2"))
    val inter = size(array_intersect(col("tg1"), col("tg2")))
    val uni = size(array_union(col("tg1"), col("tg2")))
    cands.join(a, "d1").join(b, "d2")
      .select(col("d1"), col("d2"),
        when(uni === 0, lit(0.0)).otherwise(round(inter / uni, 4)).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Shingle relation used by the Jaccard verifier (same tokenization as
    * the signature pipeline). */
  def shingleRelation(docs: DataFrame): DataFrame =
    docs.withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), Text.shingles(col("toks")).as("tg"))

  /** md5-form band signatures derived from an ALREADY-MATERIALIZED shingle
    * relation `(doc_id, tg)` — the same staged expressions as
    * [[minhashSignatures]]' tail, for callers that need BOTH relations
    * from one tokenize+shingle pass (the streaming screen persists the
    * shingle relation and derives signatures from it instead of
    * re-tokenizing the batch). */
  private[graft] def signaturesFromShingles(tg: DataFrame, nBands: Int = NumBands): DataFrame =
    tg.select(col("doc_id"), expr("transform(tg, sh -> md5(sh))").as("tgh"))
      .select(col("doc_id"), explode(sequence(lit(0), lit(nBands - 1))).as("band"), col("tgh"))
      .select(col("doc_id"), col("band"),
        expr("array_min(transform(tgh, h -> substring(h, band * 4 + 1, 4)))").as("min_hash"))
      .filter(col("min_hash").isNotNull)

  // shingle relation cache, same topology as cachedSignatures: the verify
  // join consumes it twice (a/b sides) and decontamination consumes it
  // twice more (benchmark + corpus) — at 100 TB the tokenize+shingle pass
  // runs once and every consumer reads the materialized relation.
  private val shingleCache = graft.GraftCaches.register(new ConcurrentHashMap[String, DataFrame]())

  private[graft] def shinglesFor(s: SparkSession, docs: => DataFrame,
                                 tag: String): DataFrame = {
    val key = s"${System.identityHashCode(s)}|$tag"
    shingleCache.computeIfAbsent(key, _ =>
      shingleRelation(docs.repartition(s.sparkContext.defaultParallelism))
        .persist(StorageLevel.MEMORY_AND_DISK))
  }

  private[graft] def cachedShingles(s: SparkSession, dir: String): DataFrame =
    shinglesFor(s, documents(s, dir), dir)

  /** Survivor-table form of x16: verified near-dup pairs over an ARBITRARY
    * docs relation `(doc_id, text, …)` — the production form SCALING.md §5
    * names ("point the screens at the x01 survivor table"). `tag` keys the
    * session-scoped signature/shingle caches and must be stable for the
    * relation (e.g. `"<dir>|x71survivors"`); the dir form is this with
    * `documents(dir)` and `tag = dir`. */
  def x16VerifiedNearDupsOf(s: SparkSession, docs: DataFrame, tag: String): DataFrame =
    verifiedNearDups(signaturesFor(s, docs, tag), shinglesFor(s, docs, tag))
      .orderBy(col("d1"), col("d2"))

  def x16VerifiedNearDups(s: SparkSession, dir: String): DataFrame =
    x16VerifiedNearDupsOf(s, documents(s, dir), dir)

  def x06bNearDupFast(s: SparkSession, dir: String): DataFrame =
    nearDupPairsFromSignatures(cachedSignatures(s, dir, NumBands, fast = true))
      .orderBy(col("d1"), col("d2"))

  /** 64-bit SimHash per document: per-token 64-bit hash (xxhash64), each bit
    * votes ±1 weighted by token frequency; signature bit = sign of the vote.
    * Expressed as explode(bits)+agg — the declarative reference form; the
    * declared query uses the fused [[SimhashAgg]] (64 counters in one pass,
    * no 64× bit-row blowup), parity-tested against this. */
  def simhash64(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bitMask = expr("shiftleft(CAST(1 AS BIGINT), bit)")
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), explode_outer(tokens(col(textCol))).as("token"))
      .filter(col("token").isNotNull) // explode_outer: no inferred size()>0
      .withColumn("h", xxhash64(col("token")))
      .select(col(idCol), col("h"), explode(sequence(lit(0), lit(63))).as("bit"))
      .withColumn("vote", when(col("h").bitwiseAND(bitMask) =!= 0, lit(1)).otherwise(lit(-1)))
      .groupBy(col(idCol), col("bit"))
      .agg(sum(col("vote")).as("votes"))
      .groupBy(col(idCol))
      .agg(sum(when(col("votes") > 0, bitMask).otherwise(lit(0L))).as("simhash"))
  }

  /** Fused SimHash: one (doc, token-hash) row per token, 64 vote counters
    * folded map-side by a typed Aggregator — shuffle volume is O(docs·64
    * ints) instead of O(docs·tokens·64 rows). The 100 TB form of
    * [[simhash64]]; bit semantics identical (parity in FunctionsSpec). */
  def simhash64Fused(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.repartition(spark.sparkContext.defaultParallelism)
      .select(col(idCol).as("doc_id"), explode_outer(tokens(col(textCol))).as("token"))
      .filter(col("token").isNotNull) // explode_outer: no inferred size()>0
      .select(col("doc_id"), xxhash64(col("token")).as("h"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .agg(new SimhashAgg().toColumn.name("simhash"))
      .toDF("doc_id", "simhash")
  }

  def x07Simhash(s: SparkSession, dir: String): DataFrame =
    simhash64Fused(documents(s, dir)).select(col("doc_id"), col("simhash")).orderBy(col("doc_id"))

  /** 32-bit SimHash with an md5-derived per-token hash: bit i of a token's
    * hash = parity of hex digit i of md5(token). Same vote/sign scheme as
    * [[simhash64]] but every step is reproducible in ANSI SQL — this is the
    * oracle-checked variant (the xxhash64 one is the JVM-fast variant). */
  def simhash32Md5(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val oddHex = Seq("1", "3", "5", "7", "9", "b", "d", "f")
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), explode_outer(tokens(col(textCol))).as("token"))
      .filter(col("token").isNotNull) // explode_outer: no inferred size()>0
      .withColumn("hx", md5(col("token")))
      .select(col(idCol), col("hx"), explode(sequence(lit(0), lit(31))).as("bit"))
      .withColumn("vote",
        when(expr("substring(hx, bit + 1, 1)").isin(oddHex: _*), lit(1)).otherwise(lit(-1)))
      .groupBy(col(idCol), col("bit"))
      .agg(sum(col("vote")).as("votes"))
      .groupBy(col(idCol))
      .agg(sum(when(col("votes") > 0, pow(lit(2.0), col("bit")).cast("long")).otherwise(lit(0L)))
        .as("simhash32"))
  }

  def x07bSimhashMd5(s: SparkSession, dir: String): DataFrame =
    simhash32Md5(documents(s, dir)).select(col("doc_id"), col("simhash32")).orderBy(col("doc_id"))

  /** 64-bit SimHash through the fused [[SimhashAgg]] with an md5-derived
    * token hash: h = (first 8 hex chars << 32) | (next 8 hex chars) — two
    * 32-bit halves, so every bit of h is reproducible in ANSI SQL (a hex
    * digit's bit, located arithmetically). This gives the fused Aggregator
    * itself a direct DuckDB oracle row; the xxhash64 form ([[x07Simhash]])
    * stays the JVM-fast variant covered by bit-parity tests. */
  def simhash64Md5Fused(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hi = conv(substring(col("hx"), 1, 8), 16, 10).cast("long")
    val lo = conv(substring(col("hx"), 9, 8), 16, 10).cast("long")
    docs.repartition(spark.sparkContext.defaultParallelism)
      .select(col(idCol).as("doc_id"), explode_outer(tokens(col(textCol))).as("token"))
      .filter(col("token").isNotNull) // explode_outer: no inferred size()>0
      .withColumn("hx", md5(col("token")))
      .select(col("doc_id"), shiftleft(hi, 32).bitwiseOR(lo).as("h"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .agg(new SimhashAgg().toColumn.name("simhash64"))
      .toDF("doc_id", "simhash64")
  }

  def x07cSimhash64Md5(s: SparkSession, dir: String): DataFrame =
    simhash64Md5Fused(documents(s, dir))
      .select(col("doc_id"), col("simhash64")).orderBy(col("doc_id"))

  /** u05 — the SimHash family over MULTIBYTE text
    * ([[graft.functions.Text.utf8Text]]'s deterministic 2-/3-byte
    * projection): tokenize multibyte text, md5 each token's UTF-8 bytes
    * (Spark casts the string to binary; DuckDB's md5 reads the VARCHAR's
    * bytes — u01 pins their agreement), vote per bit, sign-fold. With
    * u03 (minhash) and u06 (rolling fingerprint) this completes the
    * fingerprint-family multibyte slice: every dedup-screen hash path is
    * oracle-verified past the ASCII data contract. */
  def u05Utf8Simhash(s: SparkSession, dir: String): DataFrame =
    simhash32Md5(documents(s, dir)
        .withColumn("text", graft.functions.Text.utf8Text(col("text"))))
      .select(col("doc_id"), col("simhash32")).orderBy(col("doc_id"))

  /** SimHash near-dup pairs: bit-band bucket the 32-bit md5 signatures
    * (4 bands × 8 bits — any pair within Hamming distance 3 shares at least
    * one intact band, so banding loses nothing at t ≤ 3), then keep
    * candidates with popcount(xor) ≤ `t`. Same bucket-grouped, capped pair
    * generation as MinHash LSH: one shuffle on (band, band_bits), no
    * all-pairs product, clone families bounded by the cap. */
  def simhashNearDups(docs: DataFrame, t: Int = 3,
                      maxBucket: Int = MaxBucket): DataFrame = {
    val banded = simhash32Md5(docs)
      .select(col("doc_id"), col("simhash32"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("band_bits", expr("shiftright(simhash32, band * 8) & 255"))
    banded
      .groupBy(col("band"), col("band_bits"))
      .agg(collect_list(struct(col("doc_id"), col("simhash32"))).as("items"))
      .filter(size(col("items")).between(2, maxBucket))
      .select(col("items"), posexplode(col("items")).as(Seq("i", "a")))
      .select(col("a"), explode(expr("slice(items, i + 2, size(items))")).as("b"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("d1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("d2"),
        expr("CAST(bit_count(a.simhash32 ^ b.simhash32) AS INT)").as("hamming"))
      .filter(col("hamming") <= t)
      .distinct()
  }

  def x14SimhashNearDups(s: SparkSession, dir: String): DataFrame =
    simhashNearDups(documents(s, dir)).orderBy(col("d1"), col("d2"))

  /** Embedding-cosine near-dup pairs via LSH buckets (approximate; exact
    * within-bucket cosine filter at `threshold`).
    *
    * `nPlanes` sizes the bucket space (2^nPlanes buckets): 4 planes / 16
    * buckets suits the 500-vector test corpora; at production scale raise
    * it so the expected bucket size stays reducer-friendly (e.g. 20 planes
    * → ~1M buckets for a 10^9-vector corpus), since the within-bucket join
    * is quadratic in bucket occupancy. */
  def embeddingNearDups(emb: DataFrame, threshold: Double = 0.9,
                        nPlanes: Int = 4, dim: Int = 64): DataFrame = {
    graft.plans.GraftExtensions.register(emb.sparkSession)
    val planes = Similarity.hyperplanes(nPlanes, dim)
    val withBucket = emb.withColumn("bucket", Similarity.lshBucket(col("embedding"), planes))
    val a = withBucket.select(col("bucket"), col("vec_id").as("v1"), col("embedding").as("e1"))
    val b = withBucket.select(col("bucket"), col("vec_id").as("v2"), col("embedding").as("e2"))
    a.join(b, Seq("bucket"))
      .filter(col("v1") < col("v2"))
      .select(col("v1"), col("v2"),
        round(Similarity.cosineNative(col("e1"), col("e2")), 4).as("score"))
      .filter(col("score") >= threshold)
  }

  /** Threshold chosen below the synthetic corpus's top within-bucket cosine
    * so the declared query returns a non-trivial result at every test SF —
    * a 0-row result would make the correctness check vacuous. */
  val EmbeddingNearDupThreshold = 0.35

  def x10EmbeddingNearDups(s: SparkSession, dir: String): DataFrame =
    embeddingNearDups(embeddings(s, dir), threshold = EmbeddingNearDupThreshold)
      .orderBy(col("v1"), col("v2"))

  /** x34 — semantic dedup DECISION (SemDeDup-shaped): turn the x10 pair
    * relation into a per-item keep/drop verdict. Policy: within an LSH
    * bucket, an item is DROPPED iff ANY lower-id item in the same bucket
    * is cosine-similar above the threshold — including lower-id items
    * that were themselves dropped — and `dup_of` records the lowest such
    * id (which may therefore be a non-kept doc: for a chain 1~2, 2~3,
    * 1≁3, doc 3 is dropped with dup_of=2 even though 2 was dropped).
    * This deliberately differs from a strict greedy one-pass scan (which
    * compares only against KEPT representatives and would keep 3): the
    * any-lower-neighbor rule needs no iteration — one bucketed pair join
    * + one aggregate — which is why it is the corpus-scale choice; when
    * attribution must point at the kept canonical, resolve through the
    * cluster-exact x26 connected components over the verified pair graph.
    * Cost = x10's bucketed pair join + one aggregate on the (already
    * tiny) dropped side + a broadcast-sized left join back. */
  def semanticDedup(emb: DataFrame, threshold: Double = EmbeddingNearDupThreshold,
                    nPlanes: Int = 4, dim: Int = 64): DataFrame = {
    val pairs = embeddingNearDups(emb, threshold, nPlanes, dim) // v1 < v2
    val dropped = pairs.groupBy(col("v2").as("vec_id"))
      .agg(min(col("v1")).as("dup_of"))
    val planes = Similarity.hyperplanes(nPlanes, dim)
    emb.select(col("vec_id"),
        Similarity.lshBucket(col("embedding"), planes).as("bucket"))
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("bucket"), col("dup_of"),
        col("dup_of").isNull.as("is_kept"))
      .orderBy(col("vec_id"))
  }

  def x34SemanticDedup(s: SparkSession, dir: String): DataFrame =
    semanticDedup(embeddings(s, dir))

  /** Connected components over an undirected pair graph — the final step of
    * the dedup pipeline: verified near-dup PAIRS become duplicate CLUSTERS,
    * and each cluster keeps one canonical document (the min id).
    *
    * Algorithm: min-label propagation with pointer jumping. Each node starts
    * labelled with itself; every round each node (1) adopts the minimum
    * label in its neighbourhood, then (2) adopts its label's label (labels
    * are always node ids present in the relation, so the jump join is
    * total). The jump halves the remaining chain depth every round, so
    * convergence takes O(log diameter) rounds instead of O(diameter) —
    * near-dup clusters are clique-ish constants, but an adversarial chain of
    * pairs would otherwise defeat a hop-only loop. Each round shuffles only
    * the EDGE relation (already LSH-pruned, orders of magnitude smaller than
    * the corpus) keyed by node.
    *
    * Every round's labels are materialized into a localCheckpoint'd RDD
    * (lineage truncated, so neither the Catalyst plan nor the RDD DAG grows
    * with iterations) and the previous round's blocks are unpersisted once
    * the new round is materialized — block-manager memory stays O(|nodes|),
    * not O(iters·|nodes|).
    *
    * If the loop hits `maxIters` without converging it THROWS rather than
    * returning partially-propagated labels (split clusters with several
    * "canonical" docs would silently corrupt a downstream keep-decision);
    * with jumping, `maxIters` = 25 covers diameters up to ~2^25.
    *
    * Input columns `d1`,`d2`; output (`doc_id`, `cluster_id`,
    * `is_canonical`) for every doc that appears in at least one pair. */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 25): DataFrame = {
    val spark = pairs.sparkSession
    // persist PARTITIONED BY src: the per-round hop join keys on src, so
    // the cached partitioning satisfies the join side every round (the
    // cachedGrams lesson). The hop OUTPUT still re-shuffles to dst for the
    // neighbourhood min — that edge-sized exchange per round is inherent to
    // label propagation (src→dst movement IS the algorithm) and is the
    // bounded per-round cost at scale.
    // repartition FIRST, dedup second: hashpartitioning(src) satisfies the
    // (src, dst) clustered distribution (src is a subset of the keys), so
    // the dropDuplicates runs in the repartition's stage — one edge-scale
    // exchange instead of the old distinct-then-repartition two (guide
    // §2.4; the dedup itself only matters for callers whose pair relation
    // isn't already distinct — the per-round neighbourhood min is
    // duplicate-insensitive, but duplicate edges would inflate every
    // round's hop join)
    val edges = pairs
      .select(col("d1").cast("long").as("src"), col("d2").cast("long").as("dst"))
      .union(pairs.select(col("d2").cast("long").as("src"), col("d1").cast("long").as("dst")))
      .repartition(col("src"))
      .dropDuplicates(Seq("src", "dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // materialize a label relation into storage with lineage truncated, at
    // the RDD level so the backing blocks can be explicitly unpersisted
    // (Dataset.unpersist does not reach a Dataset.localCheckpoint's RDD).
    // The SAME materializing job also folds the round's changed-row count
    // (`changedIdx` ≥ 0 names the boolean column), so convergence costs no
    // separate filter+isEmpty job per round — one job per round, not two.
    def materialize(df: DataFrame, changedIdx: Int = -1)
        : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row], Long) = {
      val rdd = df.rdd
      rdd.localCheckpoint()
      val changed = rdd.mapPartitions { it =>
        var c = 0L
        while (it.hasNext) {
          val r = it.next()
          if (changedIdx >= 0 && r.getBoolean(changedIdx)) c += 1
        }
        Iterator.single(c)
      }.fold(0L)(_ + _) // eager: parent blocks are no longer needed after this
      (spark.createDataFrame(rdd, df.schema), rdd, changed)
    }

    var (labels, labelsRdd, _) = materialize(
      edges.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("label")))
    var converged = edges.isEmpty
    var iter = 0
    while (!converged && iter < maxIters) {
      val lbl = labels.select(col("node"), col("label"))
      // (1) hop: minimum label in the neighbourhood
      val nbrMin = edges.join(lbl, edges("src") === lbl("node"))
        .groupBy(col("dst")).agg(min(col("label")).as("nbr_min"))
      val stepped = lbl.join(nbrMin, lbl("node") === nbrMin("dst"), "left")
        .select(lbl("node"), lbl("label").as("old_label"),
          least(lbl("label"), coalesce(col("nbr_min"), lbl("label"))).as("label"))
      // (2) jump: adopt the label of one's label; the changed flag rides
      // the materialized relation so convergence is a filter over the
      // cached blocks, not another node-sized join per round
      val byNode = stepped.select(col("node").as("jnode"), col("label").as("jlabel"))
      val (next, nextRdd, changedCnt) = materialize(
        stepped.join(byNode, stepped("label") === col("jnode"))
          .select(stepped("node"), col("jlabel").as("label"),
            (col("jlabel") =!= stepped("old_label")).as("changed")),
        changedIdx = 2)
      converged = changedCnt == 0
      labelsRdd.unpersist()
      labels = next
      labelsRdd = nextRdd
      iter += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIters rounds " +
          s"(graph diameter exceeds ~2^$maxIters); raise maxIters — returning " +
          "partial labels would split clusters across multiple canonicals")
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"),
      (col("node") === col("label")).as("is_canonical"))
  }

  /** Survivor-table form of x26 (see [[x16VerifiedNearDupsOf]]): the full
    * LSH → verify → connected-components chain over an arbitrary docs
    * relation. This is what x71 feeds its exact-dedup survivors — the
    * candidate bill is then LSH-sized on the deduped corpus rather than
    * clone-dense on the raw one (the SCALING.md §5 ordering lesson). */
  def x26DupClustersOf(s: SparkSession, docs: DataFrame, tag: String): DataFrame =
    connectedComponents(
      verifiedNearDups(signaturesFor(s, docs, tag), shinglesFor(s, docs, tag)))
      .orderBy(col("doc_id"))

  /** x26 — duplicate clusters from the verified near-dup pairs (x16's
    * output): LSH candidates → exact-Jaccard verification → connected
    * components → canonical keep decision per cluster. */
  def x26DupClusters(s: SparkSession, dir: String): DataFrame =
    x26DupClustersOf(s, documents(s, dir), dir)

  /** x57 — source-priority canonical dedup: among exact duplicates, keep
    * the copy from the MOST-TRUSTED source instead of x01's min-doc_id
    * convention — the policy knob multi-source pipelines actually want
    * ("prefer the publisher dump over the crawl"). Priority = position in
    * the preference list (unlisted sources rank after listed ones, ties
    * break by doc_id). Same single fingerprint shuffle as x01; the
    * priority is a map-side expression. */
  def x57PriorityDedup(s: SparkSession, dir: String,
                       preferred: Seq[String] = Seq("src1", "src0")): DataFrame = {
    val prio = preferred.zipWithIndex
      .foldRight(lit(preferred.size): Column) { case ((src, i), els) =>
        when(col("source") === src, lit(i)).otherwise(els)
      }
    // single sortable key (prio ≪ 44 | doc_id) so the argmin is one
    // portable min_by on a BIGINT in both engines; assumes doc_id < 2^44
    // (16 T ids) — beyond that, widen the fold or switch to a two-pass
    // (min-prio window, then min-id) argmin
    documents(s, dir)
      .select(fingerprint(col("text")).as("fp"), col("doc_id"), col("source"),
        (prio.cast("long") * lit(1L << 44) + col("doc_id")).as("rank_key"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"),
        min_by(col("doc_id"), col("rank_key")).as("keep_id"),
        min_by(col("source"), col("rank_key")).as("keep_source"))
      .orderBy(col("fp"))
  }

  /** x59 — incremental ingestion dedup: dedup a NEW batch of documents
    * against the already-ingested corpus without re-deduping the corpus —
    * the shape a 100 TB pipeline actually runs day to day (x01 is the
    * one-time backfill; this is the steady state). The corpus side reduces
    * to its fingerprint index `(fp, min doc_id)` — in production a stored
    * table maintained across ingests, here recomputed from the non-batch
    * sources — so the batch pays one fingerprint map pass, one in-batch
    * argmin window, and one fp-keyed left join against the index. Each
    * batch doc is classified `dup_of_corpus` (fp already ingested, wins
    * over in-batch ties), `dup_in_batch` (fp new but a lower-id batch doc
    * has it), or `new`, with `dup_of` pointing at the kept copy. The
    * corpus filter is null-SAFE: a doc with no source metadata counts as
    * already-ingested corpus rather than silently vanishing from both
    * sides (the clean-data oracle is unaffected — `source <> batch` and
    * `NOT (source IS NOT DISTINCT FROM batch)` agree wherever source is
    * non-null). */
  def x59IncrementalDedup(s: SparkSession, dir: String,
                          batchSource: String = "src19"): DataFrame = {
    val withFp = documents(s, dir)
      .select(col("doc_id"), col("source"), fingerprint(col("text")).as("fp"))
    val corpusIdx = withFp.filter(!(col("source") <=> batchSource))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("corpus_id"))
    x59IncrementalDedupOf(corpusIdx,
      withFp.filter(col("source") === batchSource).select(col("doc_id"), col("fp")))
  }

  /** Maintained-index form of x59: classify a fingerprinted batch
    * `(doc_id, fp)` against a STORED fingerprint index `(fp, corpus_id)`
    * — the steady-state call ([[x62IncrementalNearDupOf]]'s analogue for
    * exact dedup). The dir form delegates here with a freshly derived
    * index. */
  def x59IncrementalDedupOf(corpusIndex: DataFrame, batch: DataFrame): DataFrame = {
    val b = batch.withColumn("batch_min",
      min(col("doc_id")).over(org.apache.spark.sql.expressions.Window.partitionBy("fp")))
    b.join(corpusIndex, Seq("fp"), "left")
      .select(col("doc_id"), col("fp"),
        when(col("corpus_id").isNotNull, lit("dup_of_corpus"))
          .when(col("doc_id") =!= col("batch_min"), lit("dup_in_batch"))
          .otherwise(lit("new")).as("status"),
        coalesce(col("corpus_id"),
          when(col("doc_id") =!= col("batch_min"), col("batch_min"))).as("dup_of"))
      .orderBy(col("doc_id"))
  }

  /** Fold a newly ingested batch into the fingerprint index: one fp-keyed
    * aggregate over (index ∪ batch) keeping the minimum doc id per
    * fingerprint — the per-ingest maintenance write that keeps
    * [[x59IncrementalDedupOf]]'s index current without ever re-scanning
    * the corpus. Idempotent (re-folding the same batch is a no-op) and
    * associative (batches can fold in any order), so retries and
    * out-of-order ingests are safe. */
  def updateFingerprintIndex(corpusIndex: DataFrame, batch: DataFrame): DataFrame =
    corpusIndex.select(col("fp"), col("corpus_id"))
      .unionByName(batch.select(col("fp"), col("doc_id").as("corpus_id")))
      .groupBy(col("fp")).agg(min(col("corpus_id")).as("corpus_id"))

  /** x62 — incremental NEAR-dup screen: x59's day-2 shape for near
    * duplicates. The NEW batch's minhash band signatures LSH-join the
    * stored corpus signature index (here the session-cached x05 relation
    * split by source; in production the persisted signature table, which
    * carries source metadata so the doc_id join below disappears),
    * candidates are verified by exact trigram Jaccard, and every batch doc
    * reports its match count and best corpus match — `best` = max Jaccard
    * with ties broken by min corpus_id, folded into ONE sortable BIGINT
    * (x57's portable-argmin trick, same doc_id < 2^44 assumption) so both
    * engines agree bit-for-bit.
    * Corpus-side buckets are capped at [[MaxBucket]] like x06 — a clone
    * family in the index otherwise fans every matching batch doc out by
    * the family size; the cap's count window rides the same (band, hash)
    * partitioning the LSH join needs, so it costs no extra exchange. */
  def x62IncrementalNearDup(s: SparkSession, dir: String,
                            batchSource: String = "src19",
                            minJaccard: Double = 0.5): DataFrame =
    x62IncrementalNearDupOf(s, documents(s, dir), dir, batchSource, minJaccard)

  /** Survivor-table form of x62 (see [[x16VerifiedNearDupsOf]]): the docs
    * relation must carry `(doc_id, source, text)`; in production this is
    * the x01 survivor table so the incremental screen never re-pays the
    * clone-family candidate bill. */
  def x62IncrementalNearDupOf(s: SparkSession, docs: DataFrame, tag: String,
                              batchSource: String = "src19",
                              minJaccard: Double = 0.5): DataFrame = {
    val srcOf = docs.select(col("doc_id"), col("source"))
    val sig = signaturesFor(s, docs, tag).join(srcOf, "doc_id")
    val batchSig = sig.filter(col("source") === batchSource)
      .select(col("band"), col("min_hash"), col("doc_id").as("batch_id"))
    val bucketW = org.apache.spark.sql.expressions.Window.partitionBy("band", "min_hash")
    val corpusSig = sig.filter(!(col("source") <=> batchSource))
      .select(col("band"), col("min_hash"), col("doc_id").as("corpus_id"))
      .withColumn("bn", count(lit(1)).over(bucketW))
      .filter(col("bn") <= MaxBucket)
      .drop("bn")
    val cands = batchSig.join(corpusSig, Seq("band", "min_hash"))
      .select(col("batch_id"), col("corpus_id")).distinct()
    val sh = shinglesFor(s, docs, tag)
    val best = nearDupBest(cands,
      sh.select(col("doc_id").as("batch_id"), col("tg").as("tg1")),
      sh.select(col("doc_id").as("corpus_id"), col("tg").as("tg2")), minJaccard)
    docs.filter(col("source") === batchSource)
      .select(col("doc_id").as("batch_id"))
      .join(best, Seq("batch_id"), "left")
      .select(col("batch_id"), coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("best_jaccard"), col("best_corpus_id"))
      .orderBy(col("batch_id"))
  }

  /** Verify LSH candidate `(batch_id, corpus_id)` pairs by exact trigram
    * Jaccard and fold to the per-batch-doc match summary — x62's verify +
    * best-match shape (max Jaccard, ties broken by min corpus_id via the
    * single-BIGINT portable argmin), shared verbatim with the streaming
    * twin so the two stay bit-identical. `batchTg`/`corpusTg` carry
    * `(batch_id, tg1)` / `(corpus_id, tg2)`. */
  private[graft] def nearDupBest(cands: DataFrame, batchTg: DataFrame,
                                 corpusTg: DataFrame, minJaccard: Double): DataFrame = {
    val inter = size(array_intersect(col("tg1"), col("tg2")))
    val uni = size(array_union(col("tg1"), col("tg2")))
    val verified = cands
      .join(batchTg, "batch_id")
      .join(corpusTg, "corpus_id")
      .select(col("batch_id"), col("corpus_id"),
        when(uni === 0, lit(0.0)).otherwise(round(inter / uni, 4)).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
    val rank = (lit(10000L) - expr("CAST(round(jaccard * 1.0e4, 0) AS BIGINT)")) *
      lit(1L << 44) + col("corpus_id")
    verified.groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_matches"), max(col("jaccard")).as("best_jaccard"),
        min_by(col("corpus_id"), rank).as("best_corpus_id"))
  }

  /** x69 — containment screen: the LSH candidate pairs scored by
    * CONTAINMENT |A∩B| / |A| instead of Jaccard — the asymmetric measure
    * that catches a short document embedded inside a longer one (quote
    * expansion, article + commentary), which symmetric Jaccard dilutes
    * below threshold. Emits one row per directed containment ≥ `minC` —
    * BOTH orientations of a pair can appear (an exact duplicate contains
    * and is contained, and shows up twice); a one-per-pair policy is a
    * downstream argmin over this relation, not baked in here. Same scale
    * shape as x16: LSH pruning bounds the pair set,
    * the shingle relation joins it twice on doc_id, never an all-pairs
    * product. */
  def x69ContainmentScreen(s: SparkSession, dir: String,
                           minC: Double = 0.9): DataFrame =
    x69ContainmentScreenOf(s, documents(s, dir), dir, minC)

  /** Survivor-table form of x69 (see [[x16VerifiedNearDupsOf]]). */
  def x69ContainmentScreenOf(s: SparkSession, docs: DataFrame, tag: String,
                             minC: Double = 0.9): DataFrame = {
    val cands = nearDupPairsFromSignatures(signaturesFor(s, docs, tag))
    val sh = shinglesFor(s, docs, tag)
    val a = sh.select(col("doc_id").as("d1"), col("tg").as("tg1"))
    val b = sh.select(col("doc_id").as("d2"), col("tg").as("tg2"))
    val inter = size(array_intersect(col("tg1"), col("tg2")))
    val scored = cands.join(a, "d1").join(b, "d2")
      .select(col("d1"), col("d2"), inter.cast("long").as("n_common"),
        size(col("tg1")).cast("long").as("n1"), size(col("tg2")).cast("long").as("n2"))
    // both directions of each undirected candidate pair, then keep the
    // (contained, container) orientation(s) that clear the threshold
    val directed = scored.select(col("d1").as("contained"), col("d2").as("container"),
        col("n_common"), col("n1").as("n_contained"), col("n2").as("n_container"))
      .unionByName(scored.select(col("d2").as("contained"), col("d1").as("container"),
        col("n_common"), col("n2").as("n_contained"), col("n1").as("n_container")))
    directed
      .filter(col("n_contained") > 0)
      .select(col("contained"), col("container"), col("n_common"),
        col("n_contained"), col("n_container"),
        round(col("n_common").cast("double") / col("n_contained").cast("double"), 4)
          .as("containment"))
      .filter(col("containment") >= minC)
      .orderBy(col("contained"), col("container"))
  }

  /** x76 — MinHash calibration: for every LSH candidate pair, the
    * band-agreement estimate (n_agree/8) against the EXACT shingle Jaccard,
    * aggregated per agreement level — the self-audit that says whether
    * [[NumBands]] bands give the selectivity the dedup thresholds assume
    * (estimates should increase with agreement and the error column says
    * by how much they wobble). All inputs are the already-cached signature
    * and shingle relations; the candidate set is LSH-bounded, the two
    * signature joins key on doc id + band, and the output is a ≤9-row
    * calibration table. */
  def x76MinhashCalibration(s: SparkSession, dir: String): DataFrame = {
    val sig = cachedSignatures(s, dir, NumBands, fast = false)
    val cands = nearDupPairsFromSignatures(sig)
    val agree = cands
      .join(sig.select(col("doc_id").as("d1"), col("band"), col("min_hash").as("h1")), "d1")
      .join(sig.select(col("doc_id").as("d2"), col("band"), col("min_hash").as("h2")),
        Seq("d2", "band"))
      .groupBy(col("d1"), col("d2"))
      .agg(sum((col("h1") === col("h2")).cast("long")).as("n_agree"))
    val sh = cachedShingles(s, dir)
    val inter = size(array_intersect(col("tg1"), col("tg2")))
    val uni = size(array_union(col("tg1"), col("tg2")))
    // aggregate in EXACT integer 1e-4 units: per-pair jaccard is a round-4
    // multiple, so j4 = jaccard·1e4 and est4 = n_agree·(1e4/8) are exact
    // BIGINTs, their sums are exact, and the single final division is the
    // same two integers in both engines — no sum-order rounding knife-edge
    // (a real sf0.1 boundary hit: a mean of ~24k doubles landed exactly on
    // a .00005 round-4 edge and the engines split)
    agree
      .join(sh.select(col("doc_id").as("d1"), col("tg").as("tg1")), "d1")
      .join(sh.select(col("doc_id").as("d2"), col("tg").as("tg2")), "d2")
      .select(col("n_agree"),
        when(uni === 0, lit(0.0)).otherwise(round(inter / uni, 4)).as("jaccard"))
      .select(col("n_agree"),
        expr("CAST(round(jaccard * 1.0e4, 0) AS BIGINT)").as("j4"))
      .groupBy(col("n_agree"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("j4")).as("sj4"),
        sum(abs(col("n_agree") * lit(10000L / NumBands) - col("j4"))).as("se4"))
      .select(col("n_agree"), col("n_pairs"),
        round(col("sj4").cast("double") /
          (lit(1.0e4) * col("n_pairs").cast("double")), 4).as("mean_jaccard"),
        round(col("se4").cast("double") /
          (lit(1.0e4) * col("n_pairs").cast("double")), 4).as("mean_abs_err"))
      .orderBy(col("n_agree"))
  }

  /** x52 — cluster-aware (leakage-free) split: the FIX for what x48
    * measures. Each document is routed to train/validation/test by the
    * md5-bucket of its near-dup CLUSTER id (x26's component minimum;
    * singletons key on their own doc_id), so every member of a verified
    * near-dup cluster lands in the same split and the train↔test shingle
    * leakage x48 audits cannot come from known near-duplicates. Cost on
    * top of x26's component step (edge-relation-sized): one broadcast-able
    * cluster-map join + the map-only bucket assignment. */
  def x52ClusterSplit(s: SparkSession, dir: String): DataFrame = {
    val cc = x26DupClusters(s, dir).select(col("doc_id"), col("cluster_id"))
    documents(s, dir).select(col("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("bucket", Sampling.hashBucket(col("split_key")))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "validation")
          .otherwise("test"))
      .select(col("doc_id"), col("split_key"), col("bucket"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** x53 — cross-source overlap audit: estimated Jaccard similarity
    * between every pair of SOURCES from band-level minhash agreement —
    * "which crawls/dumps are re-scraping each other" is the first question
    * a multi-source curation effort asks. A source's per-band signature is
    * `min` over its docs' per-band minima (min-of-mins = the min over the
    * source's whole shingle union, so this IS the source-level MinHash),
    * derived from the SAME cached doc-level signature relation x05/x06
    * use — the corpus pays no extra hash pass. The band-level aggregate is
    * |sources|·nBands rows; the pair matrix is control-plane sized. */
  def x53SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val ssig = cachedSignatures(s, dir, NumBands, fast = false)
      .join(documents(s, dir).select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"), col("band"))
      .agg(min(col("min_hash")).as("min_hash"))
    val a = ssig.select(col("source").as("s1"), col("band"), col("min_hash").as("h1"))
    val b = ssig.select(col("source").as("s2"), col("band"), col("min_hash").as("h2"))
    a.join(b, Seq("band"))
      .filter(col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2"))
      .agg(sum(when(col("h1") === col("h2"), lit(1L)).otherwise(lit(0L)))
        .as("n_band_matches"))
      .select(col("s1"), col("s2"), col("n_band_matches"),
        round(col("n_band_matches").cast("double") / NumBands, 4).as("est_jaccard"))
      .orderBy(col("s1"), col("s2"))
  }
}
