package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Text.{fingerprint, shingles, tokens}

/** Deduplication operators, exact and near-dup, for training-data curation:
  *
  *  - exact: md5 fingerprint of normalized text → hash groupBy (one shuffle
  *    on the fingerprint; the canonical 100 TB dedup);
  *  - MinHash + LSH banding: shingle → per-band min-hash → equi-join on
  *    (band, hash) buckets — candidate pairs without the all-pairs product;
  *  - SimHash: 64-bit near-dup signature per doc;
  *  - n-gram Jaccard: verification metric for candidate pairs;
  *  - embedding cosine near-dup: LSH-bucketed pair generation.
  *
  * MinHash here uses md5-derived string hashes (`substr(md5(shingle|band)`)
  * so the DuckDB oracle can reproduce signatures bit-for-bit — the min over
  * a band's hashes is a lexicographic string min in both engines.
  */
object Dedup {

  val NumBands = 8

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
    * the candidate join, and 8× less hashing than salting md5 per band. */
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
        coalesce(expr("array_min(transform(tgh, h -> substring(h, band * 4 + 1, 4)))"),
          lit("EMPTY")).as("min_hash"))
  }

  def x05MinhashSignatures(s: SparkSession, dir: String): DataFrame =
    minhashSignatures(documents(s, dir)).orderBy(col("doc_id"), col("band"))

  /** Production-scale MinHash: xxhash64 (native codegen'd long hash, no hex
    * string materialization) instead of salted md5. ~10x the hash
    * throughput of [[minhashSignatures]]; same banding semantics. The md5
    * form stays the declared/oracle-checked one (DuckDB can reproduce it);
    * this is what a 100 TB run would use. */
  def minhashSignaturesFast(docs: DataFrame, nBands: Int = NumBands): DataFrame = {
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), shingles(col("toks")).as("tg"))
      .select(col("doc_id"), explode(sequence(lit(0), lit(nBands - 1))).as("band"), col("tg"))
      .select(col("doc_id"), col("band"),
        coalesce(
          array_min(transform(col("tg"), sh => xxhash64(sh, col("band")))),
          lit(Long.MinValue)).as("min_hash"))
  }

  def nearDupCandidatesFast(docs: DataFrame, nBands: Int = NumBands): DataFrame =
    minhashSignaturesFast(docs, nBands)
      .groupBy(col("band"), col("min_hash"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("d1"), col("ids"))
      .select(col("d1"), explode(col("ids")).as("d2"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct()

  /** Near-dup candidate pairs: docs sharing any (band, min_hash) bucket.
    * Equi-join on the bucket key — the LSH trick that avoids O(n²); at
    * 100 TB both sides hash-partition on (band, min_hash). */
  def nearDupCandidates(docs: DataFrame, nBands: Int = NumBands): DataFrame = {
    // bucket-grouped pair generation instead of a signature self-join: the
    // signatures are computed ONCE, shuffled once on (band, min_hash), and
    // pairs are emitted within each bucket — at scale the self-join would
    // recompute the whole signature pipeline for both sides
    minhashSignatures(docs, nBands)
      .groupBy(col("band"), col("min_hash"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("d1"), col("ids"))
      .select(col("d1"), explode(col("ids")).as("d2"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct()
  }

  def x06NearDupPairs(s: SparkSession, dir: String): DataFrame =
    nearDupCandidates(documents(s, dir)).orderBy(col("d1"), col("d2"))

  /** 64-bit SimHash per document: per-token 64-bit hash (xxhash64), each bit
    * votes ±1 weighted by token frequency; signature bit = sign of the vote.
    * Expressed as explode(bits)+agg; an `Aggregator` fusing the 64 counters
    * into one pass is the next optimization if this shows up in profiles.
    */
  def simhash64(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bitMask = expr("shiftleft(CAST(1 AS BIGINT), bit)")
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .withColumn("h", xxhash64(col("token")))
      .select(col(idCol), col("h"), explode(sequence(lit(0), lit(63))).as("bit"))
      .withColumn("vote", when(col("h").bitwiseAND(bitMask) =!= 0, lit(1)).otherwise(lit(-1)))
      .groupBy(col(idCol), col("bit"))
      .agg(sum(col("vote")).as("votes"))
      .groupBy(col(idCol))
      .agg(sum(when(col("votes") > 0, bitMask).otherwise(lit(0L))).as("simhash"))
  }

  def x07Simhash(s: SparkSession, dir: String): DataFrame =
    simhash64(documents(s, dir)).select(col("doc_id"), col("simhash")).orderBy(col("doc_id"))

  /** 32-bit SimHash with an md5-derived per-token hash: bit i of a token's
    * hash = parity of hex digit i of md5(token). Same vote/sign scheme as
    * [[simhash64]] but every step is reproducible in ANSI SQL — this is the
    * oracle-checked variant (the xxhash64 one is the JVM-fast variant). */
  def simhash32Md5(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val oddHex = Seq("1", "3", "5", "7", "9", "b", "d", "f")
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
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

  /** Embedding-cosine near-dup pairs via LSH buckets (approximate; exact
    * within-bucket cosine filter at `threshold`). */
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

  def x10EmbeddingNearDups(s: SparkSession, dir: String): DataFrame =
    embeddingNearDups(embeddings(s, dir), threshold = 0.5)
      .orderBy(col("v1"), col("v2"))
}
