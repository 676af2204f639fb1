package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter membership for corpus-scale decontamination/dedup: build a
  * bit-array filter over a reference shingle set with a distributed
  * OR-merge Aggregator, then probe candidate shingles with pure bit-test
  * column expressions against the inlined filter literal.
  *
  * This is the bloom-accelerated twin of x22 decontamination: x22 ships the
  * eval-set shingles themselves (exact, but the broadcast grows with the
  * eval set); x35 ships a FIXED-SIZE bit array (64 Kbit = 8 KB here,
  * regardless of eval-set size) and tolerates a quantified false-positive
  * rate — the right trade at 100 TB where the reference set itself is huge.
  * No false negatives by construction; the declared query carries the exact
  * shared-count alongside for per-row FP accounting (n_maybe ≥ n_exact
  * always), and the oracle reproduces membership bit-for-bit because the
  * k=3 hash functions are 4-hex-digit slices of the shingle's md5 (the x05
  * "k hashes from one strong hash" construction — position arithmetic is
  * SQL-exact, and a set bit is exactly "some eval shingle hashed here").
  *
  * Scale shape: the build is one map-side-combinable aggregation whose
  * state is the 8 KB bit array (1024 longs) — partials OR-merge, the
  * shuffle carries one array per partition, nothing per-row. The probe is
  * map-only: k element_at + shift + mask ops per shingle against a plan
  * literal. At production scale raise [[BloomBitsLog2]] (e.g. 30 → 128 MB
  * for ~10^8 reference shingles at ~1e-3 FPR) and broadcast instead of
  * inlining.
  */
object Bloom {

  /** log2 of the filter size in bits: 2^16 bits = 8 KB. A 4-hex-digit md5
    * slice addresses exactly this space — no modulo, no bias. */
  val BloomBitsLog2 = 16
  val BloomBits: Int = 1 << BloomBitsLog2

  /** Hex offsets of the k=3 hash slices inside the 32-hex-char md5. */
  val HashOffsets: Seq[Int] = Seq(0, 4, 8)

  /** Docs below this id form the reference (eval) set — x22's split. */
  val EvalDocs = 20

  /** The k bit positions of one shingle: parse 4 hex chars at each offset
    * of its md5. Pure codegen'd column expressions, shared verbatim by the
    * build side and the probe side. */
  def positions(sh: Column): Seq[Column] =
    HashOffsets.map(o => conv(substring(md5(sh), o + 1, 4), 16, 10).cast("int"))

  /** Distributed bloom build: OR-merge aggregator over bit positions. */
  class BitsetAgg extends Aggregator[Int, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](BloomBits / 64)
    override def reduce(b: Array[Long], pos: Int): Array[Long] = {
      b(pos >>> 6) |= (1L << (pos & 63)); b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Build the filter over a one-column shingle relation (column `sh`). */
  def build(shingles: DataFrame): Array[Long] = {
    import shingles.sparkSession.implicits._
    shingles
      .select(explode(array(positions(col("sh")): _*)).as("pos"))
      .as[Int]
      .select(new BitsetAgg().toColumn)
      .head()
  }

  /** Bit-test of one position column against the inlined filter literal.
    * call_function("shiftright", …) because the shift distance is a column
    * (functions.shiftright only takes a literal Int). */
  def testBit(filterLit: Column, pos: Column): Column =
    call_function("shiftright",
      element_at(filterLit, shiftright(pos, 6) + 1), pos % 64)
      .bitwiseAND(lit(1L)) === 1L

  /** All k probe bits set ⇒ "probably in the reference set". */
  def maybeContains(filterLit: Column, sh: Column): Column =
    positions(sh).map(p => testBit(filterLit, p)).reduce(_ && _)

  /** x35 — bloom-filter decontamination: flag corpus docs whose trigram
    * shingles probably appear in the eval set (docs < [[EvalDocs]]), with
    * exact counts alongside for false-positive accounting. The production
    * path is the bloom columns only (map-only probe); `n_exact` /
    * `fp_shingles` are the audit. */
  def x35BloomDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val shingles = Dedup.cachedShingles(s, dir) // (doc_id, tg: array<string>)
    val evalSh = shingles.filter(col("doc_id") < EvalDocs)
      .select(explode(col("tg")).as("sh")).distinct()
    val filt = build(evalSh)
    val fLit = typedLit(filt.toSeq)
    val corpus = shingles.filter(col("doc_id") >= EvalDocs)
      .select(col("doc_id"), explode_outer(col("tg")).as("sh"))
    val maybe = col("sh").isNotNull && maybeContains(fLit, col("sh"))
    val exact = col("hit").isNotNull
    corpus
      .join(broadcast(evalSh.withColumn("hit", lit(1))), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("sh")).as("n_shingles"),
        sum(when(maybe, 1L).otherwise(0L)).as("n_maybe"),
        sum(when(exact, 1L).otherwise(0L)).as("n_exact"))
      .select(col("doc_id"), col("n_shingles"), col("n_maybe"), col("n_exact"),
        (col("n_maybe") >= 1).as("bloom_contaminated"),
        (col("n_maybe") - col("n_exact")).as("fp_shingles"))
      .orderBy(col("doc_id"))
  }
}
