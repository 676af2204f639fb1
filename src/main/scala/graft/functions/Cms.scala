package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables._

/** Count-min sketch for heavy-hitter estimation: the mergeable-sketch
  * complement to the x35 bloom filter. One pass over the token stream
  * builds a fixed-size depth×width counter grid (an OR of +1s instead of
  * bits); any token's frequency is then estimated as the MIN of its k
  * cells — never an undercount, overcounts only from hash collisions.
  *
  * Scale shape: the build is one map-side-combinable aggregation whose
  * state is the [[Depth]]×[[Width]] long grid (96 KB here) — partials
  * vector-add, the shuffle carries one grid per partition regardless of
  * corpus size. Estimation is map-only element_at lookups against the
  * inlined grid. The declared query carries the exact counts alongside
  * (the x35 audit pattern): `cms_est ≥ n` always, and the oracle
  * reproduces the grid bit-for-bit because the k=3 hash functions are
  * 3-hex-digit md5 slices (cell = sum of counts of tokens hashing there).
  *
  * At 100 TB: width scales with the distinct-key budget (ε ≈ e/width of
  * the L1 mass per cell), depth with the failure probability — both stay
  * driver-literal-sized long before the exact groupBy becomes the cheaper
  * plan; the sketch's win is estimating frequencies WITHOUT shuffling the
  * corpus when only a candidate set needs scoring.
  */
object Cms {

  /** 3 hex digits per hash → width 16³ = 4096 cells per row. */
  val HexChars = 3
  val Width: Int = 1 << (4 * HexChars)
  val HashOffsets: Seq[Int] = Seq(0, 4, 8)
  val Depth: Int = HashOffsets.size

  /** Per-depth cell index of a token: parse `hexChars` hex chars of its md5
    * at each offset. Shared verbatim by build and probe sides. */
  def positions(tok: Column, hexChars: Int = HexChars): Seq[Column] =
    HashOffsets.map(o =>
      conv(substring(md5(tok), o + 1, hexChars), 16, 10).cast("int"))

  /** Distributed CMS build: vector-add aggregator over per-token cell
    * triples. */
  class CmsAgg(width: Int) extends Aggregator[(Int, Int, Int), Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](Depth * width)
    override def reduce(b: Array[Long], t: (Int, Int, Int)): Array[Long] = {
      b(t._1) += 1; b(width + t._2) += 1; b(2 * width + t._3) += 1; b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Build the grid over a one-column token-occurrence relation (`token`). */
  def sketch(tokens: DataFrame, hexChars: Int = HexChars): Array[Long] = {
    import tokens.sparkSession.implicits._
    val ps = positions(col("token"), hexChars)
    tokens.select(ps(0).as("p0"), ps(1).as("p1"), ps(2).as("p2"))
      .as[(Int, Int, Int)]
      .select(new CmsAgg(1 << (4 * hexChars)).toColumn)
      .head()
  }

  /** Point estimate: min over the k cells of the inlined grid. */
  def estimate(gridLit: Column, tok: Column, hexChars: Int = HexChars): Column = {
    val width = 1 << (4 * hexChars)
    val cells = positions(tok, hexChars).zipWithIndex.map { case (p, d) =>
      element_at(gridLit, p + lit(d * width) + 1)
    }
    least(cells: _*)
  }

  /** x38 — heavy hitters with sketch audit: exact top-20 tokens by count,
    * each with its CMS estimate and the (always ≥ 0) overcount. */
  def x38CmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val toks = documents(s, dir)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("token"))
    val gridLit = typedLit(sketch(toks).toSeq)
    // estimate BEFORE the top-k so orderBy+limit stays terminal and fuses
    // into TakeOrderedAndProject (projections after a limit un-fuse it into
    // a range-partitioned global sort — caught by PlanAuditSpec)
    toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .select(col("token"), col("n"),
        estimate(gridLit, col("token")).as("cms_est"))
      .withColumn("overcount", col("cms_est") - col("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)
  }
}
