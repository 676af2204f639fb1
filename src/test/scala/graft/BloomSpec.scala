package graft

import org.apache.spark.sql.functions._
import graft.functions.{Bloom, Dedup}
import graft.Tables

/** x35 bloom-filter membership (no false negatives, bounded false
  * positives, JVM/SQL position parity) and the x34 semantic-dedup
  * keep/drop policy (consistency with the oracled x10 pair relation). */
class BloomSpec extends SparkSpec {

  private def fixture(n: Int, tag: String) = {
    val sparkS = spark
    import sparkS.implicits._
    (0 until n).map(i => s"$tag shingle number $i").toDF("sh")
  }

  test("x35: every inserted shingle tests positive — no false negatives") {
    val in = fixture(200, "inserted")
    val filt = Bloom.build(in)
    val fLit = typedLit(filt.toSeq)
    val hits = in.filter(Bloom.maybeContains(fLit, col("sh"))).count()
    assert(hits == 200L)
  }

  test("x35: false-positive rate on foreign shingles is tiny at this fill") {
    val filt = Bloom.build(fixture(200, "inserted"))
    val fLit = typedLit(filt.toSeq)
    // 200 shingles × 3 hashes ≤ 600 of 65536 bits set → FPR ≈ (600/65536)^3
    val fp = fixture(2000, "foreign")
      .filter(Bloom.maybeContains(fLit, col("sh"))).count()
    assert(fp <= 2, s"expected ~0 false positives out of 2000, got $fp")
  }

  test("x35: column position arithmetic matches the JVM build-side hash") {
    val rows = fixture(50, "parity")
      .select(col("sh"), array(Bloom.positions(col("sh")): _*).as("ps"))
      .collect()
    rows.foreach { r =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(r.getString(0).getBytes("UTF-8")).map("%02x".format(_)).mkString
      val want = Bloom.HashOffsets.map(o => Integer.parseInt(hex.substring(o, o + 4), 16))
      assert(r.getSeq[Int](1) == want, r.toString)
    }
  }

  test("x35: declared query never under-counts (n_maybe >= n_exact >= 0)") {
    val rows = Bloom.x35BloomDecontaminate(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nMaybe, nExact, fpSh) = (r.getLong(2), r.getLong(3), r.getLong(5))
      assert(nMaybe >= nExact, r.toString)
      assert(fpSh == nMaybe - nExact && fpSh >= 0, r.toString)
    }
  }

  test("x34: dropped set and attribution agree with the x10 pair relation") {
    val pairs = Dedup.x10EmbeddingNearDups(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val minLower = pairs.groupBy(_._2).map { case (v2, ps) => v2 -> ps.map(_._1).min }
    val decisions = Dedup.x34SemanticDedup(spark, sf0001).collect()
    val n = Tables.embeddings(spark, sf0001).count()
    assert(decisions.length == n)
    decisions.foreach { r =>
      val id = r.getLong(0)
      minLower.get(id) match {
        case Some(lo) =>
          assert(!r.getBoolean(3) && r.getLong(2) == lo, r.toString)
        case None =>
          assert(r.getBoolean(3) && r.isNullAt(2), r.toString)
      }
    }
  }
}
