package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

/** Foundation check for the xxhash64 oracles (XxhashSql): Spark's
  * `xxhash64` must equal canonical XXH64 (xxHash spec, seed 42) on UTF-8
  * bytes for EVERY length class — in particular the ≥32-byte stripe path,
  * which the synthetic corpus's short tokens/shingles never exercise (its
  * longest shingle is under 32 bytes). The DuckDB SQL generator was
  * validated against this same algorithm, so Spark == this reference ==
  * the generated SQL closes the chain for all lengths. */
class Xxh64ParitySpec extends SparkSpec {

  // reference XXH64 (public spec constants), arbitrary seed
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L
  private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))
  private def rnd(acc: Long, in: Long): Long = rotl(acc + in * P2, 31) * P1
  private def mrg(h: Long, v: Long): Long = (h ^ rnd(0L, v)) * P1 + P4
  private def read8(b: Array[Byte], i: Int): Long =
    java.nio.ByteBuffer.wrap(b, i, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
  private def read4(b: Array[Byte], i: Int): Long =
    java.nio.ByteBuffer.wrap(b, i, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xFFFFFFFFL

  def xxh64(data: Array[Byte], seed: Long): Long = {
    val n = data.length
    var i = 0
    var h =
      if (n >= 32) {
        var v1 = seed + P1 + P2; var v2 = seed + P2
        var v3 = seed; var v4 = seed - P1
        while (i + 32 <= n) {
          v1 = rnd(v1, read8(data, i)); v2 = rnd(v2, read8(data, i + 8))
          v3 = rnd(v3, read8(data, i + 16)); v4 = rnd(v4, read8(data, i + 24))
          i += 32
        }
        var x = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        x = mrg(x, v1); x = mrg(x, v2); x = mrg(x, v3); mrg(x, v4)
      } else seed + P5
    h += n
    while (i + 8 <= n) { h = rotl(h ^ rnd(0L, read8(data, i)), 27) * P1 + P4; i += 8 }
    if (i + 4 <= n) { h = rotl(h ^ (read4(data, i) * P1), 23) * P2 + P3; i += 4 }
    while (i < n) { h = rotl(h ^ ((data(i) & 0xFFL) * P5), 11) * P1; i += 1 }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^ (h >>> 32)
  }

  private def sparkXxh(ss: Seq[String]): Seq[Long] = {
    val sparkS = spark
    import sparkS.implicits._
    ss.toDF("s").select(xxhash64(col("s"))).collect().map(_.getLong(0)).toSeq
  }

  test("corpus text is ASCII — the byte extraction the SQL oracles assume") {
    // XxhashSql reads bytes as ord(substr(s, i, 1)), which equals the
    // UTF-8 byte only for ASCII; a non-ASCII data refresh must fail HERE
    // with a named contract violation, not as an oracle-wide hash red
    val bad = Tables.documents(spark, sf0001)
      .filter(col("text").isNotNull &&
        octet_length(col("text")) =!= length(col("text")))
      .count()
    assert(bad == 0L, s"$bad documents contain non-ASCII text; the " +
      "xxhash64 oracle byte extraction (ord(substr)) is invalid for them")
  }

  test("Spark xxhash64(string) == canonical XXH64(utf8, 42) across length classes") {
    val fixed = Seq("", "a", "abcdefg", "abcdefgh", "x" * 31, "y" * 32,
      "z" * 33, "q" * 64, "w" * 100, ("tok " * 20).trim)
    val got = sparkXxh(fixed)
    fixed.zip(got).foreach { case (s, g) =>
      assert(g == xxh64(s.getBytes("UTF-8"), 42L), s"len ${s.length}")
    }
  }

  test("property: parity holds for arbitrary ASCII strings (incl. stripe path)") {
    val gen = Gen.chooseNum(0, 120).flatMap(n =>
      Gen.listOfN(n, Gen.choose(' ', '~')).map(_.mkString))
    // batch the samples into ONE Spark job: collect generated strings
    // first, then compare a single DataFrame pass against the reference
    val samples = (1 to 200).flatMap(_ => gen.sample).distinct
    assert(samples.exists(_.length >= 32), "stripe path must be sampled")
    val got = sparkXxh(samples)
    samples.zip(got).foreach { case (s, g) =>
      assert(g == xxh64(s.getBytes("UTF-8"), 42L), s"mismatch for ${s.take(40)}…")
    }
  }

  test("chained args hash as 8-/4-byte specializations with running seed") {
    val sparkS = spark
    import sparkS.implicits._
    def hashLong(l: Long, seed: Long): Long = {
      var h = seed + P5 + 8
      h = rotl(h ^ rnd(0L, l), 27) * P1 + P4
      h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^ (h >>> 32)
    }
    def hashInt(i: Int, seed: Long): Long = {
      var h = seed + P5 + 4
      h = rotl(h ^ ((i.toLong & 0xFFFFFFFFL) * P1), 23) * P2 + P3
      h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^ (h >>> 32)
    }
    val rows = Seq((123456789L, 0), (-42L, 7), (0L, 63), (Long.MinValue, 3))
    val got = rows.toDF("l", "b")
      .select(xxhash64(col("l"), col("b"))).collect().map(_.getLong(0)).toSeq
    rows.zip(got).foreach { case ((l, b), g) =>
      assert(g == hashInt(b, hashLong(l, 42L)), s"($l, $b)")
    }
  }
}
