package graft

/** DuckDB SQL generator for Spark-parity XXH64 — the piece that lets the
  * xxhash64-based production forms (x05b/x06b fast minhash, x07 fused
  * simhash) carry full DuckDB oracles instead of rows-only checks.
  *
  * Spark's `xxhash64` is canonical XXH64 (xxHash spec, public domain
  * algorithm) with seed 42, reading little-endian words of the UTF-8
  * bytes; multi-argument calls fold left with the running hash as the
  * next seed, longs hashed as their 8 LE bytes and ints as 4. DuckDB has
  * no xxhash64, so this object emits the algorithm itself as SQL:
  *
  *  - 64-bit wrap-around arithmetic via UHUGEINT products reduced
  *    mod 2^64 (UBIGINT ops would raise on overflow, HUGEINT is signed
  *    and one bit short for the worst 64×64 product);
  *  - the ≥32-byte stripe loop as a recursive CTE advancing 32 bytes per
  *    round over the DISTINCT-string relation (each intermediate state is
  *    a row; the terminal row per string feeds the merge);
  *  - the ≤31-byte tail fully unrolled (3 conditional 8-byte rounds, one
  *    4-byte, three 1-byte) as staged CTE projections so no expression is
  *    duplicated combinatorially;
  *  - `hashLong`/`hashInt` (the 8- and 4-byte specializations Spark uses
  *    for chained arguments) as short staged chains.
  *
  * Byte access has two modes: the default `ord(substr(s, i, 1))`, which
  * equals the UTF-8 byte for ASCII input (the corpus data contract), and
  * a UTF-8 mode (`utf8Bytes = true`) that hex-materializes the string's
  * byte sequence once and reads 2 hex digits per byte — correct for any
  * input, used by the u-prefixed multibyte oracle slice (u02). */
private[graft] object XxhashSql {

  private val M64 = BigInt(1) << 64
  private val Mod = "18446744073709551616::UHUGEINT"
  private val P1 = BigInt("11400714785074694791")
  private val P2 = BigInt("14029467366897019727")
  private val P3 = BigInt("1609587929392839161")
  private val P4 = BigInt("9650029242287828579")
  private val P5 = BigInt("2870177450012600261")
  private def u(b: BigInt): String = s"$b::UBIGINT"

  private def mul(a: String, b: String): String =
    s"CAST((CAST($a AS UHUGEINT) * CAST($b AS UHUGEINT)) % $Mod AS UBIGINT)"
  private def add(a: String, b: String): String =
    s"CAST((CAST($a AS UHUGEINT) + CAST($b AS UHUGEINT)) % $Mod AS UBIGINT)"
  private def xor(a: String, b: String): String = s"xor($a, $b)"
  private def rotl(x: String, r: Int): String =
    s"(${mul(x, u(BigInt(1) << r))} | ($x >> ${64 - r}))"
  private def rnd(acc: String, inp: String): String =
    mul(rotl(add(acc, mul(inp, u(P2))), 31), u(P1))
  private def mergeRound(h: String, v: String): String =
    add(mul(xor(h, rnd("0::UBIGINT", v)), u(P1)), u(P4))

  /** Little-endian read of `n` bytes at 1-based position expr `i`.
    * ASCII mode reads `ord(substr(s, i, 1))` — the UTF-8 byte only when
    * every code point is single-byte (the corpus data contract). UTF-8
    * mode reads 2 hex digits from the carried `hs = hex(encode(s))`
    * column — the true byte at any position, at the cost of one hex
    * materialization per string (DuckDB has no BLOB subscripting, so the
    * hex string IS the byte array). */
  private def readN(i: String, n: Int, utf8: Boolean = false): String =
    (0 until n).map(j =>
      if (utf8)
        s"(CAST(('0x' || substr(hs, 2*($i + $j) - 1, 2)) AS UBIGINT) * ${u(BigInt(1) << (8 * j))})"
      else
        s"(CAST(ord(substr(s, $i + $j, 1)) AS UBIGINT) * ${u(BigInt(1) << (8 * j))})")
      .mkString("(", " + ", ")")

  private def avalanche(rel: String, keep: String, outCte: String, outCol: String): String =
    s"${outCte}_a1 AS (SELECT $keep, ${mul(xor("h", "h >> 33"), u(P2))} AS h FROM $rel), " +
      s"${outCte}_a2 AS (SELECT $keep, ${mul(xor("h", "h >> 29"), u(P3))} AS h FROM ${outCte}_a1), " +
      s"$outCte AS (SELECT $keep, ${xor("h", "h >> 32")} AS $outCol FROM ${outCte}_a2)"

  /** CTE chain hashing every row of `strsCte(s)` with XXH64(utf8, 42):
    * emits `xh(s, hu UBIGINT)`. Must be spliced after WITH RECURSIVE.
    * With `utf8Bytes` the chain hashes the string's true UTF-8 bytes
    * (hex-materialized once in `xs`) instead of relying on the ASCII
    * char==byte identity; `strlen` is already the byte length in both
    * modes. */
  def xxh64StrCtes(strsCte: String, utf8Bytes: Boolean = false): String = {
    val seed = BigInt(42)
    val v10 = u((seed + P1 + P2) % M64)
    val v20 = u((seed + P2) % M64)
    val v30 = u(seed)
    val v40 = u((seed - P1 + M64) % M64)
    val hShort = u((seed + P5) % M64)
    val ks = if (utf8Bytes) "s, hs" else "s" // key cols carried through the chain
    def rdN(i: String, n: Int): String = readN(i, n, utf8Bytes)
    def tail8(from: String, to: String): String =
      s"$to AS (SELECT $ks, n, CASE WHEN i + 7 <= n THEN i + 8 ELSE i END AS i, " +
        s"CASE WHEN i + 7 <= n THEN ${add(mul(rotl(xor("h", rnd("0::UBIGINT", rdN("i", 8))), 27), u(P1)), u(P4))} ELSE h END AS h FROM $from)"
    def tail1(from: String, to: String): String =
      s"$to AS (SELECT $ks, n, CASE WHEN i <= n THEN i + 1 ELSE i END AS i, " +
        s"CASE WHEN i <= n THEN ${mul(rotl(xor("h", mul(rdN("i", 1), u(P5))), 11), u(P1))} ELSE h END AS h FROM $from)"
    val xs =
      if (utf8Bytes)
        s"xs AS (SELECT s, hex(encode(s)) AS hs, CAST(strlen(s) AS BIGINT) AS n FROM $strsCte), "
      else
        s"xs AS (SELECT s, CAST(strlen(s) AS BIGINT) AS n FROM $strsCte), "
    xs +
      s"st AS (SELECT $ks, n, $v10 AS v1, $v20 AS v2, $v30 AS v3, $v40 AS v4, CAST(1 AS BIGINT) AS i FROM xs WHERE n >= 32 " +
      s"UNION ALL SELECT $ks, n, ${rnd("v1", rdN("i", 8))}, ${rnd("v2", rdN("i + 8", 8))}, ${rnd("v3", rdN("i + 16", 8))}, ${rnd("v4", rdN("i + 24", 8))}, i + 32 FROM st WHERE i + 31 <= n), " +
      "stf AS (SELECT * FROM st WHERE i + 31 > n), " +
      s"h0 AS (SELECT $ks, n, i, ${mergeRound(mergeRound(mergeRound(mergeRound(add(add(add(rotl("v1", 1), rotl("v2", 7)), rotl("v3", 12)), rotl("v4", 18)), "v1"), "v2"), "v3"), "v4")} AS h FROM stf " +
      s"UNION ALL SELECT $ks, n, CAST(1 AS BIGINT) AS i, $hShort AS h FROM xs WHERE n < 32), " +
      s"hl AS (SELECT $ks, n, i, ${add("h", "CAST(n AS UBIGINT)")} AS h FROM h0), " +
      tail8("hl", "t1") + ", " + tail8("t1", "t2") + ", " + tail8("t2", "t3") + ", " +
      s"t4 AS (SELECT $ks, n, CASE WHEN i + 3 <= n THEN i + 4 ELSE i END AS i, " +
      s"CASE WHEN i + 3 <= n THEN ${add(mul(rotl(xor("h", mul(rdN("i", 4), u(P1))), 23), u(P2)), u(P3))} ELSE h END AS h FROM t3), " +
      tail1("t4", "t5") + ", " + tail1("t5", "t6") + ", " + tail1("t6", "t7") + ", " +
      avalanche("t7", "s", "xh", "hu")
  }

  /** `hashLong(hu, 42)` over `xh(s, hu)` → `xh2(s, hu2)`: Spark's 8-byte
    * specialization with the constant seed folded in. */
  def hashLong42Ctes: String = {
    val c0 = u((BigInt(42) + P5 + 8) % M64)
    s"l1 AS (SELECT s, ${mul(rotl(mul("hu", u(P2)), 31), u(P1))} AS k1 FROM xh), " +
      s"l2 AS (SELECT s, ${xor(c0, "k1")} AS h FROM l1), " +
      s"l3 AS (SELECT s, ${add(mul(rotl("h", 27), u(P1)), u(P4))} AS h FROM l2), " +
      avalanche("l3", "s", "xh2", "hu2")
  }

  /** `hashInt(band, hu2)` over `xh2 × bands 0..7` → `xh3(s, band, hu3)`:
    * the 4-byte specialization with the running hash as seed. */
  def hashIntBandCtes: String = {
    val p5p4 = u((P5 + 4) % M64)
    s"bnd AS (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS band), " +
      s"i0 AS (SELECT s, band, ${add("hu2", p5p4)} AS h, ${mul("CAST(band AS UBIGINT)", u(P1))} AS k1 FROM xh2 CROSS JOIN bnd), " +
      s"i1 AS (SELECT s, band, ${xor("h", "k1")} AS h FROM i0), " +
      s"i2 AS (SELECT s, band, ${add(mul(rotl("h", 23), u(P2)), u(P3))} AS h FROM i1), " +
      avalanche("i2", "s, band", "xh3", "hu3")
  }

  /** Reinterpret an UBIGINT hash as Spark's signed BIGINT. */
  def signed(uexpr: String): String =
    s"CASE WHEN $uexpr >= 9223372036854775808::UBIGINT " +
      s"THEN CAST(CAST($uexpr AS HUGEINT) - 18446744073709551616 AS BIGINT) " +
      s"ELSE CAST($uexpr AS BIGINT) END"
}
