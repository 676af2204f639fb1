package graft

import org.apache.spark.sql.functions._
import graft.functions.Bpe

/** x37 BPE merge-table training: hand-checked fixture, early stop, and
  * exact parity between the distributed loop and the JVM reference on the
  * testdata corpus (x37 is rows-only in the oracle gate — an iterative
  * argmax loop has no SQL twin — so this parity test IS its correctness
  * check). */
class BpeSpec extends SparkSpec {

  test("x37: hand-checked merges on a tiny corpus, with early stop") {
    val sparkS = spark
    import sparkS.implicits._
    val counts = Seq(("aaab", 3L), ("ab", 2L)).toDF("w", "cnt")
    val got = Bpe.train(counts, steps = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // step 0: (a,a)=6 beats (a,b)=5; step 1: (a,b)=5; step 2: (aa,ab)=3; then no pairs
    assert(got.toSeq == Seq(
      (0, "a", "a", "aa", 6L),
      (1, "a", "b", "ab", 5L),
      (2, "aa", "ab", "aaab", 3L)))
  }

  test("x37: tie on pair count breaks lexicographically") {
    val sparkS = spark
    import sparkS.implicits._
    // (b,c) and (a,b) both count 2 -> (a,b) wins the tie
    val counts = Seq(("ab", 2L), ("bc", 2L)).toDF("w", "cnt")
    val got = Bpe.train(counts, steps = 1).collect()
    assert(got.length == 1)
    assert(got(0).getString(1) == "a" && got(0).getString(2) == "b")
  }

  test("x37: non-BMP ties break identically in Spark and the JVM reference") {
    val sparkS = spark
    import sparkS.implicits._
    // U+FF21 (fullwidth A: UTF-8 EF BC A1, UTF-16 unit FF21) vs U+10400
    // (Deseret long I: UTF-8 F0 90 90 80, UTF-16 surrogate D801 DC00).
    // UTF-16 code-unit order puts the surrogate FIRST; Spark's UTF-8 byte
    // order puts fullwidth A first — a tie between pairs of the two is the
    // exact case where a String-ordering reference would diverge.
    val wide = "Ａ"; val deseret = new String(Character.toChars(0x10400))
    val counts = Seq((wide * 2, 2L), (deseret * 2, 2L)).toDF("w", "cnt")
    val got = Bpe.train(counts, steps = 1).collect()
    assert(got.length == 1 && got(0).getString(1) == wide,
      s"Spark picked ${got(0).getString(1)}")
    val want = Bpe.referenceMerges(Map(wide * 2 -> 2L, deseret * 2 -> 2L), 1)
    assert(want.head._2 == wide, s"reference picked ${want.head._2}")
  }

  test("x37: the codegen'd greedy merge fold matches a JVM fold on random inputs") {
    val sparkS = spark
    import sparkS.implicits._
    import org.scalacheck.{Gen, Prop}
    val symGen = Gen.listOfN(12, Gen.oneOf("a", "b", "ab", "c"))
    def jvmMerge(sym: List[String], l: String, r: String): List[String] = {
      val acc = scala.collection.mutable.ArrayBuffer[String]()
      for (x <- sym)
        if (acc.nonEmpty && acc.last == l && x == r) { acc.remove(acc.length - 1); acc += (l + r) }
        else acc += x
      acc.toList
    }
    checkProp(Prop.forAll(symGen, Gen.oneOf("a", "b", "ab"), Gen.oneOf("a", "b", "c")) {
      (sym, l, r) =>
        val got = Seq(Tuple1(sym)).toDF("sym")
          .select(graft.functions.Bpe.mergePair(org.apache.spark.sql.functions.col("sym"), l, r))
          .collect()(0).getSeq[String](0).toList
        got == jvmMerge(sym, l, r)
    }, min = 30)
  }

  test("x55: tokenize-with-trained-vocab matches a JVM train+apply replay") {
    val wc = Tables.documents(spark, sf0001)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val jvmCounts = wc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merges = Bpe.referenceMerges(jvmCounts, Bpe.MergeSteps)
      .map(m => (m._2, m._3))
    def applyJvm(w: String): Int = {
      var sym = w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
      for ((l, r) <- merges) {
        val acc = scala.collection.mutable.ArrayBuffer[String]()
        for (x <- sym)
          if (acc.nonEmpty && acc.last == l && x == r) { acc.remove(acc.length - 1); acc += (l + r) }
          else acc += x
        sym = acc.toVector
      }
      sym.length
    }
    val docToks = Tables.documents(spark, sf0001)
      .select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val want = docToks.map { case (id, ts) =>
      id -> ((ts.length.toLong, ts.map(applyJvm(_).toLong).sum))
    }.toMap
    val got = Bpe.x55BpeTokenize(spark, sf0001).collect()
    assert(got.length == docToks.length)
    got.foreach { r =>
      assert(want(r.getLong(0)) == ((r.getLong(1), r.getLong(2))), s"doc ${r.getLong(0)}")
    }
  }

  test("x37: distributed loop matches the JVM reference on the corpus") {
    val wc = Tables.documents(spark, sf0001)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val jvmCounts = wc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Bpe.referenceMerges(jvmCounts, Bpe.MergeSteps)
    val got = Bpe.x37BpeMerges(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq == want, s"\ngot:  ${got.toSeq}\nwant: $want")
  }
}
