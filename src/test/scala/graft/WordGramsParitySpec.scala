package graft

import org.apache.spark.sql.functions._

/** Round-21: [[graft.functions.Text.shingles]] / [[graft.functions
  * .Corpus.posGrams]] moved from interpreted transform+concat_ws HOF
  * pipelines to the native [[graft.plans.WordGrams]] expression. Parity
  * is pinned against the retained HOF reference forms on the edges the
  * oracle rows don't isolate: short/empty/null arrays, null tokens
  * (concat_ws skips them), duplicate grams (array_distinct keeps first
  * occurrence in order), multi-space and unicode tokens.
  */
class WordGramsParitySpec extends SparkSpec {
  import graft.functions.{Corpus, Text}

  private val cases = Seq[Seq[String]](
    Seq("a", "b", "c", "d", "e"),
    Seq("a", "b"), // shorter than n=3
    Seq(), // empty
    null, // null array
    Seq("x", "x", "x", "x"), // all-identical -> duplicate grams
    Seq("a", null, "c", "d"), // null token inside a window
    Seq("schöne", "wörter", "λέξεις", "詞", "a b", "c"), // unicode + embedded space
    Seq("a", "b", "a", "b", "a", "b")) // repeating pattern -> dup windows

  private def df = {
    val sparkS = spark
    import sparkS.implicits._
    cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "toks")
  }

  private def collectCol(c: org.apache.spark.sql.Column): Seq[(Long, Seq[String])] =
    df.select(col("id"), c.as("g")).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1))).toSeq

  test("native shingles == HOF shingles (n = 2, 3, 5)") {
    for (n <- Seq(2, 3, 5)) {
      val got = collectCol(Text.shingles(col("toks"), n))
      val want = collectCol(Text.shinglesHof(col("toks"), n))
      assert(got == want, s"n=$n\n got=$got\nwant=$want")
    }
  }

  test("native posGrams == HOF posGrams (n = 2, 5)") {
    for (n <- Seq(2, 5)) {
      val got = collectCol(Corpus.posGrams(col("toks"), n))
      val want = collectCol(Corpus.posGramsHof(col("toks"), n))
      assert(got == want, s"n=$n\n got=$got\nwant=$want")
    }
  }

  test("native grams survive whole-stage codegen over a real scan") {
    val sparkS = spark
    val d = Tables.documents(sparkS, sf0001).limit(200)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
    val got = d.select(col("doc_id"), Text.shingles(col("toks")).as("g"))
      .orderBy("doc_id").collect().map(_.getSeq[String](1)).toSeq
    val want = d.select(col("doc_id"), Text.shinglesHof(col("toks")).as("g"))
      .orderBy("doc_id").collect().map(_.getSeq[String](1)).toSeq
    assert(got == want)
  }
}
