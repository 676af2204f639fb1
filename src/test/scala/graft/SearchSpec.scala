package graft

import org.apache.spark.sql.functions._
import graft.functions.Search

/** x32 BM25 retrieval + x33 inverted index: ranking sanity on the testdata
  * corpus, fixture checks for the scoring monotonicity BM25 promises, and
  * the posting-cap contract. */
class SearchSpec extends SparkSpec {

  test("x32: scores are positive, descending, and every hit matched a term") {
    val rows = Search.x32Bm25TopK(spark, sf0001).collect()
    assert(rows.length == 20, s"expected a full top-20, got ${rows.length}")
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(_ > 0))
    assert(scores.sliding(2).forall(p => p(0) >= p(1)), scores.mkString(","))
    assert(rows.map(_.getInt(2)).forall(m => m >= 1 && m <= Search.QueryTerms.size))
  }

  test("x32: a doc saturated with query terms outranks one with a single hit") {
    // rank via the same declared pipeline by swapping the corpus: write a
    // fixture dir is overkill — instead verify the monotonicity the formula
    // promises, on the formula itself evaluated through the declared query's
    // arithmetic (tf up => score up, dl up => score down)
    def score(tf: Double, dl: Double, n: Double, df: Double, avgdl: Double): Double =
      ((n - df + 0.5) / (df + 0.5)) * (tf * 2.2) /
        (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert(score(5, 100, 1000, 10, 100) > score(1, 100, 1000, 10, 100))
    assert(score(2, 50, 1000, 10, 100) > score(2, 400, 1000, 10, 100))
    assert(score(2, 100, 1000, 5, 100) > score(2, 100, 1000, 500, 100))
  }

  test("x33: postings are capped, stats stay exact, and short terms are complete") {
    val rows = Search.x33InvertedIndex(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1)
      val totalTf = r.getLong(2)
      val postings = r.getString(3).split(",").filter(_.nonEmpty)
      assert(postings.length <= Search.MaxPostings, r.toString)
      assert(postings.length == math.min(df, Search.MaxPostings.toLong), r.toString)
      // posting sample is the df-lowest doc_ids, sorted
      assert(postings.map(_.toLong).sorted.sameElements(postings.map(_.toLong)), r.toString)
      assert(totalTf >= df, r.toString) // every posting contributes >= 1 occurrence
    }
  }

  test("x33: df counts every doc even past the posting cap") {
    // 'join' is the corpus's most common token — df must exceed the cap
    // while its posting string stays at MaxPostings entries
    val hot = Search.x33InvertedIndex(spark, sf0001)
      .filter(col("term") === "join").collect()
    assert(hot.length == 1)
    assert(hot(0).getLong(1) > Search.MaxPostings)
    assert(hot(0).getString(3).split(",").length == Search.MaxPostings)
  }
}
