package graft

import org.apache.spark.sql.functions._
import graft.functions.{Corpus, Privacy}

/** x27 PII redaction + x28 bigram LM scoring + x29 cross-doc dup spans on
  * hand-built fixtures with known answers. */
class CurationSpec extends SparkSpec {

  test("x39: every surviving doc passes the gates and is its group's canonical") {
    val rows = graft.functions.Curation.x39CurationPipeline(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val n = Tables.documents(spark, sf0001).count()
    assert(rows.length < n, "the quality gates must actually drop documents")
    rows.foreach { r =>
      assert(r.getInt(2) >= graft.functions.Curation.MinTokens, r.toString)
      val sr = r.getDouble(3)
      assert(sr >= graft.functions.Curation.MinStopRatio - 1e-4 &&
        sr <= graft.functions.Curation.MaxStopRatio + 1e-4, r.toString)
      assert(Set("train", "validation", "test").contains(r.getString(4)), r.toString)
      assert(Set("en", "de", "fr", "es", "und").contains(r.getString(1)), r.toString)
    }
  }

  test("x27: PII kinds are detected and redacted; PII-free text unchanged") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.org thanks"),
      (2L, "call 555-123-4567 or visit 192.168.0.1 today"),
      (3L, "no personal information here at all")).toDF("doc_id", "t")
    val out = df.select(col("doc_id"),
      regexp_count(col("t"), lit(Privacy.EmailPattern)).as("e"),
      regexp_count(col("t"), lit(Privacy.PhonePattern)).as("p"),
      regexp_count(col("t"), lit(Privacy.IpPattern)).as("i"),
      Privacy.redact(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(out(1L)._1 == 1 && out(1L)._4 == "reach me at [EMAIL] thanks")
    assert(out(2L)._2 == 1 && out(2L)._3 == 1 &&
      out(2L)._4 == "call [PHONE] or visit [IP] today")
    assert(out(3L) == ((0, 0, 0, "no personal information here at all")))
  }

  test("x27: deterministic enrichment hits exactly the doc_id residues") {
    val sparkS = spark
    import sparkS.implicits._
    val docs = (0L to 20L).map(i => (i, "plain words only")).toDF("doc_id", "text")
    val out = Privacy.withPiiColumns(docs)
      .select(col("doc_id"),
        regexp_count(col("text_pii"), lit(Privacy.EmailPattern)).as("e"),
        regexp_count(col("text_pii"), lit(Privacy.PhonePattern)).as("p"),
        regexp_count(col("text_pii"), lit(Privacy.IpPattern)).as("i"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    for (i <- 0L to 20L)
      assert(out(i) == ((if (i % 3 == 0) 1 else 0, if (i % 5 == 0) 1 else 0,
        if (i % 7 == 0) 1 else 0)), s"doc $i")
  }

  test("x28: bigram counts, averages, and rare fraction on a known fixture") {
    val sparkS = spark
    import sparkS.implicits._
    // doc 1: "a b a b" -> bigrams [a b, b a, a b]; doc 2: "a b c" -> [a b, b c]
    // doc 3: one token -> no bigrams
    // model: "a b" -> 3, "b a" -> 1, "b c" -> 1
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "solo")).toDF("doc_id", "text")
    val out = Corpus.bigramLm(Corpus.gramRelation(docs, Corpus.bigrams(_)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L) == ((3L, math.rint((3 + 1 + 3) / 3.0 * 1e4) / 1e4, 0.3333)))
    assert(out(2L) == ((2L, 2.0, 0.5))) // counts 3,1 -> avg 2.0; rare: "b c"
    assert(out(3L) == ((0L, 0.0, 0.0)))
  }

  test("x29: cross-doc repeated 5-gram spans flag the boilerplate doc") {
    val sparkS = spark
    import sparkS.implicits._
    val shared = "one two three four five"
    val docs = Seq(
      (1L, s"$shared six seven"),          // grams: 3, of which 1 shared
      (2L, s"prefix words here $shared"),  // grams: 4, of which 1 shared
      (3L, shared),                        // 1 gram, shared -> dup_frac 1.0
      (4L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val out = Corpus.dupSpans(Corpus.gramRelation(docs, Corpus.posGrams(_)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(out(1L) == ((3L, 0.3333, false)))
    assert(out(2L) == ((4L, 0.25, false)))
    assert(out(3L) == ((1L, 1.0, true)))
    assert(out(4L) == ((2L, 0.0, false)))
  }
}
