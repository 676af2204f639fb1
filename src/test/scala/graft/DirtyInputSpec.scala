package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.{Bloom, Cms, Corpus, Curation, Dedup, Sampling, Search, Text}

/** Dirty-data hardening: a 100 TB crawl WILL contain null, empty, and
  * whitespace-only text. Every text operator must process such rows
  * without throwing and account for every document (no silent row loss
  * beyond each op's documented filter). */
class DirtyInputSpec extends SparkSpec {

  /** 4 clean docs (two of them near-identical) + null text + empty text +
    * whitespace-only text, with the documents schema. */
  private lazy val dirtyDir: String = {
    val dir = Files.createTempDirectory("graft_dirty").toString
    val sparkS = spark
    import sparkS.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again", "en", "srcA", 60L),
      (1L, "the quick brown fox jumps over the lazy dog again and again", "en", "srcA", 60L),
      (2L, "ein ganz anderer text ohne wiederholung der und ist hier", "de", "srcB", 57L),
      (3L, "short", "en", "srcB", 5L),
      (4L, null.asInstanceOf[String], "en", "srcA", 0L),
      (5L, "", "en", "srcB", 0L),
      (6L, "   \t  \n ", "en", "srcA", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // collect(), never count(): count prunes columns, which HIDES evaluation
  // errors in the un-read expressions (an ANSI divide-by-zero in a ratio
  // column sails through a count) — the original version of this spec
  // missed three real bugs that way
  test("quality/lang/token ops process null, empty, and whitespace-only text") {
    val q = Text.x02DocQuality(spark, dirtyDir).collect()
    assert(q.length == 7)
    // zero-length docs define their ratios as 0.0, not an ANSI error
    assert(q.filter(r => Seq(4L, 5L, 6L).contains(r.getLong(0)))
      .forall(r => r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0))
    assert(Text.x03LangId(spark, dirtyDir).collect().length == 7)
    assert(Text.x25TokenCount(spark, dirtyDir).collect().length == 7)
    assert(Sampling.x23RepetitionStats(spark, dirtyDir).collect().length == 7)
    val tiers = Text.x50QualityTiers(spark, dirtyDir).collect()
    assert(tiers.length == 7 && tiers.forall(r => r.getInt(3) >= 1))
  }

  test("dedup/fingerprint ops group dirty docs without throwing") {
    val fp = Dedup.x01ExactDedup(spark, dirtyDir).collect()
    // null fingerprints collapse into one (possibly null-keyed) group;
    // the two identical docs share a group of size 2
    assert(fp.map(_.getLong(1)).sum == 7)
    assert(fp.exists(_.getLong(1) == 2))
    assert(Dedup.x05MinhashSignatures(spark, dirtyDir).count() > 0)
    assert(Dedup.x16VerifiedNearDups(spark, dirtyDir).count() >= 1,
      "identical docs must still pair")
  }

  test("gram-relation ops keep every doc, with zero counts for gramless text") {
    val nov = Corpus.x49NgramNovelty(spark, dirtyDir).collect()
    assert(nov.length == 7)
    assert(nov.filter(r => r.getLong(0) >= 3L).forall(_.getLong(1) == 0L),
      "short/null/empty docs have no 3-grams")
    val spans = Corpus.x29DupSpans(spark, dirtyDir).collect()
    assert(spans.length == 7)
    val removal = Corpus.x54SpanRemoval(spark, dirtyDir).collect()
    assert(removal.length == 7)
    val byId = removal.map(r => r.getLong(0) -> r).toMap
    assert(byId(0L).getLong(2) > 0 && byId(1L).getLong(2) > 0,
      "identical docs lose their shared spans")
    Seq(4L, 5L, 6L).foreach(id =>
      assert(byId(id).getLong(2) == 0 && byId(id).getString(3) == "", s"doc $id"))
  }

  /** Embeddings with a null vector and a wrong-dimension vector among
    * clean ones. */
  private lazy val dirtyEmbDir: String = {
    val dir = Files.createTempDirectory("graft_dirty_emb").toString
    val sparkS = spark
    import sparkS.implicits._
    val clean = (0L until 30L).map(i =>
      (i, Array.tabulate(64)(j => ((i * 7 + j) % 13).toFloat / 13f), (i % 3).toInt))
    (clean :+ ((30L, null.asInstanceOf[Array[Float]], 0)) :+
      ((31L, Array(1.0f, 2.0f), 1)))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("embedding ops tolerate null and wrong-dimension vectors") {
    // brute-force ANN: null/mismatched vectors score null and rank last
    val ann = graft.functions.Similarity.x08AnnMultiQuery(spark, dirtyEmbDir).collect()
    assert(ann.nonEmpty)
    assert(ann.forall(r => !r.isNullAt(2)), "top-k must be real scores")
    // kNN labels: predictions only from well-formed pool vectors
    val knn = graft.functions.Knn.x45KnnLabel(spark, dirtyEmbDir).collect()
    assert(knn.length == 20)
    // PQ: encode yields null codes for bad rows, search still returns top-k
    val emb = Tables.embeddings(spark, dirtyEmbDir)
    val cb = graft.functions.Pq.train(emb.filter(col("vec_id") < 30))
    val codes = graft.functions.Pq.encode(emb, cb).collect()
    val codeById = codes.map(r => r.getLong(0) -> r.isNullAt(3)).toMap
    assert(!codeById(0L) && codeById(30L) && codeById(31L),
      "bad vectors must encode to null, clean ones must not")
    // x65: null vector drops (no positions), the wrong-dim vector still
    // scores against the positions it has — never a throw
    val cent = graft.functions.Knn.x65LabelCentroids(spark, dirtyEmbDir).collect()
    assert(cent.map(_.getLong(0)).toSet == ((0L until 30L).toSet + 31L))
  }

  test("retrieval/sketch/curation ops survive the dirty corpus") {
    assert(Search.x32Bm25TopK(spark, dirtyDir).collect().length >= 0)
    assert(Search.x47TfidfTopK(spark, dirtyDir).collect().nonEmpty)
    assert(Search.x33InvertedIndex(spark, dirtyDir).collect().nonEmpty)
    assert(Cms.x38CmsHeavyHitters(spark, dirtyDir).collect().nonEmpty)
    // all 7 dirty docs sit below the benchmark-id cutoff, so the probe side
    // is legitimately empty — the assertion is "no throw", not "non-empty"
    assert(Bloom.x35BloomDecontaminate(spark, dirtyDir).collect().length >= 0)
    // the gate rejects every dirty doc (MinTokens) but must not throw on
    // the zero-token ratio; docs 0 or 1 pass if long enough — just no-throw
    assert(Curation.x39CurationPipeline(spark, dirtyDir).collect().length >= 0)
    assert(Sampling.x46TokenBudgetMix(spark, dirtyDir).collect().nonEmpty)
    assert(Sampling.x48SplitLeakage(spark, dirtyDir).collect().length >= 0)
    assert(Dedup.x53SourceOverlap(spark, dirtyDir).collect().length == 1,
      "two sources -> one overlap pair")
    // x77: every dirty doc is rankable (null/empty text scores 0 features,
    // null source counts as raw-only) — all 7 docs appear, none throws
    assert(Sampling.x77DsirSelect(spark, dirtyDir).collect().length == 7)
    // x78: null/empty/whitespace text scores 0 words and fails the gate
    // without throwing; every doc gets a verdict row
    val gop = Text.x78GopherRules(spark, dirtyDir).collect()
    assert(gop.length == 7 && gop.forall(r => !r.getBoolean(12) || r.getLong(1) >= 50))
  }

  test("round-9 ops (scaled BPE, UTF-8 slice, fast DSIR) survive the dirty corpus") {
    // x37b: null/empty/whitespace text contributes no words; training still
    // runs to exhaustion on the clean remainder
    val merges = graft.functions.Bpe.x37bBpeMergesScaled(spark, dirtyDir).collect()
    assert(merges.nonEmpty)
    // x55b: every doc accounted for, zero symbols for token-less docs
    val t = graft.functions.Bpe.x55bBpeTokenizeFull(spark, dirtyDir).collect()
    assert(t.length == 7)
    assert(t.filter(r => Seq(4L, 5L, 6L).contains(r.getLong(0))).forall(_.getLong(2) == 0L))
    // u01/u02: the multibyte projection of null text stays null-safe
    val u1 = graft.functions.Text.u01Utf8Tokens(spark, dirtyDir).collect()
    assert(u1.length == 7)
    val u2 = graft.functions.Text.u02Utf8Xxhash(spark, dirtyDir).collect()
    assert(u2.length == 7)
    // x77b: every doc scored or zero-defaulted, like x77
    val f = graft.functions.Sampling.x77bDsirSelectFast(spark, dirtyDir).collect()
    assert(f.length == 7)
  }

  test("round-10 multibyte fingerprint slice (u03-u06) survives the dirty corpus") {
    // u03: shingle-less docs (null/empty/ws/1-token) drop per x05b's
    // documented empty-shingle filter; the three shingled docs sign fully
    val u3 = Dedup.u03Utf8MinhashFast(spark, dirtyDir).collect()
    assert(u3.map(_.getLong(0)).distinct.sorted.toSeq == Seq(0L, 1L, 2L))
    assert(u3.groupBy(_.getLong(0)).values.forall(_.length == Dedup.NumBands),
      "every surviving doc carries a full band set")
    // u04: chunking accounts for every doc with non-empty text
    val u4 = Text.u04Utf8CdcChunks(spark, dirtyDir).collect()
    assert(Seq(0L, 1L, 2L, 3L).forall(id => u4.exists(_.getLong(0) == id)))
    // u05: token-less docs drop (x07b's explode_outer+filter contract);
    // the twins 0/1 hash identically
    val u5 = Dedup.u05Utf8Simhash(spark, dirtyDir).collect()
    assert(u5.map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    val byId = u5.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(0L) == byId(1L), "identical text must produce identical simhash")
    // u06: every doc lands in exactly one fingerprint group (null text
    // fingerprints to its own null group)
    val u6 = Text.u06Utf8RollingFingerprint(spark, dirtyDir).collect()
    assert(u6.map(_.getLong(1)).sum == 7L, "fingerprint groups must account for all 7 docs")
  }

  test("round-10 multibyte quality slice (u07/u08) survives the dirty corpus") {
    // u07: all 7 docs accounted; zero-length docs define ratios as 0.0
    val u7 = Text.u07Utf8Quality(spark, dirtyDir).collect()
    assert(u7.length == 7)
    assert(u7.filter(r => Seq(4L, 5L, 6L).contains(r.getLong(0)))
      .forall(r => r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0))
    val byId = u7.map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(byId(0L) == byId(1L), "identical text must produce identical signals")
    // the PROJECTED stop list actually matches the projected corpus — a
    // drift between utf8Lit and utf8Text would silently zero this ratio
    assert(u7.find(_.getLong(0) == 0L).get.getDouble(5) > 0.0,
      "projected stopwords must match the projected text")
    // u08: every doc gated; token-less docs have n_words = 0 and fail keep
    val u8 = Text.u08Utf8Gopher(spark, dirtyDir).collect()
    assert(u8.length == 7)
    assert(u8.filter(r => Seq(4L, 5L, 6L).contains(r.getLong(0)))
      .forall(r => r.getLong(1) == 0L && !r.getBoolean(12)))
    // doc 0 carries the projected "the"/"and" — the stop-hit count must
    // see them through the multibyte projection
    assert(u8.find(_.getLong(0) == 0L).get.getLong(6) >= 2L)
  }

  test("x57-x60 account for every dirty doc, including null source/lang metadata") {
    // x57: 7 docs across groups (null-text fp is its own null group);
    // unlisted sources rank after listed ones but never drop
    val p = Dedup.x57PriorityDedup(spark, dirtyDir).collect()
    assert(p.map(_.getLong(1)).sum == 7)
    // x58: every doc sharded exactly once, positions contiguous
    val sh = Sampling.x58CorpusShuffle(spark, dirtyDir).collect()
    assert(sh.map(_.getLong(2)).toSet == (0L to 6L).toSet)
    // x59 with srcA as the incoming batch: docs 0,1 share a fp (0 keeps,
    // 1 is in-batch dup), null-text doc 4 and ws-only doc 6 are unique fps
    val incr = Dedup.x59IncrementalDedup(spark, dirtyDir, batchSource = "srcA")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(incr.keySet == Set(0L, 1L, 4L, 6L))
    assert(incr(0L) == "new" && incr(1L) == "dup_in_batch")
    assert(incr(4L) == "new" && incr(6L) == "new")
    // x60: every doc ranked within its language, kept flag never null
    val lo = Sampling.x60LengthOutliers(spark, dirtyDir).collect()
    assert(lo.length == 7 && lo.forall(!_.isNullAt(4)))
    // x62: all four srcA docs screened (null/ws/short text has no shingles
    // -> zero matches, never a throw or a dropped row)
    val nd = Dedup.x62IncrementalNearDup(spark, dirtyDir, batchSource = "srcA")
      .collect()
    assert(nd.map(_.getLong(0)).toSet == Set(0L, 1L, 4L, 6L))
    // x64: both sources reported, all 7 docs counted (null text counts via
    // the fp sentinel), srcA's identical pair counts as dup exposure
    val rep = Curation.x64SourceReport(spark, dirtyDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rep("srcA").getLong(1) + rep("srcB").getLong(1) == 7)
    assert(rep("srcA").getLong(2) == 2, "the identical pair is dup-exposed")
    // x66: the zero bucket holds exactly the three token-less docs
    val hist = Sampling.x66LengthHistogram(spark, dirtyDir).collect()
    assert(hist.map(_.getLong(3)).sum == 7)
    assert(hist.find(_.getInt(0) == 0).map(_.getLong(3)).contains(3L))

    // null SOURCE and null LANG metadata: x57 routes null source through
    // the unlisted-priority branch, x59's null-safe corpus filter treats
    // it as already-ingested (never silent loss), x60 ranks null lang as
    // its own partition
    val dir = Files.createTempDirectory("graft_dirty_meta").toString
    val sparkS = spark
    import sparkS.implicits._
    Seq(
      (0L, "some perfectly fine text", null.asInstanceOf[String], null.asInstanceOf[String], 24L),
      (1L, "some perfectly fine text", "en", "src1", 24L),
      (2L, "different text", "en", "srcA", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val p2 = Dedup.x57PriorityDedup(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(p2.values.toSet.contains("src1"),
      "listed source must outrank the null source in its dup group")
    val incr2 = Dedup.x59IncrementalDedup(spark, dir, batchSource = "srcA")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(incr2 == Map(2L -> "new"),
      "null-source doc counts as corpus, not silently dropped")
    assert(Sampling.x60LengthOutliers(spark, dir).collect().length == 3)
  }
}
