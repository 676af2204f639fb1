package graft

import java.nio.file.Files
import graft.functions.{Bloom, Bpe, Corpus, Cms, Curation, Dedup, Sampling, Search, Text}

/** Degenerate-input hardening: every text/embedding operator must return an
  * EMPTY result (never throw) on an empty corpus — the behavior a pipeline
  * needs when a filter stage legitimately drains a partition of the data. */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft_empty").toString
    Tables.documents(spark, sf0001).limit(0)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables.embeddings(spark, sf0001).limit(0)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("text ops return empty on an empty corpus") {
    assert(Dedup.x01ExactDedup(spark, emptyDir).count() == 0)
    assert(Text.x02DocQuality(spark, emptyDir).count() == 0)
    assert(Dedup.x05MinhashSignatures(spark, emptyDir).count() == 0)
    assert(Dedup.x16VerifiedNearDups(spark, emptyDir).count() == 0)
    assert(Search.x33InvertedIndex(spark, emptyDir).count() == 0)
    assert(Corpus.x28BigramLm(spark, emptyDir).count() == 0)
    assert(Curation.x39CurationPipeline(spark, emptyDir).count() == 0)
    assert(Sampling.x40MixtureResample(spark, emptyDir).count() == 0)
  }

  test("retrieval and sketch ops degrade to empty results, not errors") {
    assert(Search.x32Bm25TopK(spark, emptyDir).count() == 0)
    assert(Cms.x38CmsHeavyHitters(spark, emptyDir).count() == 0)
    assert(Bloom.x35BloomDecontaminate(spark, emptyDir).count() == 0)
  }

  test("embedding ops return empty on an empty corpus") {
    assert(Dedup.x10EmbeddingNearDups(spark, emptyDir).count() == 0)
    assert(Dedup.x34SemanticDedup(spark, emptyDir).count() == 0)
    assert(graft.functions.Knn.x45KnnLabel(spark, emptyDir).count() == 0)
  }

  test("round-7 curation ops return empty on an empty corpus") {
    assert(Sampling.x46TokenBudgetMix(spark, emptyDir).count() == 0)
    assert(Search.x47TfidfTopK(spark, emptyDir).count() == 0)
    assert(Sampling.x48SplitLeakage(spark, emptyDir).count() == 0)
    assert(Corpus.x49NgramNovelty(spark, emptyDir).count() == 0)
    assert(Text.x50QualityTiers(spark, emptyDir).count() == 0)
    assert(graft.functions.GraphOps.x51DupPagerank(spark, emptyDir).count() == 0)
    assert(Dedup.x52ClusterSplit(spark, emptyDir).count() == 0)
    assert(Dedup.x53SourceOverlap(spark, emptyDir).count() == 0)
    assert(Corpus.x54SpanRemoval(spark, emptyDir).count() == 0)
    assert(Sampling.x56ContextWindows(spark, emptyDir).count() == 0)
    assert(Dedup.x57PriorityDedup(spark, emptyDir).count() == 0)
    assert(Sampling.x58CorpusShuffle(spark, emptyDir).count() == 0)
    assert(Dedup.x59IncrementalDedup(spark, emptyDir).count() == 0)
    assert(Sampling.x60LengthOutliers(spark, emptyDir).count() == 0)
    assert(Dedup.x62IncrementalNearDup(spark, emptyDir).count() == 0)
    assert(Corpus.x63LmPerplexity(spark, emptyDir).count() == 0)
    assert(Curation.x64SourceReport(spark, emptyDir).count() == 0)
    assert(graft.functions.Knn.x65LabelCentroids(spark, emptyDir).count() == 0)
    assert(Sampling.x66LengthHistogram(spark, emptyDir).count() == 0)
    assert(Corpus.x67PmiCollocations(spark, emptyDir).count() == 0)
    assert(Corpus.x68SelfRepetition(spark, emptyDir).count() == 0)
    assert(Dedup.x69ContainmentScreen(spark, emptyDir).count() == 0)
    assert(Text.x70DistinctiveTerms(spark, emptyDir).count() == 0)
    assert(Curation.x71PretrainPipeline(spark, emptyDir).count() == 0)
    assert(Curation.x72ScoreCalibration(spark, emptyDir).count() == 0)
    assert(Search.x73HashedFeatures(spark, emptyDir).count() == 0)
    assert(Sampling.x74NegativeSamples(spark, emptyDir).count() == 0)
    assert(Sampling.x75ReshardPlan(spark, emptyDir).count() == 0)
    assert(Dedup.x76MinhashCalibration(spark, emptyDir).count() == 0)
    assert(Sampling.x77DsirSelect(spark, emptyDir).count() == 0)
    assert(Text.x78GopherRules(spark, emptyDir).count() == 0)
    // x61 is a global aggregate: one row, zero terms, null fit — no throw
    val zipf = graft.functions.Stats.x61ZipfFit(spark, emptyDir).collect()
    assert(zipf.length == 1 && zipf(0).getLong(0) == 0L && zipf(0).isNullAt(1))
  }

  test("BPE training on an empty corpus yields an empty merge table") {
    assert(Bpe.x37BpeMerges(spark, emptyDir).count() == 0)
    assert(Bpe.x55BpeTokenize(spark, emptyDir).count() == 0)
  }
}
