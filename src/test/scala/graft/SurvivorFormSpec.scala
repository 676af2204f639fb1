package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Dedup

/** The survivor-table (`…Of`) forms of the dedup screens must be exactly
  * the dir forms when fed `documents(dir)` — SCALING.md §5's "point the
  * screens at the x01 survivor table" production form is a call, and these
  * prove the call is semantics-preserving. Each test uses a FRESH cache
  * tag so the Of-form builds its own signature/shingle relations rather
  * than silently reading the dir form's session cache. */
class SurvivorFormSpec extends SparkSpec {

  private def docs: DataFrame = Tables.documents(spark, sf0001)

  private def assertSame(a: DataFrame, b: DataFrame, name: String): Unit = {
    val (ra, rb) = (a.collect().toSeq, b.collect().toSeq)
    assert(ra.nonEmpty, s"$name: empty result proves nothing")
    assert(ra == rb, s"$name: dir form and Of form diverge")
  }

  test("x16 Of-form on documents(dir) equals the dir form") {
    assertSame(
      Dedup.x16VerifiedNearDups(spark, sf0001),
      Dedup.x16VerifiedNearDupsOf(spark, docs, sf0001 + "|oftest-x16"),
      "x16")
  }

  test("x26 Of-form on documents(dir) equals the dir form") {
    assertSame(
      Dedup.x26DupClusters(spark, sf0001),
      Dedup.x26DupClustersOf(spark, docs, sf0001 + "|oftest-x26"),
      "x26")
  }

  test("x62 Of-form on documents(dir) equals the dir form") {
    assertSame(
      Dedup.x62IncrementalNearDup(spark, sf0001),
      Dedup.x62IncrementalNearDupOf(spark, docs, sf0001 + "|oftest-x62"),
      "x62")
  }

  test("x69 Of-form on documents(dir) equals the dir form") {
    assertSame(
      Dedup.x69ContainmentScreen(spark, sf0001),
      Dedup.x69ContainmentScreenOf(spark, docs, sf0001 + "|oftest-x69"),
      "x69")
  }

  test("x51 quotient form equals full-graph PageRank on the clone-free corpus") {
    val emb = Tables.embeddings(spark, sf0001)
    val full = graft.functions.GraphOps.pageRank(
      Dedup.embeddingNearDups(emb, threshold = Dedup.EmbeddingNearDupThreshold))
    val quot = graft.functions.GraphOps.pageRankQuotient(emb)
    assertSame(full, quot, "x51")
  }

  test("x51 quotient form equals full-graph PageRank on a clone-dense corpus") {
    // triple every vector: families of size 3 exercise self-edges,
    // multiplicity-weighted inflow, and the member expansion
    val emb = Tables.embeddings(spark, sf0001).limit(100)
    val clones = (0 until 3).map(k =>
      emb.select((col("vec_id") + lit(k * 100000)).as("vec_id"), col("embedding")))
      .reduce(_ union _)
    val full = graft.functions.GraphOps.pageRank(
      Dedup.embeddingNearDups(clones, threshold = Dedup.EmbeddingNearDupThreshold))
    val quot = graft.functions.GraphOps.pageRankQuotient(clones)
    assertSame(full, quot, "x51-clones")
  }

  test("x51 quotient form: duplicated null/zero embeddings never become phantom nodes") {
    val sparkS = spark
    import sparkS.implicits._
    // 2 copies of a null embedding + 2 copies of the zero vector + a real
    // clone family: the full form's score filter drops every null/zero
    // pair (cosine is null), so those rows must not be nodes — the
    // quotient's self-edges are gated on the same expression
    val real = Tables.embeddings(spark, sf0001).limit(20)
    val dim = real.select(size(col("embedding"))).first().getInt(0)
    val degenerate = Seq(
      (900001L, null.asInstanceOf[Array[Float]]),
      (900002L, null.asInstanceOf[Array[Float]]),
      (900003L, Array.fill(dim)(0.0f)),
      (900004L, Array.fill(dim)(0.0f)))
      .toDF("vec_id", "embedding")
    val emb = real.select(col("vec_id"), col("embedding"))
      .unionByName(real.select((col("vec_id") + 800000L).as("vec_id"), col("embedding")))
      .unionByName(degenerate)
    val full = graft.functions.GraphOps.pageRank(
      Dedup.embeddingNearDups(emb, threshold = Dedup.EmbeddingNearDupThreshold))
    val quot = graft.functions.GraphOps.pageRankQuotient(emb)
    assertSame(full, quot, "x51-degenerate")
    val ranked = quot.collect().map(_.getLong(0)).toSet
    // null embeddings produce no pairs in either form — never nodes
    assert(!ranked.contains(900001L) && !ranked.contains(900002L),
      "null-embedding families must not receive ranks")
    // zero vectors DO pair with each other in both forms: cosine(0, 0) is
    // NaN and Spark (like DuckDB) orders NaN above every number, so the
    // NaN score passes the >= threshold filter — the quotient's self-edge
    // gate uses the same expression and reproduces it exactly
    assert(ranked.contains(900003L) && ranked.contains(900004L),
      "zero-vector clone family is a real (NaN-scored) node in both forms")
  }

  test("x59 maintained-index form: folding batches keeps the index exact") {
    val fp = graft.functions.Text.fingerprint(col("text"))
    val withFp = docs.select(col("doc_id"), col("source"), fp.as("fp"))
    // day 0: corpus = everything but src18/src19; day 1 ingests src18,
    // day 2 classifies src19 against the FOLDED index
    val day0 = withFp.filter(!col("source").isin("src18", "src19"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("corpus_id"))
    val batch1 = withFp.filter(col("source") === "src18").select(col("doc_id"), col("fp"))
    val folded = Dedup.updateFingerprintIndex(day0, batch1)
    // the folded index equals a from-scratch recompute over corpus+batch1
    val recomputed = withFp.filter(col("source") =!= "src19")
      .groupBy(col("fp")).agg(min(col("doc_id")).as("corpus_id"))
    assertSame(folded.orderBy("fp"), recomputed.orderBy("fp"), "folded index")
    // idempotent: re-folding the same batch changes nothing
    assertSame(Dedup.updateFingerprintIndex(folded, batch1).orderBy("fp"),
      folded.orderBy("fp"), "re-fold")
    // day-2 classification over the maintained index == the dir form
    // (whose corpus side is everything-but-src19 = corpus+batch1)
    val batch2 = withFp.filter(col("source") === "src19").select(col("doc_id"), col("fp"))
    assertSame(
      Dedup.x59IncrementalDedup(spark, sf0001),
      Dedup.x59IncrementalDedupOf(folded, batch2),
      "x59 over maintained index")
  }

  test("x74 Of-form with a materialized pair table equals the dir form") {
    val dirForm = graft.functions.Sampling.x74NegativeSamples(spark, sf0001)
    // materialize the pair set the way a maintained table would arrive:
    // written out and read back, different lineage entirely
    val tmp = java.nio.file.Files.createTempDirectory("graft_x74pairs").toString
    Dedup.x16VerifiedNearDups(spark, sf0001)
      .select(col("d1"), col("d2")).write.mode("overwrite").parquet(tmp)
    val ofForm = graft.functions.Sampling.x74NegativeSamplesOf(
      spark, docs, spark.read.parquet(tmp))
    assertSame(dirForm, ofForm, "x74")
  }

  test("x26 Of-form on the exact-dedup survivors never pairs dropped twins") {
    val survivors = docs
      .withColumn("fp", graft.functions.Text.fingerprint(col("text")))
      .withColumn("keep",
        min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .filter(col("doc_id") === col("keep"))
      .select(col("doc_id"), col("text"))
    val ids = survivors.select("doc_id").collect().map(_.getLong(0)).toSet
    val cc = Dedup
      .x26DupClustersOf(spark, survivors, sf0001 + "|oftest-x26surv").collect()
    assert(cc.forall(r => ids.contains(r.getLong(0)) && ids.contains(r.getLong(1))),
      "cluster members and labels must come from the survivor relation")
    // every full-corpus cluster minimum is an exact-dedup survivor, so the
    // survivor-form labels are a subset-consistent relabeling: each
    // survivor keeps a cluster whose minimum is itself a survivor
    val full = Dedup.x26DupClusters(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    cc.foreach { r =>
      val (docId, label) = (r.getLong(0), r.getLong(1))
      assert(full.contains(docId), s"survivor $docId lost its full-corpus cluster")
      assert(full(docId) == label,
        s"survivor $docId: full-corpus label ${full(docId)} != survivor label $label " +
          "(twins are signature-identical, so dropping them cannot move a minimum)")
    }
  }
}
