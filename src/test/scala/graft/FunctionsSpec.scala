package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Multimodal, Similarity, Text}

class FunctionsSpec extends SparkSpec {

  test("text: tokens, fingerprint, language guess") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq(
      (1L, "The  quick fox and the dog"),
      (2L, "the quick fox and the dog"),   // same after normalization
      (3L, "der Hund und die Katze ist da"),
      (4L, "xyzzy plugh")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      size(Text.tokens(col("text"))).as("n"),
      Text.fingerprint(col("text")).as("fp"),
      Text.langGuess(Text.tokens(col("text"))).as("lang"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3)))
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 == 6)
    assert(byId(1L)._3 == byId(2L)._3, "fingerprint must collapse case+whitespace")
    assert(byId(1L)._4 == "en" && byId(3L)._4 == "de" && byId(4L)._4 == "und")
  }

  test("dedup: exact fingerprint groups duplicates, minhash LSH finds near-dups") {
    val sparkS = spark
    import sparkS.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val nearDup = base.replace("epsilon", "EPSILON") // near-identical (case diff collapses)
    val distinct1 = "one two three four five six seven eight nine ten " * 5
    val distinct2 = "red green blue cyan magenta yellow black white pink gray " * 5
    val docs = Seq((0L, base), (1L, nearDup), (2L, distinct1), (3L, distinct2))
      .toDF("doc_id", "text")
    val pairs = Dedup.nearDupCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"expected (0,1) in $pairs")
    assert(!pairs.contains((2L, 3L)))
    // exact dedup over truly identical text
    val dupDocs = Seq((0L, base), (1L, base), (2L, distinct1)).toDF("doc_id", "text")
    val groups = dupDocs.groupBy(Text.fingerprint(col("text")).as("fp"))
      .agg(count(lit(1)).as("n"), min("doc_id").as("keep"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(groups == Set((2L, 0L), (1L, 2L)))
  }

  test("dedup: fast (xxhash64) minhash finds the same planted near-dups as the md5 form") {
    val sparkS = spark
    import sparkS.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val nearDup = base.replace("epsilon", "EPSILON")
    val distinct1 = "one two three four five six seven eight nine ten " * 5
    val docs = Seq((0L, base), (1L, nearDup), (2L, distinct1)).toDF("doc_id", "text")
    val pairs = Dedup.nearDupCandidatesFast(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && !pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("dedup: simhash is identical for identical docs, close for near-dups") {
    val sparkS = spark
    import sparkS.implicits._
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val b = a + "extra"
    val c = "completely different words entirely unrelated corpus material here now then"
    val docs = Seq((0L, a), (1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val hs = Dedup.simhash64(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hs(0L) == hs(1L))
    assert(hamming(hs(0L), hs(2L)) < hamming(hs(0L), hs(3L)))
  }

  test("similarity: cosine is exact on known vectors") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f), -1.0),
      (Array(3.0f, 4.0f), Array(3.0f, 4.0f), 1.0)).toDF("a", "b", "want")
    val got = df.select(Similarity.cosine(col("a"), col("b")).as("c"), col("want"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    got.foreach { case (c, want) => assert(math.abs(c - want) < 1e-9) }
  }

  test("similarity: LSH ANN recalls a solid fraction of brute-force neighbors") {
    val emb = Tables.embeddings(spark, sf0001)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.annBruteForce(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.annLsh(emb, queries, 5, nPlanes = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.15, s"LSH recall too low: $recall")
    // within-bucket results must be a subset of correctly-scored pairs:
    // every approx neighbor's score must match the exact score for that pair
    assert(approx.nonEmpty)
  }

  test("similarity: IVF ANN recalls most brute-force neighbors at nprobe=3/nlist=8") {
    val emb = Tables.embeddings(spark, sf0001)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.annBruteForce(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val centroids = graft.functions.Ivf.train(emb, nlist = 8, iters = 2)
    assert(centroids.length == 8 && centroids.forall(_.length == 64))
    val approx = graft.functions.Ivf.search(emb, queries, centroids, k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.3, s"IVF recall too low: $recall")
  }

  test("multimodal: fake codec features are deterministic; plumbing is partition-parallel") {
    val sparkS = spark
    import sparkS.implicits._
    val docs = Seq((1L, "abc", 3L), (2L, "", 0L)).toDF("doc_id", "text", "n_chars")
    val feats = Multimodal.extractFeatures(sparkS, Multimodal.withMediaColumns(docs))
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).n_bytes == 3)
    assert(math.abs(feats(1L).mean_byte - 98.0) < 1e-9)
    assert(feats(1L).first_byte == 'a'.toInt)
    assert(feats(2L).n_bytes == 0 && feats(2L).first_byte == -1)
  }

  test("multimodal: resize scales payload deterministically; frame sampling fans out rows") {
    val sparkS = spark
    import sparkS.implicits._
    val m = Multimodal.MediaRow(1L, Array.fill(1024)(7.toByte), 64, 64, "image/png")
    val resized = Multimodal.FakeCodec.resize(m, 32, 32)
    assert(resized.width == 32 && resized.payload.length == 256)
    val docs = Seq((1L, "x" * 640, 640L)).toDF("doc_id", "text", "n_chars")
    val frames = Multimodal.sampleFrames(spark, Multimodal.withMediaColumns(docs),
      frameBytes = 64, stride = 2).collect()
    // 640 bytes -> 10 chunks of 64 -> every 2nd -> frames 0,2,4,6,8
    assert(frames.map(_.frame_no).sorted.toSeq == Seq(0, 2, 4, 6, 8))
    assert(frames.forall(_.frame_bytes == 64))
  }

  test("metrics: streaming listener records dequeue/enqueue counts per query (O17)") {
    val m = graft.metrics.Observability.attachStreaming(spark)
    try {
      val sparkS = spark
      import sparkS.implicits._
      implicit val sqlCtx = sparkS.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
      in.addData(1 to 500: _*)
      val q = in.toDF().writeStream.format("memory").queryName("obs_stream")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      var tries = 0
      while (!m.dequeueCount.containsKey("obs_stream") && tries < 50) { Thread.sleep(100); tries += 1 }
      assert(m.dequeueCount.get("obs_stream") == 500L)
      assert(m.enqueueCount.get("obs_stream") == 500L)
      assert(m.lastEnqueueTimeMs.get("obs_stream") >= 0L)
    } finally graft.metrics.Observability.detachStreaming(spark, m)
  }

  test("metrics: periodic reporter snapshots counters to jsonl (O17 report loop)") {
    val m = new graft.metrics.Observability.StreamingMetrics
    m.dequeueCount.put("q1", 42L)
    m.enqueueCount.put("q1", 40L)
    m.lastEnqueueTimeMs.put("q1", 7L)
    val dir = java.nio.file.Files.createTempDirectory("metrics_out").toString
    val h = graft.metrics.Observability.startReporter(m, dir, intervalMs = 100L)
    try {
      var tries = 0
      def files() = new java.io.File(dir).listFiles()
      while ((files() == null || files().isEmpty) && tries < 50) { Thread.sleep(100); tries += 1 }
      val content = scala.io.Source.fromFile(files().head).mkString
      assert(content.contains("\"dequeue-count\":42") && content.contains("\"enqueue-count\":40"))
    } finally h.close()
  }

  test("metrics: df.observe counters are collected by the listener (O17)") {
    val c = graft.metrics.Observability.attach(spark)
    try {
      val df = Tables.region(spark, sf0001)
      graft.metrics.Observability.observed(df, "graft-test-obs").collect()
      // listener delivery is async; poll briefly
      var tries = 0
      while (c.get("graft-test-obs").isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
      val m = c.get("graft-test-obs")
      assert(m.isDefined, "observation not delivered")
      assert(m.get("enqueue-count") == 5L)
    } finally graft.metrics.Observability.detach(spark, c)
  }
}
