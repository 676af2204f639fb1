package graft

import org.apache.spark.sql.functions._
import graft.functions.{ScoredPair, Similarity, TopKByScore}
import graft.plans.GraftExtensions

class ExpressionSpec extends SparkSpec {

  test("native cosine expression is bit-identical to the zip_with/aggregate form") {
    GraftExtensions.register(spark)
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val both = emb.crossJoin(broadcast(q))
      .select(col("vec_id"),
        Similarity.cosine(col("embedding"), col("q_emb")).as("hof"),
        Similarity.cosineNative(col("embedding"), col("q_emb")).as("native"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(1), r.getDouble(2)) == 0,
        s"vec ${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
  }

  test("native cosine: codegen and interpreted paths agree; nulls and mismatches are null") {
    GraftExtensions.register(spark)
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f, 2.0f))),
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f))),   // length mismatch
      (None, Some(Array(1.0f, 2.0f)))                  // null input
    ).toDF("a", "b")
    val rows = df.select(Similarity.cosineNative(col("a"), col("b"))).collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12)
    assert(rows(1).isNullAt(0))
    assert(rows(2).isNullAt(0))
    // interpreted path (codegen off) must agree
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val rows2 = df.select(Similarity.cosineNative(col("a"), col("b"))).collect()
      assert(math.abs(rows2(0).getDouble(0) - 1.0) < 1e-12)
      assert(rows2(1).isNullAt(0) && rows2(2).isNullAt(0))
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("native cosine: null array elements yield null, matching the HOF form") {
    GraftExtensions.register(spark)
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq(
      (Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(1.0), Some(2.0))),
      (Seq[Option[Double]](Some(1.0), Some(2.0)), Seq[Option[Double]](None, Some(2.0))),
      (Seq[Option[Double]](Some(1.0), Some(2.0)), Seq[Option[Double]](Some(1.0), Some(2.0)))
    ).toDF("a", "b")
    def run(): Seq[(Boolean, Boolean)] =
      df.select(Similarity.cosineNative(col("a"), col("b")).as("native"),
          Similarity.cosine(col("a"), col("b")).as("hof"))
        .collect().map(r => (r.isNullAt(0), r.isNullAt(1))).toSeq
    val rows = run()
    assert(rows == Seq((true, true), (true, true), (false, false)),
      s"native must propagate element nulls exactly like the HOF form: $rows")
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(run() == Seq((true, true), (true, true), (false, false)))
    }
  }

  test("native dot_product is bit-identical to the zip_with/aggregate form") {
    GraftExtensions.register(spark)
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val both = emb.crossJoin(broadcast(q))
      .select(col("vec_id"),
        Similarity.dot(col("embedding"), col("q_emb")).as("hof"),
        Similarity.dotNative(col("embedding"), col("q_emb")).as("native"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(1), r.getDouble(2)) == 0,
        s"vec ${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
  }

  test("native dot_product: nulls, length mismatch, element nulls; codegen/interpreted agree") {
    GraftExtensions.register(spark)
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq(
      (Seq[Option[Double]](Some(2.0), Some(3.0)), Seq[Option[Double]](Some(4.0), Some(5.0))),
      (Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(1.0), Some(2.0))),
      (Seq[Option[Double]](Some(1.0)), Seq[Option[Double]](Some(1.0), Some(2.0)))
    ).toDF("a", "b")
    def run(): Seq[Option[Double]] =
      df.select(Similarity.dotNative(col("a"), col("b")))
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(run() == Seq(Some(23.0), None, None))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(run() == Seq(Some(23.0), None, None))
    }
    val r = spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").collect()
    assert(math.abs(r(0).getDouble(0) - 11.0) < 1e-12)
  }

  test("TopKByScore.reduce keeps a sorted bounded buffer (binary insert)") {
    val agg = new TopKByScore(3)
    val xs = Seq((0.5, 1L), (0.9, 2L), (0.9, 1L), (0.1, 9L), (0.7, 5L), (0.9, 7L), (0.05, 4L))
    var b = agg.zero
    xs.foreach { case (s, id) => b = agg.reduce(b, ScoredPair(0L, id, s)) }
    assert(b.scores.toSeq == Seq(0.9, 0.9, 0.9) && b.ids.toSeq == Seq(1L, 2L, 7L))
    // merge of partial buffers agrees
    var b1 = agg.zero; var b2 = agg.zero
    xs.take(3).foreach { case (s, id) => b1 = agg.reduce(b1, ScoredPair(0L, id, s)) }
    xs.drop(3).foreach { case (s, id) => b2 = agg.reduce(b2, ScoredPair(0L, id, s)) }
    val m = agg.merge(b1, b2)
    assert(m.scores.toSeq == b.scores.toSeq && m.ids.toSeq == b.ids.toSeq)
  }

  test("poly_fingerprint: known values, nulls, codegen/interpreted parity, SQL-callable") {
    GraftExtensions.register(spark)
    // value pinned against the DuckDB list_reduce form: 'hello' -> 99162322
    assert(graft.plans.PolyFingerprint.hash("hello") == 99162322L)
    assert(graft.plans.PolyFingerprint.hash("") == 0L)
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq(Some("hello"), Some(""), None).toDF("t")
    def run(): Seq[Option[Long]] =
      df.select(call_function("poly_fingerprint", col("t")))
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(run() == Seq(Some(99162322L), Some(0L), None))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(run() == Seq(Some(99162322L), Some(0L), None))
    }
    val r = spark.sql("SELECT poly_fingerprint('hello') AS fp").collect()
    assert(r(0).getLong(0) == 99162322L)
  }

  test("cosine_similarity is SQL-callable after extension registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(1.0D, 0.0D), array(0.5D, 0.0D)) AS c").collect()
    assert(math.abs(r(0).getDouble(0) - 1.0) < 1e-12)
  }

  test("TopKByScore aggregator matches the window row_number formulation") {
    val sparkS = spark
    import sparkS.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = (for {
      q <- 0L until 5L
      n <- 0L until 50L
    } yield ScoredPair(q, n, math.round(rnd.nextDouble() * 1e4) / 1e4)).toSeq
    val df = pairs.toDF()
    val agg = TopKByScore.topKPerQuery(df, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    val win = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(agg == win)
  }

  test("x08b agg formulation returns the same rows as the window formulation") {
    val a = Similarity.x08AnnMultiQuery(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val b = Similarity.x08bAnnTopKAgg(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(a == b)
  }

  test("pq_encode: codegen and interpreted paths agree on random vectors; edge cases null") {
    GraftExtensions.register(spark)
    val sparkS = spark
    import sparkS.implicits._
    val rng = new scala.util.Random(7)
    val m = 4; val k = 8; val dsub = 4
    val cb: graft.functions.Pq.Codebook =
      Array.fill(m, k, dsub)(rng.nextDouble() * 2 - 1)
    val cbCol = typedlit(cb.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq)
    val good = (0 until 50).map(_ => Some(Array.fill(m * dsub)(rng.nextFloat() * 2 - 1)))
    val df = (good :+ Some(Array.fill(3)(0.5f)) :+ None) // bad length, null
      .toDF("emb")
    def run(): Seq[Option[Seq[Int]]] =
      df.select(call_function("pq_encode", col("emb"), cbCol)).collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getSeq[Int](0).toList)).toSeq
    val gen = run()
    assert(gen.take(50).forall(_.exists(c => c.length == m && c.forall(i => i >= 0 && i < k))))
    assert(gen(50).isEmpty && gen(51).isEmpty, "bad length / null input must be null")
    val interp = withSQLConfV("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")(run())
    assert(gen == interp, "codegen and interpreted encodings must be identical")
  }

  private def withSQLConfV[A](pairs: (String, String)*)(f: => A): A = {
    val old = pairs.map { case (key, _) => key -> spark.conf.getOption(key) }
    pairs.foreach { case (key, v) => spark.conf.set(key, v) }
    try f finally old.foreach {
      case (key, Some(v)) => spark.conf.set(key, v)
      case (key, None)    => spark.conf.unset(key)
    }
  }

  test("cdc_chunks: boundaries match a naive per-window refold on random strings") {
    import org.scalacheck.{Gen, Prop}
    import graft.plans.{CdcBoundaries, PolyFingerprint}
    def naive(s: String): Seq[Int] = {
      val w = CdcBoundaries.W
      val mask = (1 << CdcBoundaries.MaskBits) - 1
      val bs = (w to s.length).filter { i =>
        var h = 0L
        for (j <- i - w until i) h = (h * 31 + s.charAt(j)) % PolyFingerprint.P
        (h & mask) == 0
      }
      if (bs.isEmpty || bs.last != s.length) bs :+ s.length else bs
    }
    checkProp(Prop.forAll(Gen.chooseNum(0, 200).flatMap(n =>
      Gen.stringOfN(n, Gen.alphaNumChar))) { s =>
      CdcBoundaries.boundaries(s).toIntArray().toSeq == naive(s)
    }, min = 50)
  }

  test("cdc_chunks: an early insertion leaves downstream chunk fingerprints intact") {
    val base = scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .alphanumeric.take(4000).mkString
    val edited = base.substring(0, 5) + "XYZQW" + base.substring(5)
    def chunkFps(s: String): Seq[Long] = {
      val bs = graft.plans.CdcBoundaries.boundaries(s).toIntArray()
      (0 +: bs.toSeq.dropRight(1)).zip(bs.toSeq)
        .map { case (a, b) => graft.plans.PolyFingerprint.hash(s.substring(a, b)) }
    }
    val (fb, fe) = (chunkFps(base), chunkFps(edited))
    // all but the first few chunks realign despite every byte offset moving
    val shared = fb.toSet.intersect(fe.toSet).size
    assert(shared >= fb.size - 3,
      s"expected near-total chunk realignment, shared $shared of ${fb.size}")
    // and a fixed-size chunking of the same edit would realign ~nothing:
    def fixedFps(s: String) = s.grouped(64).map(graft.plans.PolyFingerprint.hash).toSeq
    val fixedShared = fixedFps(base).toSet.intersect(fixedFps(edited).toSet).size
    assert(fixedShared <= 2, s"fixed-size chunking unexpectedly stable: $fixedShared")
  }
}
