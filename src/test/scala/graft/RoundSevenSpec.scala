package graft

import org.apache.spark.sql.functions._
import graft.functions.{Corpus, Knn, Sampling, Search}
import graft.queries.Relational

/** Invariant spot-checks for the round-7 operators (the DuckDB hash-match
  * is the driver's t2 gate; these keep `sbt test` meaningful offline). */
class RoundSevenSpec extends SparkSpec {

  test("d40: quartiles are 1..4 and balanced within every priority") {
    val df = Relational.d40Ntile(spark, sf0001)
    assert(df.count() == Tables.orders(spark, sf0001).count())
    val byP = df.groupBy("o_orderpriority", "quartile").count().collect()
      .groupBy(_.getString(0))
    byP.foreach { case (p, rows) =>
      assert(rows.map(_.getInt(1)).toSet == Set(1, 2, 3, 4), s"priority $p")
      val counts = rows.map(_.getLong(2))
      assert(counts.max - counts.min <= 1, s"priority $p unbalanced: ${counts.toSeq}")
    }
  }

  test("x45: one prediction per query, vote counts within k, labels from the pool") {
    val rows = Knn.x45KnnLabel(spark, sf0001).collect()
    val nq = Tables.embeddings(spark, sf0001).filter(col("vec_id") < 20).count()
    assert(rows.length == nq)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    assert(rows.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= Knn.K))
    val poolLabels = Tables.embeddings(spark, sf0001).filter(col("vec_id") >= 20)
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    assert(rows.forall(r => poolLabels.contains(r.getInt(1))))
  }

  test("x45: majority vote matches a driver-side exact kNN recompute") {
    val all = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
      while (i < a.length) { ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1 }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pool = all.filter(_._1 >= 20)
    val want = all.filter(_._1 < 20).map { case (qid, qv, _) =>
      val top = pool.sortBy { case (id, v, _) => (-r4(cos(v, qv)), id) }.take(Knn.K)
      val votes = top.groupBy(_._3).view.mapValues(_.length).toMap
      val best = votes.toSeq.minBy { case (l, n) => (-n, l) }
      qid -> (best._1, best._2.toLong)
    }.toMap
    Knn.x45KnnLabel(spark, sf0001).collect().foreach { r =>
      assert(want(r.getLong(0)) == ((r.getInt(1), r.getLong(2))), s"query ${r.getLong(0)}")
    }
  }

  test("x46: kept docs are a budget-bounded rank prefix per source") {
    val rows = Sampling.x46TokenBudgetMix(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val byRn = rs.sortBy(_.getInt(1))
      assert(byRn.map(_.getInt(1)).toSeq == (1 to rs.length), s"$src rank gap")
      byRn.foreach { r =>
        assert(r.getLong(4) < Sampling.TokenBudget, s"$src doc ${r.getLong(2)} over budget")
      }
      // cum_before is exactly the running sum of the kept prefix
      val cums = byRn.scanLeft(0L)(_ + _.getLong(3)).init
      assert(byRn.map(_.getLong(4)).toSeq == cums.toSeq, s"$src running sum drifts")
    }
  }

  test("x47: at most k keywords per doc, scores descending, terms from the doc") {
    val rows = Search.x47TfidfTopK(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rs) =>
      assert(rs.length <= Search.TfidfTopK, s"doc $doc")
      val ordered = rs.sortBy(_.getInt(1))
      val scores = ordered.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, s"doc $doc")
    }
    val toks = Tables.documents(spark, sf0001)
      .select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    rows.foreach(r => assert(toks(r.getLong(0)).contains(r.getString(2))))
  }

  test("x48: audit covers exactly the test split and flags are consistent") {
    val rows = Sampling.x48SplitLeakage(spark, sf0001).collect()
    val testDocs = Sampling.x19HashSplit(spark, sf0001)
      .filter(col("split") === "test").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet == testDocs)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0)
      assert(r.getBoolean(2) == (r.getLong(1) >= 1))
    }
  }

  test("d41: forward as-of mirrors d29 — every match is the earliest click at-or-after") {
    val rows = Relational.d41ForwardAsof(spark, sf0001).collect()
    val purchases = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase").count()
    assert(rows.length == purchases)
    // recompute on the driver: next click at-or-after each purchase
    val clicks = Tables.events(spark, sf0001).filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val byUser = clicks.groupBy(_._1)
    val p = Tables.events(spark, sf0001).filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val want = p.map { case (u, ts, eid) =>
      val nxt = byUser.getOrElse(u, Array.empty).filter(_._2 >= ts)
      eid -> (if (nxt.isEmpty) None
              else Some(nxt.minBy(c => (c._2, c._3))._3))
    }.toMap
    rows.foreach { r =>
      val got = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(got == want(r.getLong(1)), s"purchase ${r.getLong(1)}")
    }
  }

  test("x50: tiers are 1..10 per language and ordered by the quality signal") {
    val rows = graft.functions.Text.x50QualityTiers(spark, sf0001).collect()
    assert(rows.length == Tables.documents(spark, sf0001).count())
    rows.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      assert(rs.map(_.getInt(3)).min == 1, lang)
      // better-quality (higher stop_r) docs never land in a worse tier
      val sorted = rs.filter(!_.isNullAt(2))
        .sortBy(r => (-r.getDouble(2), r.getLong(0)))
      val tiers = sorted.map(_.getInt(3))
      assert(tiers.zip(tiers.tail).forall { case (a, b) => a <= b }, lang)
    }
  }

  test("x51: PageRank mass is conserved and matches a driver-side power iteration") {
    val got = graft.functions.GraphOps.x51DupPagerank(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pairs = graft.functions.Dedup.x10EmbeddingNearDups(spark, sf0001)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1))).distinct
    val nodes = edges.map(_._1).distinct.sorted
    assert(got.keySet == nodes.toSet)
    val n = nodes.length
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var rank = nodes.map(_ -> 1.0 / n).toMap
    (0 until graft.functions.GraphOps.PrIters).foreach { _ =>
      val inflow = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / deg(s) }.sum).toMap
      rank = nodes.map(v =>
        v -> ((1 - graft.functions.GraphOps.Damping) / n +
          graft.functions.GraphOps.Damping * inflow.getOrElse(v, 0.0))).toMap
    }
    nodes.foreach { v =>
      assert(math.abs(got(v) - rank(v)) < 1e-3, s"node $v: ${got(v)} vs ${rank(v)}")
    }
    // total rank stays ~1 (no dangling mass in this graph)
    assert(math.abs(got.values.sum - 1.0) < 0.01)
  }

  test("x52: no verified near-dup pair ever straddles a split boundary") {
    val split = graft.functions.Dedup.x52ClusterSplit(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(split.size == Tables.documents(spark, sf0001).count())
    val pairs = graft.functions.Dedup.x16VerifiedNearDups(spark, sf0001)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain verified near-dups")
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"pair ($a, $b) straddles ${split(a)}/${split(b)}")
    }
    // the naive doc-id split DOES straddle (x52 is a real fix, not vacuous)
    val naive = graft.functions.Sampling.x19HashSplit(spark, sf0001)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pairs.exists { case (a, b) => naive(a) != naive(b) },
      "fixture pairs all co-split under the naive rule — invariant is vacuous")
  }

  test("x53: source overlap matrix is complete and matches a signature recompute") {
    val rows = graft.functions.Dedup.x53SourceOverlap(spark, sf0001).collect()
    val sources = Tables.documents(spark, sf0001)
      .select("source").distinct().count().toInt
    assert(rows.length == sources * (sources - 1) / 2)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= graft.functions.Dedup.NumBands)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // recompute the band matches from the doc-level signature relation
    val sig = graft.functions.Dedup.x05MinhashSignatures(spark, sf0001)
      .join(Tables.documents(spark, sf0001).select("doc_id", "source"), "doc_id")
      .select("source", "band", "min_hash").collect()
      .groupBy(r => (r.getString(0), r.getInt(1)))
      .view.mapValues(_.map(_.getString(2)).min).toMap
    rows.foreach { r =>
      val (s1, s2) = (r.getString(0), r.getString(1))
      val want = (0 until graft.functions.Dedup.NumBands).count { b =>
        (sig.get((s1, b)), sig.get((s2, b))) match {
          case (Some(x), Some(y)) => x == y
          case _ => false
        }
      }
      assert(r.getLong(2) == want, s"($s1, $s2)")
    }
  }

  test("x54: span removal matches a driver-side recompute of the Lee-style rule") {
    val rows = graft.functions.Corpus.x54SpanRemoval(spark, sf0001).collect()
    assert(rows.length == Tables.documents(spark, sf0001).count())
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val grams = docs.toSeq.flatMap { case (id, t) =>
      (0 to t.length - 5).map(i => (t.slice(i, i + 5).mkString(" "), id, i))
    }
    val repeated = grams.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
    val want = docs.map { case (id, t) =>
      val covered = (0 to t.length - 5)
        .filter(i => repeated(t.slice(i, i + 5).mkString(" ")))
        .flatMap(i => i until i + 5).toSet
      id -> t.zipWithIndex.collect { case (tok, i) if !covered(i) => tok }.mkString(" ")
    }
    var removedTotal = 0L
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(3) == want(id), s"doc $id rewrite differs")
      assert(r.getLong(1) == docs(id).length)
      removedTotal += r.getLong(2)
    }
    assert(removedTotal > 0, "fixture must contain removable cross-doc spans")
    // short docs are never touched
    rows.filter(r => docs(r.getLong(0)).length < 5)
      .foreach(r => assert(r.getLong(2) == 0L))
  }

  test("x56: window tiling covers every token with the declared overlap") {
    val rows = graft.functions.Sampling.x56ContextWindows(spark, sf0001).collect()
    val toks = Tables.documents(spark, sf0001)
      .select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).length).toMap
    val (w, s) = (graft.functions.Sampling.WinTokens, graft.functions.Sampling.WinStride)
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val n = toks(doc)
      val expect = 1 + math.max(0, (math.max(n - w, 0) + s - 1) / s)
      assert(rs.length == expect, s"doc $doc: ${rs.length} windows for $n tokens")
      val byNo = rs.sortBy(_.getInt(1))
      assert(byNo.map(_.getInt(1)).toSeq == (0 until rs.length), s"doc $doc numbering")
      byNo.foreach { r =>
        assert(r.getLong(2) == r.getInt(1).toLong * s)
        assert(r.getInt(3) == math.min(w, n - r.getInt(1) * s), s"doc $doc window ${r.getInt(1)}")
      }
      // last window reaches the end of the doc: full coverage
      val last = byNo.last
      assert(last.getLong(2) + last.getInt(3) == n, s"doc $doc tail uncovered")
    }
    // only token-bearing docs produce windows
    assert(rows.map(_.getLong(0)).toSet == toks.filter(_._2 > 0).keySet)
  }

  test("x57: the kept copy always comes from the most-preferred source present") {
    val rows = graft.functions.Dedup.x57PriorityDedup(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"),
        graft.functions.Text.fingerprint(col("text")).as("fp")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def prio(s: String): Int = s match { case "src1" => 0; case "src0" => 1; case _ => 2 }
    val byFp = docs.groupBy(_._3)
    assert(rows.length == byFp.size)
    rows.foreach { r =>
      val members = byFp(r.getString(0))
      assert(r.getLong(1) == members.length)
      val want = members.minBy { case (id, src, _) => (prio(src), id) }
      assert(r.getLong(2) == want._1 && r.getString(3) == want._2, s"fp ${r.getString(0)}")
    }
    // the corpus fixture's dup groups are same-source, so exercise the
    // preference on a constructed corpus: the preferred source's copy has
    // the LARGER doc_id and must still win (plain min-id dedup would not)
    val sparkS = spark
    import sparkS.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_prio").toString
    Seq(
      (10L, "same text here", "en", "src0", 14L),
      (20L, "same text here", "en", "src1", 14L),
      (30L, "other text entirely", "en", "src0", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kept = graft.functions.Dedup.x57PriorityDedup(spark, dir).collect()
      .map(r => r.getLong(2) -> r.getString(3)).toMap
    assert(kept.contains(20L) && kept(20L) == "src1",
      "preferred-source copy must beat the lower doc_id")
    assert(kept.contains(30L))
  }

  test("x58: shards tile the corpus, positions are contiguous, and the shuffle is rerun-stable") {
    val df = Sampling.x58CorpusShuffle(spark, sf0001)
    val rows = df.collect()
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(rows.length == nDocs)
    assert(rows.map(_.getLong(2)).distinct.length == nDocs, "every doc exactly once")
    rows.groupBy(_.getInt(0)).foreach { case (shard, members) =>
      assert(members.map(_.getInt(1)).sorted.toSeq == (1 to members.length),
        s"shard $shard positions not contiguous")
      // within a shard, position order IS order_key order (ties by doc_id)
      val byPos = members.sortBy(_.getInt(1)).map(r => (r.getString(3), r.getLong(2)))
      assert(byPos.toSeq == byPos.sortBy(identity).toSeq, s"shard $shard order")
    }
    // deterministic: a second run yields byte-identical assignments…
    assert(Sampling.x58CorpusShuffle(spark, sf0001).collect().toSeq == rows.toSeq)
    // …and a different seed yields a different permutation of the same docs
    val other = Sampling.x58CorpusShuffle(spark, sf0001, seed = "other").collect()
    assert(other.map(_.getLong(2)).toSet == rows.map(_.getLong(2)).toSet)
    assert(other.map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
      != rows.map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq)
  }

  test("x59: every batch doc is classified and dup_of always points at the kept copy") {
    val batchSrc = "src19"
    val rows = graft.functions.Dedup.x59IncrementalDedup(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"),
        graft.functions.Text.fingerprint(col("text")).as("fp")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val corpusMin = docs.filter(_._2 != batchSrc).groupBy(_._3)
      .map { case (fp, ms) => fp -> ms.map(_._1).min }
    val batch = docs.filter(_._2 == batchSrc)
    val batchMin = batch.groupBy(_._3).map { case (fp, ms) => fp -> ms.map(_._1).min }
    assert(rows.length == batch.length)
    rows.foreach { r =>
      val (id, fp, status) = (r.getLong(0), r.getString(1), r.getString(2))
      val dupOf = if (r.isNullAt(3)) None else Some(r.getLong(3))
      (corpusMin.get(fp), batchMin(fp)) match {
        case (Some(c), _)           => assert(status == "dup_of_corpus" && dupOf.contains(c), s"doc $id")
        case (None, m) if m != id   => assert(status == "dup_in_batch" && dupOf.contains(m), s"doc $id")
        case _                      => assert(status == "new" && dupOf.isEmpty, s"doc $id")
      }
    }
    // constructed fixture: corpus copy wins even with the HIGHER doc_id,
    // and in-batch dups chain to the batch minimum
    val sparkS = spark
    import sparkS.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_incr").toString
    Seq(
      (50L, "shared with corpus", "en", "src0", 18L),
      (10L, "shared with corpus", "en", "src19", 18L),
      (60L, "batch only text", "en", "src19", 15L),
      (70L, "batch only text", "en", "src19", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.functions.Dedup.x59IncrementalDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got(10L) == ("dup_of_corpus", 50L), "corpus copy must win despite higher id")
    assert(got(60L) == ("new", -1L))
    assert(got(70L) == ("dup_in_batch", 60L))
  }

  test("x60: kept band matches a local percent_rank recompute per language") {
    val rows = Sampling.x60LengthOutliers(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.length == docs.length)
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (_, ms) =>
      val sorted = ms.sortBy(m => (m._3, m._1))
      val n = sorted.length
      sorted.zipWithIndex.map { case (m, i) =>
        val pct = if (n == 1) 0.0 else i.toDouble / (n - 1)
        m._1 -> (pct >= 0.05 && pct <= 0.95)
      }
    }.toMap
    rows.foreach { r =>
      assert(r.getBoolean(4) == expected(r.getLong(0)), s"doc ${r.getLong(0)}")
    }
    // the trim keeps a strict majority but not everything, per language
    rows.groupBy(_.getString(1)).foreach { case (lang, ms) =>
      val kept = ms.count(_.getBoolean(4))
      assert(kept < ms.length && kept > ms.length / 2, s"lang $lang kept $kept/${ms.length}")
    }
  }

  test("x62: every batch doc screened; matches agree with the x16 pair set restricted across sources") {
    val batchSrc = "src19"
    val rows = graft.functions.Dedup.x62IncrementalNearDup(spark, sf0001).collect()
    val srcOf = Tables.documents(spark, sf0001).select(col("doc_id"), col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == srcOf.values.count(_ == batchSrc))
    rows.foreach { r =>
      if (r.getLong(1) == 0) assert(r.isNullAt(2) && r.isNullAt(3), s"doc ${r.getLong(0)}")
      else {
        assert(r.getDouble(2) >= 0.5 && r.getDouble(2) <= 1.0)
        assert(srcOf(r.getLong(3)) != batchSrc, "best match must come from the corpus side")
      }
    }
    // the screen must agree with the full x16 verified pair set wherever a
    // pair crosses the batch/corpus boundary (x16 is symmetric and
    // uncapped-by-side, so restrict it the same way)
    val x16pairs = graft.functions.Dedup.x16VerifiedNearDups(spark, sf0001).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .filter { case (a, b) => srcOf(a) == batchSrc && srcOf(b) != batchSrc }
    val expected = x16pairs.groupBy(_._1).view.mapValues(_.length).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == expected.getOrElse(r.getLong(0), 0),
        s"doc ${r.getLong(0)} match count")
    }
  }

  test("x61: slope is negative and matches a driver-side recompute of the fit") {
    val r = graft.functions.Stats.x61ZipfFit(spark, sf0001).collect()(0)
    assert(r.getDouble(1) < 0.0, "term frequencies must decay with rank")
    // recompute the same closed form from the raw term counts
    val counts = Tables.documents(spark, sf0001)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("term"))
      .groupBy("term").count().collect()
      .map(row => (row.getString(0), row.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }.take(1000)
    val xy = counts.zipWithIndex.map { case ((_, c), i) =>
      (math.log(i + 1.0), math.log(c.toDouble)) }
    val (n, sx, sy) = (xy.length.toDouble, xy.map(_._1).sum, xy.map(_._2).sum)
    val sxx = xy.map(p => p._1 * p._1).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(r.getLong(0) == xy.length)
    assert(math.abs(r.getDouble(1) - slope) < 1e-3, s"slope ${r.getDouble(1)} vs $slope")
    assert(math.abs(r.getDouble(2) - (sy - slope * sx) / n) < 1e-3)
  }

  test("x76: calibration ties out against the x06 candidate set and is monotone at the extremes") {
    val rows = graft.functions.Dedup.x76MinhashCalibration(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= 1 && r.getLong(0) <= 8, "agreement is 1..8 bands")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
    // every LSH candidate pair is calibrated exactly once
    val nCands = graft.functions.Dedup.x06NearDupPairs(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == nCands)
    // the estimate is informative: low-agreement pairs are far less similar
    // than high-agreement pairs
    val lo = rows.filter(_.getLong(0) <= 2)
    val hi = rows.filter(_.getLong(0) >= 7)
    assert(lo.nonEmpty && hi.nonEmpty, "fixture covers both tails")
    val wavg = (rs: Array[org.apache.spark.sql.Row]) =>
      rs.map(r => r.getDouble(2) * r.getLong(1)).sum / rs.map(_.getLong(1)).sum
    assert(wavg(lo) < 0.2 && wavg(hi) > 0.8, s"${wavg(lo)} vs ${wavg(hi)}")
  }

  test("x75: the when-chain ring assignment equals a naive first-node-at-or-after search") {
    val sparkS = spark
    import sparkS.implicits._
    for (n <- Seq(3, 8, 10)) {
      val nodes = Sampling.ringNodes(n)
      def naive(p: Int): Int =
        nodes.filter(_._1 >= p).sortBy(_._1).headOption
          .getOrElse(nodes.minBy(_._1))._2
      // all node points, their neighbours (wrap edges), and a spread of others
      val probes = (nodes.flatMap { case (pt, _) => Seq(pt - 1, pt, pt + 1) } ++
        (0 to 65535 by 977) :+ 0 :+ 65535).filter(p => p >= 0 && p <= 65535).distinct
      val got = probes.toDF("p")
        .select(col("p"), Sampling.ringAssign(col("p"), nodes).as("shard"))
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      probes.foreach(p => assert(got(p) == naive(p), s"n=$n p=$p"))
    }
  }

  test("x75: ring resharding moves far fewer docs than mod, near the (to-from)/to theory") {
    val rows = Sampling.x75ReshardPlan(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val n = Tables.documents(spark, sf0001).count()
    assert(rows("mod")._1 == n && rows("ring")._1 == n)
    val (modFrac, ringFrac) = (rows("mod")._3, rows("ring")._3)
    assert(ringFrac < modFrac / 2,
      s"ring ($ringFrac) must move far less than mod ($modFrac)")
    // mod theory: a doc stays only if p mod 40 lands in the coincidence set
    assert(modFrac > 0.6 && modFrac < 1.0)
    // ring theory: the two new nodes claim roughly their arc share
    assert(ringFrac > 0.02 && ringFrac < 0.4)
  }

  test("x74: negatives are deterministic, never self, never a near-dup") {
    val rows = Sampling.x74NegativeSamples(spark, sf0001).collect()
    val nDocs = Tables.documents(spark, sf0001).count()
    // nearly every (doc, j) finds a partner at this corpus/bucket ratio
    assert(rows.length >= (nDocs * 3 * 9) / 10, s"${rows.length} of ${nDocs * 3}")
    rows.foreach { r =>
      assert(r.getLong(2) != r.getLong(0), "negative must not be the doc itself")
    }
    // no emitted pair is a verified near-dup, in either orientation
    val dup = graft.functions.Dedup.x16VerifiedNearDups(spark, sf0001).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSet
    rows.foreach { r =>
      assert(!dup.contains((r.getLong(0), r.getLong(2))), s"near-dup leaked: $r")
    }
    // rerun-stable
    assert(Sampling.x74NegativeSamples(spark, sf0001).collect().toSeq == rows.toSeq)
  }

  test("x73: hashed vectors recompute exactly and norms/counts tie out") {
    val rows = graft.functions.Search.x73HashedFeatures(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    assert(rows.length == docs.length)
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(term: String): Int = {
      val hex = md.synchronized {
        md.reset(); md.digest(term.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
      Integer.parseInt(hex.substring(0, 4), 16) % 64
    }
    val byId = docs.toMap
    rows.foreach { r =>
      val toks = byId(r.getLong(0)).toLowerCase.split("\\s+").filter(_.nonEmpty)
      val vec = Array.fill(64)(0L)
      toks.foreach(t => vec(bucket(t)) += 1)
      assert(r.getLong(1) == toks.length, s"doc ${r.getLong(0)} token count")
      assert(r.getLong(2) == vec.map(v => v * v).sum, s"doc ${r.getLong(0)} norm")
      assert(r.getString(3) == vec.mkString(","), s"doc ${r.getLong(0)} vector")
    }
  }

  test("x72: drift matches a driver-side CDF recompute and bounds hold") {
    val rows = graft.functions.Curation.x72ScoreCalibration(spark, sf0001).collect()
    val stop = Set("the", "a", "and", "of", "to", "in")
    val docs = Tables.documents(spark, sf0001).select(col("source"), col("text"))
      .collect().map { r =>
        val toks = Option(r.getString(1)).getOrElse("")
          .toLowerCase.split("\\s+").filter(_.nonEmpty)
        val sc = if (toks.isEmpty) 0.0
          else BigDecimal(toks.count(stop) .toDouble / toks.length)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (r.getString(0), sc)
      }
    val n = docs.length.toDouble
    def cdfLess(xs: Array[Double], v: Double): Double = xs.count(_ < v)
    val globalScores = docs.map(_._2)
    rows.foreach { r =>
      val mine = docs.filter(_._1 == r.getString(0)).map(_._2)
      assert(r.getLong(1) == mine.length)
      val drift = mine.map(v =>
        math.abs(cdfLess(mine, v) / mine.length - cdfLess(globalScores, v) / n))
        .sum / mine.length
      assert(math.abs(r.getDouble(2) - drift) < 1e-3, s"source ${r.getString(0)}")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(math.abs(r.getDouble(3)) <= r.getDouble(2) + 1e-9, "bias bounded by drift")
    }
  }

  test("x71: pipeline survivors are gated, unique per fingerprint AND per cluster, split leakage-free") {
    val rows = graft.functions.Curation.x71PretrainPipeline(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) >= 30), "quality gate")
    assert(rows.map(_.getLong(3)).distinct.length == rows.length,
      "one survivor per cluster key")
    // no two survivors share a fingerprint
    val fps = Tables.documents(spark, sf0001)
      .select(col("doc_id"), graft.functions.Text.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val survivorFps = rows.map(r => fps(r.getLong(0)))
    assert(survivorFps.distinct.length == survivorFps.length)
    // leakage-free: a survivor's near-dup cluster members would all land in
    // the survivor's split (x52's property, keyed on the cluster). The
    // cluster layer runs over the exact-dedup survivors, so the expectation
    // is the survivor-form CC, via the same public overload the pipeline
    // composes from.
    val survivorDocs = Tables.documents(spark, sf0001)
      .filter(coalesce(size(graft.functions.Text.tokens(col("text"))), lit(0)) >= 30)
      .withColumn("fp", graft.functions.Text.fingerprint(col("text")))
      .withColumn("keep",
        min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .filter(col("doc_id") === col("keep"))
      .select(col("doc_id"), col("text"))
    val clusterOf = graft.functions.Dedup
      .x26DupClustersOf(spark, survivorDocs, sf0001 + "|x71spec").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val ck = clusterOf.getOrElse(r.getLong(0), r.getLong(0))
      assert(r.getLong(3) == ck, s"doc ${r.getLong(0)} cluster key")
    }
    // strictly fewer survivors than gated docs (dedup really removed some)
    val gated = Tables.documents(spark, sf0001)
      .filter(coalesce(size(graft.functions.Text.tokens(col("text"))), lit(0)) >= 30)
      .count()
    assert(rows.length < gated, s"${rows.length} survivors of $gated gated docs")
  }

  test("x70: log-odds match a driver-side recompute; every source gets its top-5") {
    val rows = graft.functions.Text.x70DistinctiveTerms(spark, sf0001).collect()
    val toks = Tables.documents(spark, sf0001).select(col("source"), col("text"))
      .collect().flatMap { r =>
        Option(r.getString(1)).getOrElse("").toLowerCase
          .split("\\s+").filter(_.nonEmpty).map(r.getString(0) -> _)
      }
    val c = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cw = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val ns = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n = toks.length.toDouble
    rows.foreach { r =>
      val (src, term) = (r.getString(0), r.getString(2))
      val cc = c((src, term)).toDouble
      assert(r.getLong(3) == cc && cc >= 5)
      val rest = cw(term) - cc
      val lo = math.log((cc + 1.0) / (ns(src) - cc + 1.0)) -
        math.log((rest + 1.0) / (n - ns(src) - rest + 1.0))
      assert(math.abs(r.getDouble(4) - lo) < 1e-3, s"($src, $term)")
    }
    val bySrc = rows.groupBy(_.getString(0))
    assert(bySrc.keySet == ns.keySet, "every source represented")
    bySrc.foreach { case (src, ms) =>
      assert(ms.map(_.getInt(1)).sorted.toSeq == (1 to ms.length) && ms.length <= 5, src)
    }
  }

  test("x69: containment is asymmetric-correct and catches an embedded doc Jaccard misses") {
    val rows = graft.functions.Dedup.x69ContainmentScreen(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(5) >= 0.9 && r.getDouble(5) <= 1.0)
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(2) <= r.getLong(4),
        "intersection bounded by both sides")
    }
    // constructed: a short doc embedded verbatim in a much longer one —
    // containment 1.0 for (short ⊆ long), while Jaccard (x16) would be
    // n_short/n_long, far below its 0.5 threshold
    val sparkS = spark
    import sparkS.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_contain").toString
    val short = (1 to 10).map(i => s"tok$i").mkString(" ")
    val long = short + " " + (11 to 60).map(i => s"tok$i").mkString(" ")
    Seq((1L, short, "en", "src0", short.length.toLong),
        (2L, long, "en", "src0", long.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.functions.Dedup.x69ContainmentScreen(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
    assert(got.get((1L, 2L)).contains(1.0), s"short-in-long must be full containment: $got")
    assert(!got.contains((2L, 1L)), "the long doc is not contained in the short one")
    val jac = graft.functions.Dedup.x16VerifiedNearDups(spark, dir).collect()
    assert(jac.isEmpty, "symmetric Jaccard misses the embedded doc at its threshold")
  }

  test("x68: self-repeat coverage matches a driver-side positional recompute") {
    val rows = Corpus.x68SelfRepetition(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    assert(rows.length == docs.length)
    val byId = docs.toMap
    rows.foreach { r =>
      val toks = byId(r.getLong(0)).toLowerCase.split("\\s+").filter(_.nonEmpty)
      assert(r.getLong(1) == toks.length)
      val grams = if (toks.length < 5) Array.empty[(Int, String)]
        else (0 to toks.length - 5).map(i => i -> toks.slice(i, i + 5).mkString(" ")).toArray
      val repeated = grams.groupBy(_._2).filter(_._2.length >= 2)
      val covered = repeated.values.flatten.flatMap { case (p, _) => p until p + 5 }.toSet
      assert(r.getLong(2) == covered.size, s"doc ${r.getLong(0)}")
      val frac = if (toks.isEmpty) 0.0 else covered.size.toDouble / toks.length
      assert(math.abs(r.getDouble(3) - frac) < 1e-3)
    }
    // sf0.001 has no intra-doc 5-gram repeats (parity above is the real
    // check); exercise the positive path on constructed looped boilerplate
    val sparkS = spark
    import sparkS.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_selfrep").toString
    Seq(
      (1L, "alpha beta gamma delta epsilon alpha beta gamma delta epsilon", "en", "src0", 60L),
      (2L, "one two three four five six seven eight nine ten", "en", "src0", 49L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Corpus.x68SelfRepetition(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // doc 1: the 5-gram "alpha beta gamma delta epsilon" occurs at pos 0
    // and 5, covering every position -> full coverage; doc 2: none
    assert(got(1L) == ((10L, 1.0)), s"looped doc: ${got(1L)}")
    assert(got(2L) == ((0L, 0.0)))
  }

  test("x67: PMI values match a driver-side recompute and ranking is by PMI") {
    val rows = Corpus.x67PmiCollocations(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    val toks = Tables.documents(spark, sf0001).select(col("text")).collect()
      .flatMap(r => Option(r.getString(0)))
      .map(_.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
    val pairs = toks.flatMap(t => if (t.length < 2) Nil else t.sliding(2).map(_.mkString(" ")))
    val c12 = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = pairs.groupBy(_.split(" ")(0)).view.mapValues(_.length.toLong).toMap
    val c2 = pairs.groupBy(_.split(" ")(1)).view.mapValues(_.length.toLong).toMap
    val n = pairs.length.toDouble
    rows.foreach { r =>
      val g = r.getString(0); val Array(w1, w2) = g.split(" ")
      assert(r.getLong(1) == c12(g) && r.getLong(1) >= 5)
      assert(r.getLong(2) == c1(w1) && r.getLong(3) == c2(w2))
      val pmi = math.log(c12(g) * n / (c1(w1).toDouble * c2(w2).toDouble))
      assert(math.abs(r.getDouble(4) - pmi) < 1e-3, s"gram '$g'")
    }
    // ranked descending, and the heap kept the global best: no qualifying
    // pair outside the result has a strictly higher PMI than the last kept
    val kept = rows.sortBy(_.getInt(5)).map(_.getDouble(4))
    assert(kept.sameElements(kept.sortBy(-(_: Double))))
    if (rows.length == 100) {
      val floor = kept.last
      val better = c12.count { case (g, c) =>
        c >= 5 && math.log(c * n / (c1(g.split(" ")(0)).toDouble * c2(g.split(" ")(1)).toDouble)) > floor + 1e-9 }
      assert(better <= rows.length, "heap must keep the global top")
    }
  }

  test("d42: cohort matrix is triangular and day-0 counts equal cohort sizes") {
    val rows = Relational.d42RetentionCohorts(spark, sf0001).collect()
    val users = Tables.events(spark, sf0001)
      .select(col("user_id"), to_date(col("ts")).as("day")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val firstDay = users.groupBy(_._1).view.mapValues(_.map(_._2).min(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))).toMap
    // day_offset 0 row of each cohort counts exactly the cohort's users
    val cohortSize = firstDay.groupBy(_._2).view.mapValues(_.size).toMap
    rows.filter(_.getInt(1) == 0).foreach { r =>
      assert(r.getLong(2) == cohortSize(r.getDate(0).toLocalDate), s"cohort ${r.getDate(0)}")
    }
    assert(rows.forall(_.getInt(1) >= 0), "offsets never negative")
    // total cell mass = distinct (user, day) pairs
    assert(rows.map(_.getLong(2)).sum == users.distinct.length)
  }

  test("x66: histogram tiles the corpus, buckets bound their members, CDF ends at 1") {
    val rows = Sampling.x66LengthHistogram(spark, sf0001).collect()
    val toks = Tables.documents(spark, sf0001)
      .select(coalesce(size(graft.functions.Text.tokens(col("text"))), lit(0)).as("n"))
      .collect().map(_.getInt(0))
    assert(rows.map(_.getLong(3)).sum == toks.length)
    assert(rows.map(_.getLong(4)).sum == toks.map(_.toLong).sum)
    rows.foreach { r =>
      val (b, lo, hi) = (r.getInt(0), r.getLong(1), r.getLong(2))
      if (b == 0) assert(lo == 0 && hi == 0)
      else {
        assert(lo == (1L << (b - 1)) && hi == (1L << b) - 1)
        val members = toks.filter(n => n >= lo && n <= hi)
        assert(members.length == r.getLong(3), s"bucket $b")
      }
    }
    val last = rows.maxBy(_.getInt(0))
    assert(last.getDouble(6) == 1.0 && last.getDouble(7) == 1.0)
    // CDF is monotone
    val sorted = rows.sortBy(_.getInt(0))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getDouble(6) <= b.getDouble(6) && a.getDouble(7) <= b.getDouble(7))
      case _ =>
    }
  }

  test("x65: distances match a driver-side centroid recompute; ~5% flagged per label") {
    val rows = graft.functions.Knn.x65LabelCentroids(spark, sf0001).collect()
    val embs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray))
    assert(rows.length == embs.length)
    val cents = embs.groupBy(_._2).view.mapValues { ms =>
      val dim = ms.head._3.length
      Array.tabulate(dim)(j => ms.map(_._3(j)).sum / ms.length)
    }.toMap
    val distOf = embs.map { case (id, l, v) =>
      id -> math.sqrt(v.zip(cents(l)).map { case (a, c) => (a - c) * (a - c) }.sum)
    }.toMap
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - distOf(r.getLong(0))) < 1e-3, s"vec ${r.getLong(0)}")
    }
    // within each label, roughly the top 5% by distance are flagged
    rows.groupBy(_.getInt(1)).foreach { case (l, ms) =>
      val flagged = ms.count(_.getBoolean(4))
      val expected = ms.length - math.ceil((ms.length - 1) * 0.95).toInt - 1
      assert(math.abs(flagged - expected) <= 1, s"label $l flagged $flagged vs ~$expected")
      // every flagged distance >= every unflagged distance (rank property)
      val minFlagged = ms.filter(_.getBoolean(4)).map(_.getDouble(2))
      val maxKept = ms.filterNot(_.getBoolean(4)).map(_.getDouble(2))
      if (minFlagged.nonEmpty && maxKept.nonEmpty)
        assert(minFlagged.min >= maxKept.max - 1e-4, s"label $l ordering")
    }
  }

  test("x64: report card totals tie out against the corpus and x01's dup groups") {
    val rows = graft.functions.Curation.x64SourceReport(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001)
      .select(col("source"), col("lang"),
        graft.functions.Text.fingerprint(col("text")).as("fp")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.map(_.getString(0)).toSeq == docs.map(_._1).distinct.sorted.toSeq)
    assert(rows.map(_.getLong(1)).sum == docs.length, "every doc in exactly one source row")
    val groupSize = docs.groupBy(_._3).view.mapValues(_.length).toMap
    rows.foreach { r =>
      val mine = docs.filter(_._1 == r.getString(0))
      val nDup = mine.count(d => groupSize(d._3) > 1)
      assert(r.getLong(2) == nDup, s"source ${r.getString(0)} dup count")
      assert(r.getLong(6) == mine.map(_._2).distinct.length)
      val modal = mine.groupBy(_._2).view.mapValues(_.length).toSeq
        .sortBy { case (l, c) => (-c, l) }.head._1
      assert(r.getString(7) == modal, s"source ${r.getString(0)} dominant lang")
    }
  }

  test("x63: perplexity matches a driver-side recompute of the bigram MLE model") {
    val rows = Corpus.x63LmPerplexity(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    def bigramsOf(t: String): Seq[String] = {
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.length < 2) Seq.empty
      else toks.sliding(2).map(_.mkString(" ")).toSeq
    }
    val all = docs.flatMap(d => bigramsOf(d._2))
    val c = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = all.groupBy(_.split(" ")(0)).view.mapValues(_.length.toLong).toMap
    assert(rows.length == docs.length)
    val byId = docs.toMap
    rows.foreach { r =>
      val grams = bigramsOf(byId(r.getLong(0)))
      assert(r.getLong(1) == grams.length, s"doc ${r.getLong(0)} event count")
      if (grams.isEmpty) {
        assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 1.0)
      } else {
        val ce = grams.map(g => -(math.log(c(g).toDouble) -
          math.log(c1(g.split(" ")(0)).toDouble))).sum / grams.length
        assert(ce >= 0.0 && r.getDouble(2) >= 0.0 && r.getDouble(3) >= 1.0)
        assert(math.abs(r.getDouble(2) - ce) < 1e-3, s"doc ${r.getLong(0)} ce")
        assert(math.abs(r.getDouble(3) - math.exp(ce)) < 1e-2, s"doc ${r.getLong(0)} ppl")
      }
    }
  }

  test("x49: novelty bounds hold and first-seen counts sum to the distinct-gram total") {
    val rows = Corpus.x49NgramNovelty(spark, sf0001).collect()
    assert(rows.length == Tables.documents(spark, sf0001).count())
    rows.foreach { r =>
      val (n, novel, frac) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(novel >= 0 && novel <= n)
      assert(frac >= 0.0 && frac <= 1.0)
    }
    val firstWithGrams = rows.filter(_.getLong(1) > 0).minBy(_.getLong(0))
    assert(firstWithGrams.getDouble(3) == 1.0, "earliest doc must be all-novel")
    val distinctGrams = graft.functions.Dedup.shingleRelation(
      Tables.documents(spark, sf0001))
      .select(explode(col("tg")).as("g")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == distinctGrams)
  }
}
