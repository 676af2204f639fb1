package graft

import org.apache.spark.sql.functions._

/** Invariant spot-checks for the round-8 additions. */
class RoundEightSpec extends SparkSpec {

  test("quantized IVF train matches an exact JVM replay, incl. empty-cell carry-over") {
    val sparkS = spark
    import sparkS.implicits._
    // duplicate lowest-id vectors force identical init centroids; every
    // point then assigns to the LOWER twin (first-max tie-break), so the
    // higher twin's cell is empty in every round and must carry its
    // initial centroid through both Lloyd iterations
    val vecs: Seq[(Long, Array[Float])] = (0L until 24L).map { i =>
      val base = if (i < 2) Array.fill(4)(0.5f)
      else Array.tabulate(4)(d => (((i * 7 + d * 3) % 11).toFloat - 5f) / 5f)
      i -> base
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = graft.functions.Ivf.train(df, nlist = 4, iters = 2, sampleMod = 1)

    // exact replay of the quantized trainer
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
      while (i < a.length) { ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1 }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    var cents: Array[Array[Double]] =
      vecs.sortBy(_._1).take(4).map(_._2.map(_.toDouble)).toArray
    for (_ <- 0 until 2) {
      val assigned = vecs.map { case (id, v) =>
        val dv = v.map(_.toDouble)
        val sims = cents.map(c => cos(dv, c))
        (sims.indices.minBy(i => (-sims(i), i)), dv)
      }
      cents = cents.indices.map { cell =>
        val members = assigned.filter(_._1 == cell).map(_._2)
        if (members.isEmpty) cents(cell)
        else Array.tabulate(4) { d =>
          val sq = members.map(v => math.floor(v(d) * 1048576.0).toLong).sum
          sq.toDouble / (members.length.toDouble * 1048576.0)
        }
      }.toArray
    }
    assert(got.length == 4)
    got.zip(cents).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g.toSeq == w.toSeq, s"centroid $i")
    }
    // the twin-init cell is empty in ROUND 1 (ties go to the lower twin
    // while the centroids are still identical), so a 1-iter train must
    // carry its raw init — the empty-cell path is genuinely exercised;
    // in round 2 the no-longer-identical centroid legitimately refills
    val one = graft.functions.Ivf.train(df, nlist = 4, iters = 1, sampleMod = 1)
    assert(one(1).toSeq == vecs(1)._2.map(_.toDouble).toSeq,
      "cell 1 must carry its initial centroid through the empty round")
  }

  test("x78: rule signals match a driver-side recompute; verdicts compose") {
    val rows = graft.functions.Text
      .x78GopherRules(spark, sf0001, stops = Seq("the", "a")).collect()
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap
    assert(rows.length == docs.size, "one row per doc")
    val stops = Set("the", "a")
    rows.foreach { r =>
      val text = docs(r.getLong(0))
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      assert(r.getLong(1) == toks.length, s"doc ${r.getLong(0)} n_words")
      val hashes = text.count(_ == '#')
      var rest = text; var dots = 0
      while (rest.contains("...")) { dots += 1; rest = rest.replaceFirst("\\Q...\\E", "") }
      assert(r.getLong(3) == hashes + dots, s"doc ${r.getLong(0)} n_symbols")
      assert(r.getLong(5) == toks.count(_.exists(c => c >= 'a' && c <= 'z')),
        s"doc ${r.getLong(0)} n_alpha_words")
      assert(r.getLong(6) == toks.distinct.count(stops), s"doc ${r.getLong(0)} n_stop_hits")
      val keep = r.getBoolean(7) && r.getBoolean(8) && r.getBoolean(9) &&
        r.getBoolean(10) && r.getBoolean(11)
      assert(r.getBoolean(12) == keep, s"doc ${r.getLong(0)} keep composition")
    }
    assert(rows.exists(_.getBoolean(12)), "some docs survive the gate")
    assert(rows.exists(!_.getBoolean(12)), "the gate rejects something")
    // the paper's English list stays the default
    assert(graft.functions.Text.GopherStops ==
      Seq("the", "be", "to", "of", "and", "that", "have", "with"))
  }

  test("x77: DSIR scores match a driver-side recompute; selection favors the target source") {
    val rows = graft.functions.Sampling.x77DsirSelect(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length), "dense ranks")

    // driver-side replay: features, bucket models, quantized log-ratios
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)).getOrElse("")))
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def bucket(f: String): Int = Integer.parseInt(md5hex(f).substring(0, 4), 16) % 256
    def feats(text: String): Seq[Int] = {
      val t = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      (t ++ t.sliding(2).filter(_.length == 2).map(_.mkString(" "))).map(bucket)
    }
    val all = docs.map { case (id, src, tx) => (id, src, feats(tx)) }
    val cr = all.flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ct = all.filter(_._2 == "src0").flatMap(_._3)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (crt, ctt) = (cr.values.sum, ct.values.sum)
    def lq(b: Int): Long =
      math.floor((math.log((ct.getOrElse(b, 0L) + 1).toDouble / (ctt + 256)) -
        math.log((cr.getOrElse(b, 0L) + 1).toDouble / (crt + 256))) * 1e6).toLong
    val scores = all.map { case (id, _, fs) => id -> fs.map(lq).sum }.toMap
    val nf = all.map { case (id, _, fs) => id -> fs.size.toLong }.toMap
    // knife-edge audit (the x76 lesson applied to ln): the floor boundary
    // only splits engines when (lr·1e6) sits within ~1 ulp (≈2e-10) of an
    // integer; assert this corpus keeps a ≥1e-6 margin on every bucket so
    // a future data refresh landing near a boundary fails HERE with a
    // pinpointed message instead of as an opaque oracle hash mismatch
    val minMargin = (cr.keySet ++ ct.keySet).toSeq.map { b =>
      val lr = (math.log((ct.getOrElse(b, 0L) + 1).toDouble / (ctt + 256)) -
        math.log((cr.getOrElse(b, 0L) + 1).toDouble / (crt + 256))) * 1e6
      val frac = lr - math.floor(lr)
      math.min(frac, 1.0 - frac)
    }.min
    assert(minMargin > 1e-6,
      f"a bucket log-ratio sits $minMargin%.2e from a floor boundary - " +
        "1-ulp ln divergence between engines could flip its quantization")

    val wantTop = scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(100)
    rows.zip(wantTop).foreach { case (r, (wid, wscore)) =>
      assert(r.getLong(1) == wid, s"rank ${r.getInt(0)}: got ${r.getLong(1)}, want $wid")
      assert(r.getLong(2) == nf(wid), s"doc $wid n_feats")
      val lw = BigDecimal(wscore.toDouble / 1e6)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - lw) < 1e-9, s"doc $wid log_weight")
    }
    // the target-source docs should be over-represented in the selection
    val srcOf = docs.map(d => d._1 -> d._2).toMap
    val selFrac = rows.count(r => srcOf(r.getLong(1)) == "src0").toDouble / rows.length
    val baseFrac = docs.count(_._2 == "src0").toDouble / docs.length
    assert(selFrac > baseFrac, s"selection frac $selFrac vs base $baseFrac")
  }
}
