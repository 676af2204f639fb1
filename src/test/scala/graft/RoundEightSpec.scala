package graft

import org.apache.spark.sql.functions._

/** Invariant spot-checks for the round-8 additions. */
class RoundEightSpec extends SparkSpec {

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
