package graft

import org.apache.spark.sql.functions._
import graft.functions.Stats

/** x36 normal-equations least squares: exact recovery on a noiseless
  * linear fixture, and R² degradation under perturbation. */
class StatsSpec extends SparkSpec {

  test("x36: recovers an exact linear relationship with r2 = 1") {
    val sparkS = spark
    import sparkS.implicits._
    // y = 3 + 2·x1 − 0.5·x2, chosen non-collinear
    val rows = for (x1 <- 0L to 23L; x2 <- 1L to 28L)
      yield (3.0 + 2.0 * x1 - 0.5 * x2, x1, x2)
    val out = Stats.fit(rows.toDF("y", "x1", "x2")).collect()(0)
    assert(out.getLong(0) == rows.size)
    assert(out.getDouble(1) == 3.0, s"b0=${out.getDouble(1)}")
    assert(out.getDouble(2) == 2.0, s"b1=${out.getDouble(2)}")
    assert(out.getDouble(3) == -0.5, s"b2=${out.getDouble(3)}")
    assert(out.getDouble(4) == 1.0, s"r2=${out.getDouble(4)}")
  }

  test("x36: deterministic perturbation lowers r2 but keeps coefficients near truth") {
    val sparkS = spark
    import sparkS.implicits._
    val rows = for (x1 <- 0L to 23L; x2 <- 1L to 28L) yield {
      val noise = ((x1 * 31 + x2 * 17) % 7).toDouble - 3.0 // mean ~0, bounded
      (10.0 + 1.5 * x1 + 0.25 * x2 + noise, x1, x2)
    }
    val out = Stats.fit(rows.toDF("y", "x1", "x2")).collect()(0)
    assert(math.abs(out.getDouble(1) - 10.0) < 1.0)
    assert(math.abs(out.getDouble(2) - 1.5) < 0.1)
    assert(math.abs(out.getDouble(3) - 0.25) < 0.1)
    assert(out.getDouble(4) > 0.7 && out.getDouble(4) < 1.0)
  }

  test("d34: approximate percentiles hit the exact nearest-rank targets") {
    import graft.queries.Relational
    val approx = Relational.d34ApproxPercentilesRaw(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // percentile_approx's contract is nearest-rank (smallest value whose
    // cumulative fraction >= p), NOT d23's interpolated quantile_cont; at
    // accuracy 10000 on ~200-value groups the rank error bound n/accuracy
    // is < 1, so the sketch must return the exact order statistic
    val byType = Tables.events(spark, sf0001)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    assert(approx.keySet == byType.keySet)
    def nearestRank(vs: Array[Double], p: Double): Double =
      BigDecimal(vs(math.ceil(p * vs.length).toInt - 1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((k, (a50, a90, a99)) <- approx) {
      val vs = byType(k)
      assert(a50 == nearestRank(vs, 0.5), s"$k p50 $a50 vs ${nearestRank(vs, 0.5)}")
      assert(a90 == nearestRank(vs, 0.9), s"$k p90 $a90 vs ${nearestRank(vs, 0.9)}")
      assert(a99 == nearestRank(vs, 0.99), s"$k p99 $a99 vs ${nearestRank(vs, 0.99)}")
    }
  }

  test("x38: CMS never undercounts, and collides honestly at tiny width") {
    val sparkS = spark
    import sparkS.implicits._
    import graft.functions.Cms
    // 1 hex char -> width 16: 60 distinct tokens MUST collide somewhere
    val toks = (0 until 60).flatMap(i => Seq.fill(i % 5 + 1)(s"tok$i"))
      .toDF("token")
    val grid = Cms.sketch(toks, hexChars = 1)
    assert(grid.length == Cms.Depth * 16)
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
    val est = exact.select(col("token"), col("n"),
      Cms.estimate(typedLit(grid.toSeq), col("token"), hexChars = 1).as("e")).collect()
    est.foreach(r => assert(r.getLong(2) >= r.getLong(1), r.toString))
    assert(est.exists(r => r.getLong(2) > r.getLong(1)),
      "width 16 with 60 tokens must produce at least one overcount")
    // each depth row of the grid sums to the total occurrence count
    val total = toks.count()
    for (d <- 0 until Cms.Depth)
      assert(grid.slice(d * 16, (d + 1) * 16).sum == total)
  }

  test("x36: the fit plan is a single aggregation — no join, one exchange") {
    val p = Stats.x36LeastSquares(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected one gather exchange, got $exchanges:\n$p")
  }
}
