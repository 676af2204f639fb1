package graft

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

  test("x36: the fit plan is a single aggregation — no join, one exchange") {
    val p = Stats.x36LeastSquares(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected one gather exchange, got $exchanges:\n$p")
  }
}
