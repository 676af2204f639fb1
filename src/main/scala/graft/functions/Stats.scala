package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Distributed model fitting as pure relational algebra: multiple linear
  * regression by the normal equations. The entire fit is ONE map-side-
  * combinable aggregation producing the Gram-matrix sums (constant-size
  * state: 10 doubles regardless of corpus size), followed by scalar
  * arithmetic on that single row — the same shape a 100 TB fit needs: one
  * pass, one tiny shuffle, no driver-side data movement. The closed-form
  * solve (Cramer's rule on the 3×3 system) stays inside the plan as column
  * expressions, so the whole fit is a DataFrame in = DataFrame out operator
  * with a bit-reproducible DuckDB oracle.
  */
object Stats {

  /** x36 — least-squares fit of value ~ b0 + b1·hour + b2·day over events,
    * plus R². Output is one row: the coefficient vector, fit quality, and
    * the row count that produced it. */
  def x36LeastSquares(s: SparkSession, dir: String): DataFrame =
    fit(events(s, dir).select(
      col("value").as("y"),
      hour(col("ts")).cast("long").as("x1"),
      dayofmonth(col("ts")).cast("long").as("x2")))

  /** Normal-equations fit over a (y: double, x1: long, x2: long) relation. */
  def fit(e: DataFrame): DataFrame = {
    // Gram sums: integer x-sums stay exact; y-sums are the only
    // order-sensitive doubles (absorbed by the output rounding)
    val g = e.agg(
      count(lit(1)).as("n"),
      sum(col("x1")).as("sx1"), sum(col("x2")).as("sx2"),
      sum(col("x1") * col("x1")).as("sx11"),
      sum(col("x1") * col("x2")).as("sx12"),
      sum(col("x2") * col("x2")).as("sx22"),
      sum(col("y")).as("sy"),
      sum(col("x1") * col("y")).as("sx1y"),
      sum(col("x2") * col("y")).as("sx2y"),
      sum(col("y") * col("y")).as("syy"))

    // Cramer's rule for [n sx1 sx2; sx1 sx11 sx12; sx2 sx12 sx22] b = [sy sx1y sx2y]
    def det3(a11: Column, a12: Column, a13: Column,
             a21: Column, a22: Column, a23: Column,
             a31: Column, a32: Column, a33: Column): Column =
      a11 * (a22 * a33 - a23 * a32) -
        a12 * (a21 * a33 - a23 * a31) +
        a13 * (a21 * a32 - a22 * a31)

    val n = col("n").cast("double")
    val (sx1, sx2, sx11, sx12, sx22) =
      (col("sx1").cast("double"), col("sx2").cast("double"),
        col("sx11").cast("double"), col("sx12").cast("double"),
        col("sx22").cast("double"))
    val (sy, sx1y, sx2y, syy) = (col("sy"), col("sx1y"), col("sx2y"), col("syy"))

    val det = det3(n, sx1, sx2, sx1, sx11, sx12, sx2, sx12, sx22)
    val b0 = det3(sy, sx1, sx2, sx1y, sx11, sx12, sx2y, sx12, sx22) / det
    val b1 = det3(n, sy, sx2, sx1, sx1y, sx12, sx2, sx2y, sx22) / det
    val b2 = det3(n, sx1, sy, sx1, sx11, sx1y, sx2, sx12, sx2y) / det
    // with an intercept: SSE = syy - b0·sy - b1·sx1y - b2·sx2y; SST = syy - sy²/n
    val sse = syy - b0 * sy - b1 * sx1y - b2 * sx2y
    val sst = syy - sy * sy / n
    g.select(
      col("n"),
      round(b0, 4).as("b0"), round(b1, 4).as("b1"), round(b2, 4).as("b2"),
      round(lit(1.0) - sse / sst, 6).as("r2"))
  }

  /** x61 — Zipf-fit corpus statistic: least-squares slope/intercept of
    * ln(freq) on ln(rank) over the top-`topN` term-frequency spectrum. A
    * natural-language corpus fits slope ≈ −1 (Zipf's law); template spam
    * or heavy duplication flattens the head and shows up as a drifting
    * slope, so this one number is a cheap per-ingest corpus-health gate
    * next to x49's novelty curve. Scale shape: term counts are one hash
    * shuffle with map-side partial aggregation; the top-N spectrum is a
    * `TakeOrderedAndProject` (per-partition heaps — never a global sort of
    * the vocabulary); the rank window and the x36-style closed-form fit
    * run over the N-row control-plane relation. */
  def x61ZipfFit(s: SparkSession, dir: String, topN: Int = 1000): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("term"))
    val spectrum = documents(s, dir)
      .select(explode(Text.tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(topN)
      .withColumn("rank", row_number().over(w))
      .select(log(col("rank").cast("double")).as("x"),
        log(col("cnt").cast("double")).as("y"))
    val n = col("n").cast("double")
    val slope = (n * col("sxy") - col("sx") * col("sy")) /
      (n * col("sxx") - col("sx") * col("sx"))
    spectrum
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
      .select(col("n").as("n_terms"),
        round(slope, 4).as("slope"),
        round((col("sy") - slope * col("sx")) / n, 4).as("intercept"))
  }
}
