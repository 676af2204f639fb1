package graft

import org.apache.spark.sql.functions._
import graft.queries.Relational
import graft.functions.{Similarity, Text}

/** Spot checks of the declared queries on sf0.001 — invariants that are
  * hand-derivable without the DuckDB oracle (the oracle hash-match is the
  * driver's t2 gate; these keep `sbt test` meaningful offline). */
class QueriesSpec extends SparkSpec {

  test("d01: projection keeps schema and row count") {
    val df = Relational.d01ScanProjection(spark, sf0001)
    assert(df.columns.toSeq == Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"))
    assert(df.count() == 6000)
  }

  test("d03: exactly one row per user, the argmax one") {
    val df = Relational.d03LastEventPerUser(spark, sf0001)
    val users = Tables.events(spark, sf0001).select("user_id").distinct().count()
    assert(df.count() == users)
    assert(df.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
  }

  test("d04 totals reconcile with d05 event count") {
    val agg = Relational.d04HashAgg(spark, sf0001)
      .agg(sum("n_events")).collect()(0).getLong(0)
    val n = Relational.d05CountDistinct(spark, sf0001).collect()(0).getAs[Long]("n_events")
    assert(agg == n)
  }

  test("d06 inner join preserves orders rowcount (every order has a customer)") {
    assert(Relational.d06JoinOrdersCustomer(spark, sf0001).count() ==
      Tables.orders(spark, sf0001).count())
  }

  test("d07 anti+semi partition the customers for the same predicate") {
    val anti = Relational.d07AntiJoin(spark, sf0001).count()
    val urgentCusts = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey").distinct().count()
    assert(anti == Tables.customer(spark, sf0001).count() - urgentCusts)
  }

  test("d08 revenue per nation is positive, grouped by nations of two regions") {
    val rows = Relational.d08RevenuePerNation(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
    assert(rows.forall(r => Set("ASIA", "EUROPE").contains(r.getAs[String]("r_name"))))
  }

  test("d09 running_value is monotone per user (values are positive)") {
    val df = Relational.d09WindowRunning(spark, sf0001)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("event_id")
    val bad = df.withColumn("prev", lag(col("running_value"), 1).over(w))
      .filter(col("prev").isNotNull && col("running_value") < col("prev"))
    assert(bad.count() == 0)
  }

  test("d10 returns exactly the 10 priciest orders") {
    val got = Relational.d10TopK(spark, sf0001).collect().map(_.getLong(0)).toSet
    val want = Tables.orders(spark, sf0001)
      .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(10)
      .collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  test("d15 dml key round-trips through the real parser") {
    val rows = Relational.d15DmlKey(spark, sf0001).limit(20).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == s"""["event_id",$id,"user_id",${
        r.getString(2).split("\"user_id\":")(1).split("}")(0)}]""")
    }
  }

  test("d16 rollup: grand total row equals table size") {
    val df = Relational.d16Rollup(spark, sf0001)
    val total = df.filter(col("etype") === "ALL" && col("bucket_s") === "ALL")
      .collect()(0).getAs[Long]("n")
    assert(total == 1000)
  }

  test("d20 similarity: top-5 excludes the query and scores are in [-1,1] descending") {
    val rows = Similarity.d20TopKNeighbors(spark, sf0001).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getLong(0) != 0L))
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(s => s >= -1.0 && s <= 1.0))
  }

  test("d21 token top-20 is dominated by corpus stopwords") {
    val rows = Text.d21TokenTopK(spark, sf0001).collect()
    assert(rows.length == 20)
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("approx_count_distinct lands within 5% of the exact count (D5 approximate path)") {
    val e = Tables.events(spark, sf0001)
    val row = e.agg(countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx")).collect()(0)
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx $approx vs exact $exact")
  }

  test("approx_percentile lands within 10% of the exact percentile (sketch path)") {
    val e = Tables.events(spark, sf0001)
    val row = e.agg(expr("percentile(value, 0.9)").as("exact"),
      expr("approx_percentile(value, 0.9, 1000)").as("approx")).collect()(0)
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.1, s"approx $approx vs exact $exact")
  }

  test("entry() smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle coverage: every oracle key exists in queries") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
