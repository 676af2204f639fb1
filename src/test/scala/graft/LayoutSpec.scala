package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Bucketing: co-located storage layout makes the repeated join
  * shuffle-free — the physical plan must contain no Exchange on either
  * side of the bucketed join. */
class LayoutSpec extends SparkSpec {

  test("joining two same-bucketed tables elides both shuffles") {
    val orders = Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "okey")
    val lineitem = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "okey")
    Layout.writeBucketed(orders, "graft_orders_b", "okey", 8)
    Layout.writeBucketed(lineitem, "graft_lineitem_b", "okey", 8)
    try {
      val joined = Layout.bucketedJoin(spark, "graft_orders_b", "graft_lineitem_b", "okey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"), plan)
      if (plan.contains("SortMergeJoin"))
        assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // row-level sanity: same result as the unbucketed join
      assert(joined.count() ==
        orders.join(lineitem, Seq("okey")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    }
  }
}
