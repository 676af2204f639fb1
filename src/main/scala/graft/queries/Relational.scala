package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops.CoreOps

import scala.jdk.CollectionConverters._

/** Declared relational inventory D1–D19 (SURVEY.md §2.3) — the t2
  * correctness contract. Every query ends with a total ORDER BY, wraps
  * floating aggregates in round(x, 2), and aliases every computed column so
  * the DuckDB oracle (SparkEntry.oracleSql) produces identical column names.
  *
  * Scale notes per query are inline; dimension tables (region/nation/
  * customer/supplier) are explicitly broadcast — at any SF they are tiny
  * relative to the fact tables, so the joins stay shuffle-free on the fact
  * side's partitioning.
  */
object Relational {

  /** D1 — parquet scan + projection + total order. Column pruning reaches
    * the scan: ReadSchema carries only the four referenced columns. */
  def d01ScanProjection(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** D2 — filter predicates (=, IN, >, AND); pushed into the parquet scan. */
  def d02Filter(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(col("event_type").isin("purchase", "signup") && col("value") > 50 && col("props").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"), round(col("value"), 2).as("value_r"))
      .orderBy(col("event_id"))

  /** D3 — last-value-per-key / argmax (O2 generalized): latest event per
    * user. One shuffle on user_id; deterministic via (ts, event_id) DESC. */
  def d03LastEventPerUser(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"), round(col("value"), 2).as("last_value"))
      .orderBy(col("user_id"))
  }

  /** D4 — hash aggregation with partial (map-side) combine for free. */
  def d04HashAgg(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"),
        round(avg(col("value")), 2).as("avg_value"),
        round(min(col("value")), 2).as("min_value"),
        round(max(col("value")), 2).as("max_value"))
      .orderBy(col("event_type"))

  /** D5 — exact distinct counts (single-row result). */
  def d05CountDistinct(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types"),
        count(lit(1)).as("n_events"))

  /** D6 — inner equi-join; customer is broadcast (1.5k rows at sf0.01,
    * 150k at sf10 — still broadcastable; fact side never shuffles). */
  def d06JoinOrdersCustomer(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .join(broadcast(customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"),
        round(col("o_totalprice"), 2).as("total_r"))
      .orderBy(col("o_orderkey"))

  /** D7a — left anti join: customers with no 1-URGENT order. */
  def d07AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val urgent = orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
    customer(s, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** D7b — left semi join: customers having at least one order > 400k. */
  def d07SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val big = orders(s, dir).filter(col("o_totalprice") > 400000)
    customer(s, dir)
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** D3b — the skew-safe salted argmax as a declared query: same result
    * contract as [[d03LastEventPerUser]] (and the same oracle shape), but
    * computed by the two-phase salted plan a hot-key changelog needs at
    * 100 TB. */
  def d03bSaltedArgmax(s: SparkSession, dir: String): DataFrame =
    graft.ops.CoreOps.lastValuePerKeySalted(events(s, dir), Seq("user_id"), "event_id")
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"), round(col("value"), 2).as("last_value"))
      .orderBy(col("user_id"))

  /** D7c — left outer join: every customer, with their >450k orders or
    * nulls. Null ordering pinned NULLS FIRST on both engines (Spark's asc
    * default) so the row order is total. */
  def d07bLeftOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val big = orders(s, dir).filter(col("o_totalprice") > 450000)
    customer(s, dir)
      .join(big, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("total_r"))
      .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)
  }

  /** D7d — full outer join over two partially-overlapping user sets (big
    * purchasers vs big error-reporters); unmatched sides surface as nulls,
    * ordering pinned NULLS FIRST on both engines. */
  def d07cFullOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val p = ev.filter(col("event_type") === "purchase" && col("value") > 200)
      .select(col("user_id").as("p_user")).distinct()
    val e = ev.filter(col("event_type") === "error" && col("value") > 200)
      .select(col("user_id").as("e_user")).distinct()
    p.join(e, col("p_user") === col("e_user"), "full")
      .orderBy(col("p_user").asc_nulls_first, col("e_user").asc_nulls_first)
  }

  /** D8 — multi-way join + agg (TPC-H Q5 shape): revenue per nation for two
    * regions. lineitem⋈orders is the only shuffle join (co-keyed on
    * orderkey); customer/nation/region are broadcast so the probe side
    * streams. Filter on r_name prunes before the join via the broadcast. */
  def d08RevenuePerNation(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, dir).filter(col("r_name").isin("ASIA", "EUROPE"))),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("r_name"), col("n_name"))

  /** D9 — window frames: running sum + lag + dense_rank per user. Window
    * ordered by the unique event_id so results are totally deterministic. */
  def d09WindowRunning(s: SparkSession, dir: String): DataFrame = {
    val byId = Window.partitionBy("user_id").orderBy("event_id")
    val frame = byId.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byValue = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    events(s, dir)
      .select(col("user_id"), col("event_id"),
        round(sum(col("value")).over(frame), 2).as("running_value"),
        lag(col("event_type"), 1).over(byId).as("prev_type"),
        lead(col("event_type"), 1).over(byId).as("next_type"),
        dense_rank().over(byValue).as("value_rank"))
      .orderBy(col("event_id"))
  }

  /** D9b — the rest of the window-function family: boundary values over an
    * unbounded frame, ntile quartiles, percent_rank/cume_dist. One hash
    * partition on user_id serves every function (single window shuffle). */
  def d09bWindowFamily(s: SparkSession, dir: String): DataFrame = {
    val byId = Window.partitionBy("user_id").orderBy("event_id")
    val full = byId.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events(s, dir)
      .select(col("event_id"), col("user_id"),
        first(col("event_type")).over(full).as("first_type"),
        last(col("event_type")).over(full).as("last_type"),
        ntile(4).over(byId).as("q4"),
        round(percent_rank().over(byId), 4).as("pr"),
        round(cume_dist().over(byId), 4).as("cd"))
      .orderBy(col("event_id"))
  }

  /** D26 — scalar subqueries in projection and predicate: Catalyst rewrites
    * them into a one-row broadcast (no driver-side collect in user code). */
  def d26ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    events(s, dir).createOrReplaceTempView("events_v")
    s.sql("""
      SELECT event_id, round(value, 2) AS value_r,
             round(value - (SELECT avg(value) FROM events_v), 2) AS delta
      FROM events_v
      WHERE value > (SELECT avg(value) FROM events_v)
      ORDER BY event_id""")
  }

  /** D10 — top-k: TakeOrderedAndProject (per-partition top-k + driver merge
    * of k·partitions rows — no global sort, scale-safe). */
  def d10TopK(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("total_r"))
      .orderBy(col("total_r").desc, col("o_orderkey"))

  /** D11a — EXCEPT: users who had a >200-value purchase but no >200-value
    * error event. */
  def d11Except(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    e.filter(col("event_type") === "purchase" && col("value") > 200).select(col("user_id"))
      .except(e.filter(col("event_type") === "error" && col("value") > 200).select(col("user_id")))
      .orderBy(col("user_id"))
  }

  /** D11b — INTERSECT of the same two user sets. */
  def d11Intersect(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    e.filter(col("event_type") === "purchase" && col("value") > 200).select(col("user_id"))
      .intersect(e.filter(col("event_type") === "error" && col("value") > 200).select(col("user_id")))
      .orderBy(col("user_id"))
  }

  /** D11c — UNION (distinct) of the two user sets. */
  def d11Union(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    e.filter(col("event_type") === "purchase" && col("value") > 200).select(col("user_id"))
      .union(e.filter(col("event_type") === "error" && col("value") > 200).select(col("user_id")))
      .distinct()
      .orderBy(col("user_id"))
  }

  /** D12 — string functions; O11 queue-ref parse over a synthesized
    * "SCHEMA.QUEUE" column (reference jms_publisher.clj:179). */
  def d12QueueRefParse(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("queue_ref",
        concat(lit("CDC"), (col("user_id") % 3).cast("string"), lit(".Q_"), upper(col("event_type"))))
      .select(col("event_id"), col("queue_ref"),
        CoreOps.queueSchema(col("queue_ref")).as("q_schema"),
        CoreOps.queueName(col("queue_ref")).as("q_name"),
        length(col("queue_ref")).as("ref_len"),
        substring(col("queue_ref"), 1, 5).as("ref_prefix"))
      .orderBy(col("event_id"))

  /** D13 — date/time: events per day. */
  def d13EventsPerDay(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("day"))

  /** D14 — JSON functions over the props payload (O4/O12). */
  def d14JsonExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k_val"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int"))
      .orderBy(col("event_id"))

  /** D15 — the reference's core transform (O12, core.clj:13-22): build a DML
    * envelope from events, derive the Kafka message key = sorted flattened id
    * map as a compact JSON array. Exercises the real dmlKey machinery against
    * a string-concat oracle (id fields here are ints with known sort order).
    */
  def d15DmlKey(s: SparkSession, dir: String): DataFrame = {
    val dml = to_json(struct(
      struct(col("event_id"), col("user_id")).as("id"),
      col("event_type").as("type"),
      lit("events").as("table")))
    events(s, dir)
      .withColumn("dml", dml)
      .select(col("event_id"), CoreOps.dmlKey(col("dml")).as("dml_key"), col("dml").as("dml_raw"))
      .orderBy(col("event_id"))
  }

  /** D15b — the dml key derived with native array/map functions only
    * (map_entries → array_sort → per-entry flatten → to_json), the
    * SURVEY §2.3 D15 primitive pipeline. Valid when id values are strings
    * (the native map is homogeneous); the jackson UDF (d15) remains the
    * type-preserving general form. */
  def d15bDmlKeyNative(s: SparkSession, dir: String): DataFrame = {
    val idMap = map(lit("user"), concat(lit("u"), col("user_id").cast("string")),
      lit("etype"), col("event_type"))
    val key = to_json(flatten(transform(array_sort(map_entries(idMap)),
      e => array(e.getField("key"), e.getField("value")))))
    events(s, dir)
      .select(col("event_id"), key.as("dml_key_native"))
      .orderBy(col("event_id"))
  }

  /** D13b — hour-of-day histogram (hour extraction + aggregation). */
  def d13bHourHistogram(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(hour(col("ts")).as("hour_of_day"))
      .agg(count(lit(1)).as("n_events"), round(avg(col("value")), 2).as("avg_value"))
      .orderBy(col("hour_of_day"))

  /** D16 — rollup with NULL-marker disambiguation via COALESCE. */
  def d16Rollup(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("bucket", col("user_id") % 4)
      .rollup(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(coalesce(col("event_type"), lit("ALL")).as("etype"),
        coalesce(col("bucket").cast("string"), lit("ALL")).as("bucket_s"),
        col("n"), col("sum_value"))
      .orderBy(col("etype"), col("bucket_s"))

  /** D16b — cube: all grouping combinations of (event_type, bucket). */
  def d16Cube(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("bucket", col("user_id") % 4)
      .cube(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(coalesce(col("event_type"), lit("ALL")).as("etype"),
        coalesce(col("bucket").cast("string"), lit("ALL")).as("bucket_s"),
        col("n"), col("sum_value"))
      .orderBy(col("etype"), col("bucket_s"))

  /** D16c — explicit grouping sets: per-type totals and per-bucket totals
    * in one pass. */
  def d16GroupingSets(s: SparkSession, dir: String): DataFrame = {
    events(s, dir).withColumn("bucket", col("user_id") % 4)
      .createOrReplaceTempView("graft_events_gs")
    s.sql(
      """SELECT coalesce(event_type, 'ALL') AS etype,
        |       coalesce(CAST(bucket AS STRING), 'ALL') AS bucket_s,
        |       count(1) AS n, round(sum(value), 2) AS sum_value
        |FROM graft_events_gs
        |GROUP BY GROUPING SETS ((event_type), (bucket))
        |ORDER BY etype, bucket_s""".stripMargin)
  }

  /** D17 — dedup, distinct form (keyed dedup = D3's argmax; dropDuplicates
    * without an ordering column is nondeterministic so we never declare it).
    */
  def d17Distinct(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(col("event_type")).distinct().orderBy(col("event_type"))

  /** D18 — tumbling event-time window, batch-checkable form. The streaming
    * twin (window() + watermark) is asserted equal in StreamingSpec. */
  def d18HourlyWindow(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour_s"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("hour_s"), col("event_type"))

  /** D19 — sessionization (30-min gap), batch-checkable projection: session
    * count per user. Streaming twin uses session_window (StreamingSpec). */
  def d19Sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > 1800, 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("new_sess")).as("n_sessions"))
      .orderBy(col("user_id"))
  }

  /** D22 — pivot: events per day × event type (explicit value list keeps
    * the output schema deterministic). */
  def d22Pivot(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("day"))

  /** D23 — exact interpolated percentiles per group. */
  def d23Percentiles(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(round(expr("percentile(value, 0.5)"), 2).as("p50"),
        round(expr("percentile(value, 0.9)"), 2).as("p90"),
        round(expr("percentile(value, 0.99)"), 2).as("p99"))
      .orderBy(col("event_type"))

  /** D24 — correlated EXISTS subquery through the SQL surface (decorrelates
    * to a semi join in Catalyst). */
  def d24ExistsSubquery(s: SparkSession, dir: String): DataFrame = {
    customer(s, dir).createOrReplaceTempView("graft_customer_v")
    orders(s, dir).createOrReplaceTempView("graft_orders_v")
    s.sql(
      """SELECT c_custkey, c_name FROM graft_customer_v c
        |WHERE EXISTS (SELECT 1 FROM graft_orders_v o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** D25 — null-handling scalar functions (nullif / coalesce / nvl-chain). */
  def d25NullOps(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_id"),
        nullif(col("event_type"), lit("error")).as("et_nn"),
        coalesce(nullif(col("event_type"), lit("error")), lit("was_error")).as("et_c"),
        when(col("value") > 250, col("value")).otherwise(lit(null)).as("big_value"),
        coalesce(when(col("value") > 250, round(col("value"), 2)), lit(0.0)).as("big_or_zero"))
      .orderBy(col("event_id"))

  /** D13c — date arithmetic and calendar extracts (datediff, date_add,
    * year/month/day/quarter): pure column exprs, map-only. */
  def d13cDateArithmetic(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_id"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("days_since"),
        date_add(col("ts").cast("date"), 7).as("plus_week"),
        year(col("ts")).as("y"), month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("d"), quarter(col("ts")).as("q"))
      .orderBy(col("event_id"))

  /** D27 — aggregate-to-sorted-array (group members gathered per key; the
    * curation shape "all doc ids per cluster"). Emitted as a sorted joined
    * string so the result is deterministic and engine-agnostic. */
  def d27ArrayAgg(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(col("value") > 480)
      .groupBy(col("event_type"))
      .agg(concat_ws(",", sort_array(collect_set(col("user_id")))).as("users"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))

  /** D28 — unpivot/melt: wide per-type aggregates back to (type, metric,
    * val) long form via the native unpivot operator. */
  def d28Unpivot(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(round(sum(col("value")), 2).as("sum_value"),
        round(avg(col("value")), 2).as("avg_value"),
        round(min(col("value")), 2).as("min_value"),
        round(max(col("value")), 2).as("max_value"))
      .unpivot(Array(col("event_type")),
        Array(col("sum_value"), col("avg_value"), col("min_value"), col("max_value")),
        "metric", "val")
      .orderBy(col("event_type"), col("metric"))

  /** t1 — the minimum end-to-end slice (SURVEY.md §7.2), composed from the
    * real engine ops: events as a CDC changelog → DML envelope → dmlKey
    * derivation (O12) → last-event-per-user compaction (O2/D3) → filter
    * (O6/D2) → per-type aggregation (D4). n_keys == n_users proves every
    * surviving row carries a distinct derived Kafka key. */
  def t1Slice(s: SparkSession, dir: String): DataFrame = {
    val dml = to_json(struct(
      struct(col("user_id")).as("id"),
      col("event_type").as("type"),
      lit("events").as("table")))
    val keyed = events(s, dir)
      .withColumn("dml", dml)
      .withColumn("key", CoreOps.dmlKey(col("dml")))
    val latest = CoreOps.lastValuePerKey(keyed, Seq("user_id"), "event_id")
    latest
      .filter(col("key").isNotNull && col("value") > 10)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        countDistinct(col("key")).as("n_keys"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** D29 — as-of join (merge formulation): for each purchase event, the
    * user's most recent click at or before the purchase timestamp. The naive
    * plan is a per-key range join (quadratic within key); the scale shape
    * here is the single-shuffle merge: tag both sides, union, sort within
    * user by (ts, side) with clicks first at ties, and carry the last
    * non-null click forward with last(_, ignoreNulls) — one exchange on
    * user_id, no join at all, O(n log n) per partition. At equal click
    * timestamps the greatest click_id wins (the ORDER BY makes it the last
    * one seen). Purchases with no prior click keep nulls. */
  def d29AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(null).cast("long").as("click_id"), lit(null).cast("double").as("click_value"),
        lit(1).as("side"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"),
        col("event_id").as("click_id"), col("value").as("click_value"),
        lit(0).as("side"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("side").asc, col("click_id").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("asof_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("asof_click_value",
        round(last(col("click_value"), ignoreNulls = true).over(w), 2))
      .filter(col("side") === 1)
      .select(col("user_id"), col("event_id"), col("asof_click_id"), col("asof_click_value"))
      .orderBy(col("event_id"))
  }

  /** D30 — range (interval) join: classify each event's value into a
    * non-overlapping band table via `lo <= value < hi`. The band side is
    * tiny and explicitly broadcast, so the plan is a BroadcastNestedLoopJoin
    * — a map-side scan with zero shuffle of the fact side, the right plan
    * at 100 TB whenever one side fits in memory. (When BOTH sides are large,
    * the standard rewrite is binning: explode intervals into fixed-width
    * bins and equi-join on the bin id + residual filter.) */
  def d30RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val sparkS = s
    import sparkS.implicits._
    val bands = Seq(
      ("tiny", 0.0, 50.0), ("low", 50.0, 150.0), ("mid", 150.0, 300.0),
      ("high", 300.0, 450.0), ("top", 450.0, 1000.0)).toDF("band_name", "lo", "hi")
    events(s, dir)
      .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"), "left")
      .select(col("event_id"), round(col("value"), 2).as("value_r"),
        coalesce(col("band_name"), lit("none")).as("band"))
      .orderBy(col("event_id"))
  }

  /** D31 — RANGE-framed window (value-based frame, complementing D9's
    * ROWS frames): per user, the rolling sum of `value` over the trailing
    * hour of event time. Ordering is on whole epoch seconds so the frame
    * bound is integer arithmetic on both engines. Same single-shuffle shape
    * as every window: one exchange on user_id. */
  def d31RangeWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_sec"))
      .rangeBetween(-3600L, 0L)
    events(s, dir)
      .withColumn("ts_sec", unix_timestamp(col("ts")))
      .select(col("event_id"), col("user_id"),
        round(sum(col("value")).over(w), 2).as("hour_sum"))
      .orderBy(col("event_id"))
  }

  /** D32 — salted shuffle join (the skew pattern for joins, complementing
    * d03b's salted aggregation): when one join key dominates, a plain
    * shuffle join lands the hot key's entire fact partition on one task.
    * Salting splits each fact row into one of `salts` sub-keys
    * (deterministic: o_orderkey mod salts) and replicates the dimension row
    * across all sub-keys, so the hot key fans out over `salts` tasks. The
    * merge-join hint forces the shuffle path (with broadcast the salt would
    * be invisible); the result is row-identical to the unsalted join, which
    * is exactly what the oracle checks. */
  def d32SaltedJoin(s: SparkSession, dir: String, salts: Int = 8): DataFrame = {
    val o = orders(s, dir)
      .withColumn("salt", pmod(col("o_orderkey"), lit(salts)).cast("int"))
    val c = customer(s, dir)
      .select(col("c_custkey"), col("c_name"),
        explode(sequence(lit(0), lit(salts - 1))).as("salt"))
    o.hint("merge")
      .join(c, col("o_custkey") === col("c_custkey") && o("salt") === c("salt"))
      .select(col("o_orderkey"), col("c_name"), round(col("o_totalprice"), 2).as("total_r"))
      .orderBy(col("o_orderkey"))
  }

  /** D33 — statistical moments & bivariate stats per group: the descriptive-
    * statistics surface (stddev/variance in both population and sample
    * forms, correlation, covariance, and the regression aggregates).
    * Single hash aggregation with map-side partials — every one of these is
    * an algebraic aggregate (constant-size state), so the shape is identical
    * to d04 at any scale. */
  def d33StatsMoments(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("h", hour(col("ts")).cast("double"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(stddev_pop(col("value")), 4).as("sd_pop"),
        round(stddev_samp(col("value")), 4).as("sd_samp"),
        round(var_pop(col("value")), 4).as("v_pop"),
        round(var_samp(col("value")), 4).as("v_samp"),
        round(corr(col("value"), col("h")), 4).as("corr_vh"),
        round(covar_pop(col("value"), col("h")), 4).as("cov_pop"),
        round(covar_samp(col("value"), col("h")), 4).as("cov_samp"),
        round(regr_slope(col("value"), col("h")), 4).as("slope"),
        round(regr_intercept(col("value"), col("h")), 4).as("intercept"))
      .orderBy(col("event_type"))

  /** D34 — approximate percentiles via percentile_approx (Greenwald–Khanna
    * style mergeable quantile sketch): the scale path for d23's exact
    * quantiles is [[d34ApproxPercentilesRaw]] — constant-size,
    * map-side-combinable state at a declared accuracy, the only viable
    * quantile plan at 100 TB (exact percentiles buffer the full value
    * multiset per group).
    *
    * The DECLARED query is the sketch's CONTAINMENT AUDIT, a
    * correctness-tier query by nature (it deliberately pays d23's exact
    * percentile cost to produce the band edges, so it runs at
    * verification scale — production serves from the Raw form and runs
    * this audit on samples/slices): each approximate percentile is
    * checked against the exact interpolated percentiles one
    * quantile-point either side (a band orders of magnitude wider than
    * the sketch's rank-error bound n/accuracy), and the query emits the
    * exact band edges plus the verdicts. The band edges are d23-style
    * exact percentiles (DuckDB `quantile_cont` parity), and the oracle
    * asserts every verdict is true — so the sketch's output is
    * oracle-gated even though its internals aren't reproducible in
    * DuckDB. StatsSpec pins the Raw form to exact nearest-rank values. */
  def d34ApproxPercentiles(s: SparkSession, dir: String): DataFrame = {
    val agged = events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        percentile_approx(col("value"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("pa"),
        expr("percentile(value, array(0.49D, 0.51D, 0.89D, 0.91D, 0.98D, 1.0D))").as("px"))
    def ok(i: Int, loIdx: Int, hiIdx: Int) =
      (element_at(col("pa"), i) >= element_at(col("px"), loIdx) &&
        element_at(col("pa"), i) <= element_at(col("px"), hiIdx))
    agged.select(col("event_type"),
        round(element_at(col("px"), 1), 2).as("lo50"),
        round(element_at(col("px"), 2), 2).as("hi50"),
        ok(1, 1, 2).as("ok50"),
        round(element_at(col("px"), 3), 2).as("lo90"),
        round(element_at(col("px"), 4), 2).as("hi90"),
        ok(2, 3, 4).as("ok90"),
        round(element_at(col("px"), 5), 2).as("lo99"),
        round(element_at(col("px"), 6), 2).as("hi99"),
        ok(3, 5, 6).as("ok99"))
      .orderBy(col("event_type"))
  }

  /** The raw d34 sketch output (rows-only form, kept for the JVM bound
    * test): per group, the three approximate percentiles themselves. */
  def d34ApproxPercentilesRaw(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(percentile_approx(col("value"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("pa"))
      .select(col("event_type"),
        round(element_at(col("pa"), 1), 2).as("p50a"),
        round(element_at(col("pa"), 2), 2).as("p90a"),
        round(element_at(col("pa"), 3), 2).as("p99a"))
      .orderBy(col("event_type"))

  /** D35 — correlated LATERAL join (top-N rows of one table per row of
    * another): the per-entity-subquery surface. Catalyst decorrelates the
    * LIMIT-ed lateral subquery into a partitioned row_number window +
    * equi-join — i.e. the same physical shape as the hand-written x20
    * pattern, chosen by the optimizer from declarative SQL. */
  def d35LateralTopN(s: SparkSession, dir: String): DataFrame = {
    customer(s, dir).createOrReplaceTempView("graft_customer")
    orders(s, dir).createOrReplaceTempView("graft_orders")
    s.sql(
      """SELECT c_custkey, c_name, t.o_orderkey, t.total_r
        |FROM graft_customer c JOIN LATERAL (
        |  SELECT o_orderkey, round(o_totalprice, 2) AS total_r
        |  FROM graft_orders o WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey, total_r DESC, o_orderkey""".stripMargin)
  }

  /** D36 — z-score outlier detection per group: the distributional
    * anomaly-flagging surface. Group moments come from an unordered window
    * over the partition (one shuffle on the group key, no sort); the flag
    * thresholds the raw (unrounded) score. */
  def d36Outliers(s: SparkSession, dir: String, zThreshold: Double = 2.5): DataFrame = {
    val w = Window.partitionBy("event_type")
    val z = (col("value") - avg(col("value")).over(w)) / stddev_samp(col("value")).over(w)
    events(s, dir)
      .select(col("event_id"), col("event_type"), round(col("value"), 2).as("value_r"),
        round(z, 4).as("z"), (abs(z) > zThreshold).as("is_outlier"))
      .orderBy(col("event_id"))
  }

  /** D37 — date-spine gap fill: materialize the full daily calendar between
    * the first and last observation and left-join the (sparse) daily
    * aggregate onto it, zero-filling the gaps — the time-series
    * regularization every downstream window/trend computation assumes. The
    * spine is generated from a one-row bounds aggregate (control-plane
    * sized, broadcast), so the only corpus shuffle is the daily aggregate
    * itself. Uses a sparse slice (high-value error events) so the gaps are
    * real. */
  def d37GapFill(s: SparkSession, dir: String): DataFrame = {
    val daily = events(s, dir)
      .filter(col("event_type") === "error" && col("value") > 185)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
    val spine = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 DAY"))).as("day"))
    spine.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy(col("day"))
  }

  /** D38 — per-group winsorization: clamp each value into its group's
    * [p05, p95] band — the standard robust-statistics cleaning step before
    * aggregates that outliers would dominate. The percentile relation is
    * group-cardinality-sized (broadcast); the corpus is scanned once and
    * never shuffled (the exact-percentile agg shuffles only the group key,
    * d23's shape). */
  def d38Winsorize(s: SparkSession, dir: String): DataFrame = {
    val bounds = events(s, dir)
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.05)").as("lo"),
        expr("percentile(value, 0.95)").as("hi"))
    events(s, dir)
      .join(broadcast(bounds), Seq("event_type"))
      .select(col("event_id"), col("event_type"),
        round(col("value"), 2).as("value_r"),
        round(greatest(col("lo"), least(col("hi"), col("value"))), 2).as("winsorized"),
        (col("value") < col("lo") || col("value") > col("hi")).as("clamped"))
      .orderBy(col("event_id"))
  }

  /** D39 — funnel conversion: per user, did a purchase follow a click
    * within the attribution window? The event-sequence pattern product
    * analytics is built on. The step join is a per-user time-range join
    * (d30's range shape keyed by user): clicks and purchases co-partition
    * on user_id, the EXISTS collapses to a semi join, and per-user counts
    * reuse the same partitioning — one key, three co-partitioned ops. */
  def d39Funnel(s: SparkSession, dir: String, windowSecs: Long = 3600L): DataFrame = {
    val e = events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val converted = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") > col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr(s"INTERVAL $windowSecs SECONDS"),
        "left_semi")
      .select(col("user_id")).distinct()
      .withColumn("converted", lit(true))
    val counts = e.groupBy(col("user_id")).agg(
      sum((col("event_type") === "click").cast("long")).as("n_clicks"),
      sum((col("event_type") === "purchase").cast("long")).as("n_purchases"))
    counts.join(converted, Seq("user_id"), "left")
      .filter(col("n_clicks") > 0)
      .select(col("user_id"), col("n_clicks"), col("n_purchases"),
        coalesce(col("converted"), lit(false)).as("converted"))
      .orderBy(col("user_id"))
  }

  /** D41 — FORWARD as-of join (d29's mirror): each purchase matched to the
    * user's EARLIEST click at-or-after it — the "next touchpoint"
    * attribution query. Same single-exchange union+window topology as d29,
    * with the carry flipped: sides sort purchases (0) before clicks (1) at
    * equal ts so a same-instant click is still ahead of the purchase, and a
    * `first(_, ignoreNulls)` over (current row → unbounded following)
    * carries the next click backward. Still exactly ONE shuffle on user_id
    * and no join operator. */
  def d41ForwardAsof(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(null).cast("long").as("click_id"), lit(null).cast("double").as("click_value"),
        lit(0).as("side"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"),
        col("event_id").as("click_id"), col("value").as("click_value"),
        lit(1).as("side"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("side").asc, col("click_id").asc_nulls_first)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    purchases.unionByName(clicks)
      .withColumn("next_click_id", first(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("next_click_value",
        round(first(col("click_value"), ignoreNulls = true).over(w), 2))
      .filter(col("side") === 0)
      .select(col("user_id"), col("event_id"), col("next_click_id"), col("next_click_value"))
      .orderBy(col("event_id"))
  }

  /** D40 — NTILE quantile bucketing: orders ranked into quartiles by total
    * price WITHIN each order priority — the binning step behind per-segment
    * price tiering (and the relational primitive x38/x23-style quality
    * tiers reduce to). One shuffle on the partition key; ntile is a
    * rank-family window function, so it rides the same sorted window pass
    * as a row_number (no second exchange). The tie order (o_totalprice,
    * o_orderkey) is total, so bucket assignment is deterministic. */
  def d40Ntile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orders(s, dir)
      .withColumn("quartile", ntile(4).over(w))
      .select(col("o_orderpriority"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("total_r"), col("quartile"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  /** D42 — retention cohorts: users bucketed by first-seen day, activity
    * counted per (cohort day, day offset) — the classic triangular
    * retention matrix. Two aggregation shapes over ONE events scan: the
    * per-user first day is a user-keyed min (map-side partial), re-joined
    * to the distinct (user, day) activity relation on the same user key —
    * AQE plans both aggs off the shared exchange; the final (cohort,
    * offset) aggregate is date-cardinality-bounded (control-plane). */
  def d42RetentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("user_id"), to_date(col("ts")).as("day"))
    val firstDay = e.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    e.distinct()
      .join(firstDay, "user_id")
      .groupBy(col("first_day"), datediff(col("day"), col("first_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("first_day"), col("day_offset"))
  }

  /** O2 — changelog compaction via max_by: events as a CDC changelog keyed
    * by user_id with event_id as the offset (kafka_ccd_store.clj:28-42). */
  def o02ChangelogCompact(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id"))
      .agg(max_by(col("props"), col("event_id")).as("last_props"),
        max(col("event_id")).as("last_offset"))
      .orderBy(col("user_id"))

  /** O7 — snapshot ∪ tail merge then recompaction (jms_publisher.clj:125-136):
    * the union of a bounded snapshot and the live tail compacts to the same
    * state as reading the whole log. */
  def o07SnapshotUnionTail(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val snapshot = e.filter(col("event_id") < 5000)
    val tail = e.filter(col("event_id") >= 5000)
    snapshot.unionByName(tail)
      .groupBy(col("user_id"))
      .agg(max_by(col("event_type"), col("event_id")).as("last_type"),
        max(col("event_id")).as("last_offset"))
      .orderBy(col("user_id"))
  }

  /** O10 — the graft-changelog DSv2 source (AQ/JMS dequeue stand-in,
    * jms_publisher.clj:169-194) read as a batch table: every event surfaces
    * exactly once as (offset, value). */
  def o10ChangelogSource(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft-changelog")
      .option("path", s"$dir/events.parquet")
      .option("offsetColumn", "event_id")
      .option("valueColumn", "props")
      .load()
      .orderBy(col("offset"))

  /** O13 — malformed-record routing: payloads made invalid for every 100th
    * event must be flagged, never silently parsed (jms_publisher.clj:160-186).
    */
  def o13MalformedRouting(s: SparkSession, dir: String): DataFrame = {
    val payload = when(pmod(col("event_id"), lit(100)) === 0, substring(col("props"), 1, 3))
      .otherwise(col("props"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("_corrupt", org.apache.spark.sql.types.StringType)))
    events(s, dir)
      .withColumn("payload", payload)
      .select(col("event_id"),
        from_json(col("payload"), schema, Map("columnNameOfCorruptRecord" -> "_corrupt").asJava)
          .getField("_corrupt").isNull.as("is_valid"))
      .orderBy(col("event_id"))
  }
}
