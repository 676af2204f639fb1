package graft

import org.apache.spark.sql.functions._
import graft.ops.{Backoff, CoreOps}

class CoreOpsSpec extends SparkSpec {

  test("lastValuePerKey keeps the highest-offset row per key (O2)") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq(
      ("k1", "v1", 1L), ("k1", "v2", 3L), ("k1", "v3", 2L),
      ("k2", "w1", 10L)).toDF("key", "value", "offset")
    val out = CoreOps.lastValuePerKey(df, Seq("key"), "offset")
      .orderBy("key").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("k1", "v2", 3L), ("k2", "w1", 10L)))
  }

  test("salted argmax equals plain argmax (skew-safe two-phase compaction)") {
    val events = Tables.events(spark, sf0001).select("event_id", "user_id", "event_type")
    val plain = CoreOps.lastValuePerKey(events, Seq("user_id"), "event_id")
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getString(2))).toSet
    val salted = CoreOps.lastValuePerKeySalted(events, Seq("user_id"), "event_id")
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getString(2))).toSet
    assert(salted == plain && salted.nonEmpty)
  }

  test("queue-ref parse splits SCHEMA.QUEUE (O11, jms_publisher.clj:179)") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq("LP.CDC_ORDERS", "S2.Q.WITH.DOTS").toDF("q")
    val out = df.select(CoreOps.queueSchema(col("q")), CoreOps.queueName(col("q")))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("LP", "CDC_ORDERS"), ("S2", "Q.WITH.DOTS")))
  }

  test("splitMalformed routes null-parse rows to the dead letter side (O13)") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq("""{"id":{"a":1}}""", "not json", """{"noid":1}""").toDF("value")
      .withColumn("key", CoreOps.dmlKey(col("value")))
    val (ok, dead) = CoreOps.splitMalformed(df, "key")
    assert(ok.count() == 1 && dead.count() == 2)
  }

  test("activeOnly keeps only status=active (O6)") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq(("a", "active"), ("b", "error"), ("c", "active")).toDF("key", "status")
    assert(CoreOps.activeOnly(df).count() == 2)
  }

  test("cubic backoff matches retry.clj:11-19 (max(5, 5*round(n^3/5)) seconds)") {
    assert(Backoff.seconds(1) == 5)
    assert(Backoff.seconds(2) == 10)
    assert(Backoff.seconds(3) == 25)
    assert(Backoff.seconds(4) == 65)
    assert(Backoff.seconds(5) == 125)
    assert(Backoff.seconds(10) == 1000)
  }

  test("retry loop: recovers within max retries, sleeps the backoff schedule") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val r = Backoff.retry(() => { calls += 1; if (calls < 4) sys.error("boom") else 42 },
      sleep = sleeps.append(_))
    assert(r == Right(42))
    assert(sleeps.toSeq == Seq(5000L, 10000L, 25000L))
  }

  test("retry loop: gives up after max retries / on unrecoverable errors") {
    var calls = 0
    val r = Backoff.retry(() => { calls += 1; sys.error("always") },
      maxRetries = 3, sleep = _ => ())
    assert(r.isLeft && calls == 4)
    var calls2 = 0
    val r2 = Backoff.retry(() => { calls2 += 1; sys.error("fatal") },
      recoverable = _ => false, sleep = _ => ())
    assert(r2.isLeft && calls2 == 1)
  }
}
