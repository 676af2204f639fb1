package graft

import java.nio.file.Files
import java.sql.DriverManager
import org.apache.spark.sql.streaming.Trigger

/** The graft-jdbc-changelog DSv2 source against the bundled embedded Derby:
  * the JDBC-polling stand-in for the reference's Oracle AQ dequeue loop
  * (O10) — poll max(offset), plan ranges, range-predicated executor reads,
  * checkpointed resume. */
class JdbcChangelogSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { c.createStatement().execute(sql); () } finally c.close()
  }

  private def seed(table: String, n: Int, from: Int = 0): Unit = {
    try exec(s"CREATE TABLE $table (event_id BIGINT PRIMARY KEY, props VARCHAR(200))")
    catch { case _: Exception => () } // already exists
    val c = DriverManager.getConnection(url)
    try {
      val ps = c.prepareStatement(s"INSERT INTO $table VALUES (?, ?)")
      (from until from + n).foreach { i =>
        ps.setLong(1, i.toLong); ps.setString(2, s"""{"k":$i}"""); ps.addBatch()
      }
      ps.executeBatch(); ()
    } finally c.close()
  }

  private def reader(table: String) =
    spark.read.format("graft-jdbc-changelog")
      .option("url", url).option("dbtable", table)
      .option("offsetColumn", "event_id").option("valueColumn", "props")

  test("batch read: table surfaces as (offset, value) with range-partitioned scans") {
    seed("EVENTS_B", 100)
    val df = reader("EVENTS_B").load()
    assert(df.schema.fieldNames.toSeq == Seq("offset", "value"))
    assert(df.count() == 100)
    assert(df.rdd.getNumPartitions == 4, "range must split across numPartitions")
    val r = df.orderBy("offset").limit(1).collect()(0)
    assert(r.getLong(0) == 0 && r.getString(1) == """{"k":0}""")
  }

  test("streaming: AvailableNow drains once, checkpoint blocks replay, new rows tail in") {
    seed("EVENTS_S", 50)
    val out = Files.createTempDirectory("jdbc_out").toString
    val ckpt = Files.createTempDirectory("jdbc_ckpt").toString
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-jdbc-changelog")
        .option("url", url).option("dbtable", "EVENTS_S")
        .option("offsetColumn", "event_id").option("valueColumn", "props")
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", out)
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 50)
    runOnce() // same checkpoint: nothing new, no duplicates
    assert(spark.read.parquet(out).count() == 50)
    seed("EVENTS_S", 25, from = 50) // rows appended after the last run
    runOnce() // tail from the checkpointed offset
    val df = spark.read.parquet(out)
    assert(df.count() == 75)
    assert(df.agg(org.apache.spark.sql.functions.max("offset")).collect()(0).getLong(0) == 74)
  }

  test("admission control: maxRowsPerBatch bounds each micro-batch") {
    seed("EVENTS_A", 100)
    val out = Files.createTempDirectory("jdbc_out2").toString
    val ckpt = Files.createTempDirectory("jdbc_ckpt2").toString
    val q = spark.readStream.format("graft-jdbc-changelog")
      .option("url", url).option("dbtable", "EVENTS_A")
      .option("offsetColumn", "event_id").option("valueColumn", "props")
      .option("maxRowsPerBatch", "30")
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", out)
      .start()
    q.awaitTermination()
    assert(spark.read.parquet(out).count() == 100)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 4, s"expected >=4 rate-limited batches, got ${batches.length}")
    assert(batches.forall(_.numInputRows <= 30))
  }

  test("identifier injection and bad options are rejected up front") {
    intercept[Exception] {
      reader("EVENTS_B; DROP TABLE EVENTS_B").load().count()
    }
    intercept[Exception] {
      reader("EVENTS_B").option("numPartitions", "0").load().count()
    }
  }
}
