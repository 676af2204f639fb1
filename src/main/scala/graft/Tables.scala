package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All engine queries take `(SparkSession, sfDir)` and resolve tables here so
  * the same query code runs at any scale factor. Reads are plain parquet
  * scans — Catalyst pushes predicates and prunes columns into the scan, which
  * is the scale path: at 100 TB the same code reads a partitioned table and
  * only the referenced columns/row groups.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame   = t(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame   = t(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = t(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = t(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame     = t(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame   = t(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = t(s, dir, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Read nanos as long (legacy conf) and convert to a micros
    * timestamp — the data is micro-precision (sub-micro digits are zero at
    * every SF), so the conversion is lossless.
    *
    * `nanosAsLong` has no per-read option (checked: ParquetOptions in
    * 4.1.2), only the session-wide legacy conf. The set below is a
    * one-way, idempotent upgrade (never unset, never toggled), so
    * concurrent readers of other tables see at most a schema widening of
    * nanos timestamps they don't have. */
  def events(s: SparkSession, dir: String): DataFrame = {
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, dir, "events")
    // the engine's contract is ts: TimestampType (LTZ, session tz UTC);
    // normalize whatever physical form the generated parquet uses —
    // TIMESTAMP(NANOS) (read as long above) or un-adjusted micros (read
    // as TIMESTAMP_NTZ). The NTZ→LTZ cast reinterprets the wall-clock in
    // the UTC session zone, i.e. the same instant the nanos path produced.
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame  = t(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")
}
