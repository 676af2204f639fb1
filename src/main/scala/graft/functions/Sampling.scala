package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Deterministic sampling / splitting for training-data curation — the ops a
  * 100 TB pipeline needs where `rand()` is unusable (results must be
  * reproducible across retries, resumable across job restarts, and stable
  * under repartitioning):
  *
  *  - hash split: route every doc to train/validation/test by a bucket
  *    derived from md5(doc_id) — pure map, no shuffle, no state; adding new
  *    docs never reassigns old ones;
  *  - stratified sample: fixed-size per-stratum sample ranked by a content
  *    hash — a deterministic reservoir. The row_number window compiles with
  *    WindowGroupLimit, so each map task pre-prunes to its local top-n
  *    before the single shuffle on the stratum key.
  *
  * Both are md5-based and therefore bit-reproducible in the DuckDB oracle.
  */
object Sampling {

  /** Split bucket in [0, 100): value of the first 4 hex chars of
    * md5(doc_id) mod 100 — uniform by md5 avalanche, independent of row
    * order and partitioning. */
  def hashBucket(id: org.apache.spark.sql.Column, buckets: Int = 100): org.apache.spark.sql.Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("int"), lit(buckets))

  /** x19 — deterministic 80/10/10 train/validation/test split of the
    * documents table. Map-only: the assignment is a pure per-row expression. */
  def x19HashSplit(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"), hashBucket(col("doc_id")).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "validation")
          .otherwise("test"))
      .orderBy(col("doc_id"))

  /** x20 — stratified deterministic sample: up to `perStratum` events per
    * event_type, ranked by md5 of the event id (a seedless shuffle that every
    * rerun reproduces). One exchange on the stratum key; WindowGroupLimit
    * prunes map-side. */
  def x20StratifiedSample(s: SparkSession, dir: String, perStratum: Int = 50): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(md5(col("event_id").cast("string")), col("event_id"))
    events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perStratum)
      .select(col("event_type"), col("rn"), col("event_id"), round(col("value"), 2).as("value_r"))
      .orderBy(col("event_type"), col("rn"))
  }
}
