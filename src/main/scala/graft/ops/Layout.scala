package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout helpers for the 100 TB posture: bucketed tables make
  * repeated equi-joins and aggregations on the bucket key shuffle-free —
  * the write pays the shuffle once, every downstream join reuses it (the
  * Spark analogue of the reference's "partition by PK so all changes to
  * one row land in one partition", core.clj:17-21, applied to storage).
  */
object Layout {

  /** Write `df` as a bucketed+sorted managed table on `bucketCol`. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, nBuckets: Int): Unit =
    df.write
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table) // managed: location under spark.sql.warehouse.dir

  /** Join two same-bucketed tables on the bucket key — planner elides both
    * shuffles (asserted in LayoutSpec). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
