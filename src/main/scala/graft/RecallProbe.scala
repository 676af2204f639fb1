package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN quality probe (diagnostic, not part of the driver contract): measure
  * recall@k of every approximate-nearest-neighbor path against the exact
  * brute-force result on the same queries — the quality axis BENCH's
  * latency numbers don't capture. Run on any sf dir:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/runjava.sh graft.RecallProbe
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.{Ivf, Ivfadc, Pq, Similarity}

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = pairs(Similarity.x08AnnMultiQuery(spark, dir))
    def recall(name: String, approx: Set[(Long, Long)]): Unit =
      println(f"$name%-28s recall@3 = ${approx.intersect(exact).size.toDouble / exact.size}%.3f")

    recall("x09 LSH (4 planes)", pairs(Similarity.x09AnnLsh(spark, dir)))
    recall("x09b LSH (4 tables x 4)", pairs(Similarity.x09bAnnLshMulti(spark, dir)))
    recall("x13 IVF (nprobe 2/8)", pairs(Ivf.x13AnnIvf(spark, dir)))
    recall("x30 PQ ADC+rerank", pairs(Pq.x30PqAnn(spark, dir)))
    recall("x31 IVFADC ADC+rerank", pairs(Ivfadc.x31IvfadcAnn(spark, dir)))
    spark.stop()
  }
}
