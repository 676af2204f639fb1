package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main for operator pieces (not part of the contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.documents(spark, sfDir)
    import graft.functions.Text
    println("docs stats:")
    docs.agg(count(lit(1)), avg(length(col("text"))), max(length(col("text")))).show()
    time("tokens count")(docs.select(size(Text.tokens(col("text"))).as("n")).agg(sum("n")).collect())
    time("shingles count")(docs.select(size(Text.shingles(Text.tokens(col("text")))).as("n")).agg(sum("n")).collect())
    val sig = graft.functions.Dedup.minhashSignatures(docs)
    time("signatures noop")(sig.write.format("noop").mode("overwrite").save())
    time("signatures noop 2nd")(sig.write.format("noop").mode("overwrite").save())
    time("signatures + orderBy")(sig.orderBy("doc_id", "band").write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
