package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: corpus statistics that inform near-dup thresholds — the
  * within-LSH-bucket cosine distribution of the embeddings table and the
  * SimHash Hamming-distance histogram of the documents table at a given SF.
  * Usage: runjava.sh graft.CorpusStats <sfDir>
  */
object CorpusStats {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (args.lift(1).contains("sig")) {
      // isolated md5-vs-xxhash64 signature pipeline timing (alternating)
      val docs = Tables.documents(spark, dir)
      def time(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      for (round <- 1 to 3) {
        time(s"r$round md5 ") { graft.functions.Dedup.minhashSignatures(docs)
          .write.format("noop").mode("overwrite").save() }
        time(s"r$round fast") { graft.functions.Dedup.minhashSignaturesFast(docs)
          .write.format("noop").mode("overwrite").save() }
      }
      for (round <- 1 to 2) {
        time(s"r$round simhash explode") { graft.functions.Dedup.simhash64(docs)
          .write.format("noop").mode("overwrite").save() }
        time(s"r$round simhash fused  ") { graft.functions.Dedup.simhash64Fused(docs)
          .write.format("noop").mode("overwrite").save() }
      }
      spark.stop(); return
    }

    val pairs = graft.functions.Dedup.embeddingNearDups(
      Tables.embeddings(spark, dir), threshold = -1.0)
    println(s"== within-bucket cosine top 20 @ $dir ==")
    pairs.orderBy(col("score").desc).limit(20).show(20, truncate = false)
    println("== within-bucket score histogram ==")
    pairs.groupBy(round(col("score"), 1).as("bin")).count().orderBy(col("bin")).show(40)

    println(s"== simhash neardup pairs by hamming (t<=8) @ $dir ==")
    graft.functions.Dedup.simhashNearDups(Tables.documents(spark, dir), t = 8)
      .groupBy(col("hamming")).count().orderBy(col("hamming")).show(10)
    spark.stop()
  }
}
