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

    // native codegen'd cosine vs zip_with/aggregate HOF pipeline: all-pairs
    // over the embeddings table (sf0.1: 2000^2 = 4M pairs of dim-64)
    import graft.functions.Similarity
    graft.plans.GraftExtensions.register(spark)
    val emb = Tables.embeddings(spark, sfDir)
    val a = emb.select(col("vec_id").as("v1"), col("embedding").as("e1"))
      .repartition(32)
    val b = emb.select(col("vec_id").as("v2"), col("embedding").as("e2"))
    def allPairs(c: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column) =
      a.join(broadcast(b)).select(sum(c(col("e1"), col("e2"))).as("s")).collect()
    time("cosine HOF warm")(allPairs(Similarity.cosine))
    time("cosine HOF")(allPairs(Similarity.cosine))
    time("cosine native warm")(allPairs(Similarity.cosineNative))
    time("cosine native")(allPairs(Similarity.cosineNative))
    spark.stop()
  }
}
