object PqProf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").appName("pqprof").getOrCreate()
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.1"
    val emb = graft.Tables.embeddings(spark, dir)
    emb.count()
    def t[A](n: String)(f: => A): A = { val s = System.nanoTime; val r = f; println(f"PHASE $n ${(System.nanoTime-s)/1e9}%.2f s"); r }
    // warm
    val cbw = t("train_warm") { graft.functions.Pq.train(emb) }
    val cb = t("train") { graft.functions.Pq.train(emb) }
    val codes = graft.functions.Pq.encode(emb, cb)
    t("encode") { codes.write.format("noop").mode("overwrite").save() }
    val q = emb.filter(col("vec_id") < 20)
    t("search_rerank") { graft.functions.Pq.searchRerank(emb, codes, q, cb, 3).write.format("noop").mode("overwrite").save() }
    println("NROWS " + emb.count())
    spark.stop()
  }
}
