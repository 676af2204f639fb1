package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PQ-budget → recall curve (diagnostic, not part of the driver
  * contract): measure end-to-end ANN recall@3 as a function of the PQ
  * budget (m subspaces × k codewords) on a bed with REAL cluster
  * structure, so [[graft.streaming.MaintainedAnnIndex.sizedPq]]'s
  * defaults rest on a measurement instead of folklore.
  *
  * Bed: 1M vectors, dim 16, 64 well-separated synthetic cluster centers
  * with per-(id, dim) deterministic jitter — each query's true top-3 are
  * same-cluster siblings, so the coarse stage routes easily (nlist/nprobe
  * saturate) and the measured axis is PQ RESOLUTION: can the codes
  * separate ~15k same-cluster residuals? Queries are 50 fresh vectors
  * drawn from the same process with ids OUTSIDE the corpus (never their
  * own nearest neighbor). Ground truth is the exact 50 × 1M brute force.
  *
  * Reports, per (m, k): ADC-only recall@3, reranked recall@3 (shortlist
  * factor 8, the serving default), logical code bytes/vector, and
  * train+encode wall time. Faiss-typical budgets (k = 256) vs the
  * oracle-demo fixture (m = 8, k = 16) is the comparison that sized the
  * retrain defaults (SCALING.md §12).
  *
  *   tools/runjava.sh graft.PqBudgetProbe          # full grid
  *   tools/runjava.sh graft.PqBudgetProbe quick    # 3-point smoke
  */
object PqBudgetProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_GRAFT_DRIVER_MEM", "16g"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.Ivfadc

    val n = sys.env.getOrElse("SPARK_GRAFT_PQPROBE_N", "1000000").toLong
    val dim = 16
    val centers = 64
    // center component in [-1, 1); jitter ±0.1 per dim — cluster radius
    // ~0.23 against ~3 center separation: routing is easy, resolution
    // within the ~n/64 same-cluster siblings is the hard part
    def bed(ids: DataFrame): DataFrame = ids.select(col("vec_id"),
      expr(s"transform(sequence(0, ${dim - 1}), j -> " +
        s"cast(pmod(xxhash64(pmod(vec_id, $centers), j), 2000) as double)/1000.0 - 1.0" +
        s" + (cast(pmod(xxhash64(vec_id, j, 7), 1000) as double)/1000.0 - 0.5) * 0.2)")
        .as("embedding"))
    val corpus = bed(spark.range(n).select(col("id").as("vec_id"))).persist()
    corpus.count()
    // 50 queries, ids disjoint from the corpus (fresh draws, same process)
    val queries = bed(spark.range(50).select((col("id") + lit(5000000000L)).as("vec_id")))
      .persist()
    queries.count()

    def timed[T](name: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $name: $s%.1f s")
      (r, s)
    }

    // exact ground truth: 50 x n brute force, top-3 per query
    val qb = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val d2 = aggregate(zip_with(col("embedding"), col("qe"),
      (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, v) => acc + v)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("_d"), col("vec_id"))
    val (exactTop, _) = timed(s"exact ground truth (50 x $n)") {
      corpus.crossJoin(broadcast(qb))
        .select(col("qid"), col("vec_id"), d2.as("_d"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select(col("qid"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }

    val nlist = graft.streaming.MaintainedAnnIndex.sizedNlist(n)
    val nprobe = 32

    // `shortlist` mode: the OTHER serving knob. At a fixed sized budget,
    // rerank recall is shortlist-bound (the grid shows (16,256) at 2x the
    // bytes buys +0.07) — measure recall vs shortlistFactor so a deployer
    // can buy recall at serve time (more exact re-ranks, no re-encode)
    // instead of at storage time.
    if (args.exists(_.contains("shortlist"))) {
      val (m, k) = graft.streaming.MaintainedAnnIndex.sizedPq(dim, n)
      val ((model, encoded), _) = timed(s"train+encode sized m=$m k=$k") {
        val model = Ivfadc.train(corpus, nlist, m, k)
        val enc = Ivfadc.encode(corpus, model).persist()
        enc.count()
        (model, enc)
      }
      for (sf <- Seq(8, 16, 32, 64)) {
        val (rr, searchS) = timed(s"ADC+rerank shortlistFactor=$sf") {
          Ivfadc.searchRerank(corpus, encoded, queries, model, 3, nprobe,
            shortlistFactor = sf)
            .select(col("query_id"), col("neighbor_id")).collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
        }
        println(f"[pq-shortlist m=$m k=$k factor=$sf%2d candidates=${sf * 3}%3d " +
          f"rerank_recall@3=${rr.intersect(exactTop).size.toDouble / exactTop.size}%.3f " +
          f"search_s=$searchS%.1f]")
      }
      encoded.unpersist()
      spark.stop()
      return
    }

    val grid: Seq[(Int, Int)] =
      if (args.exists(_.contains("quick"))) Seq((8, 16), (8, 256), (16, 256))
      else Seq((4, 16), (4, 64), (4, 256),
               (8, 16), (8, 64), (8, 256),
               (16, 16), (16, 64), (16, 256))
    println(s"[pq-budget grid over $n vectors, dim $dim, $centers clusters, " +
      s"nlist $nlist, nprobe $nprobe; sizedPq picks " +
      s"${graft.streaming.MaintainedAnnIndex.sizedPq(dim, n)}]")
    for ((m, k) <- grid) {
      val bytes = m * (32 - Integer.numberOfLeadingZeros(k - 1)) / 8.0
      val ((model, encoded), buildS) = timed(s"train+encode m=$m k=$k") {
        val model = Ivfadc.train(corpus, nlist, m, k)
        val enc = Ivfadc.encode(corpus, model).persist()
        enc.count()
        (model, enc)
      }
      def pairs(df: DataFrame): Set[(Long, Long)] =
        df.select(col("query_id"), col("neighbor_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val (adc, _) = timed(s"ADC-only search m=$m k=$k") {
        pairs(Ivfadc.search(encoded, queries, model, 3, nprobe))
      }
      val (rr, _) = timed(s"ADC+rerank search m=$m k=$k") {
        pairs(Ivfadc.searchRerank(corpus, encoded, queries, model, 3, nprobe))
      }
      encoded.unpersist()
      println(f"[pq-budget m=$m%2d k=$k%3d bytes/vec=$bytes%5.1f " +
        f"adc_recall@3=${adc.intersect(exactTop).size.toDouble / exactTop.size}%.3f " +
        f"rerank_recall@3=${rr.intersect(exactTop).size.toDouble / exactTop.size}%.3f " +
        f"build_s=$buildS%.1f]")
    }
    spark.stop()
  }
}
