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

    // SIZED operating point — the budget retrainModel defaults to for
    // THIS corpus (√N nlist, sizedPq's dsub-2 × corpus-supported k):
    // the config production serves under, so a quality regression at
    // the sized point shows up in every probe run, not only when
    // PqBudgetProbe's one-off grid is re-measured (round-15 verdict
    // §missing-3). The demo rows above stay for continuity.
    val embAll = Tables.embeddings(spark, dir)
    val nCorpus = embAll.count()
    val dim = embAll.select(size(col("embedding"))).head().getInt(0)
    val sNlist = graft.streaming.MaintainedAnnIndex.sizedNlist(nCorpus)
    val (sM, sK) = graft.streaming.MaintainedAnnIndex.sizedPq(dim, nCorpus)
    val q20 = embAll.filter(col("vec_id") < 20)
    val sized = Ivfadc.train(embAll, nlist = sNlist, m = sM, k = sK)
    recall(s"sized IVFADC ($sNlist cells, ($sM,$sK) pq, nprobe 3)", pairs(
      Ivfadc.searchRerank(embAll, Ivfadc.encode(embAll, sized), q20, sized,
        k = 3, nprobe = 3, knownQueryCount = Some(20L))))

    // ...and the maintained-index TIERED serve under the sized model:
    // seed-train on half, ingest a window, retrain at the sized budget
    // (retrainModel's defaults), ingest another window under the sized
    // model (live delta tier at search time), serve — the x88 lifecycle
    // at the sized operating point, quality-measured.
    val sroot = "/tmp/graft_recall_sized_idx"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(sroot), true)
    val mod4 = pmod(col("vec_id"), lit(4))
    val idx = new graft.streaming.MaintainedAnnIndex(spark, sroot,
      flushEvery = 1, maxDeltas = 4)
    var sizedScreen = Map.empty[Long, Boolean]
    val sizedScreenNprobe = math.max(3, sNlist / 8)
    try {
      idx.initIndex(embAll.filter(mod4 < 2))
      idx.ingestBatch(embAll.filter(mod4 === 2), 0)(_ => ())
      idx.retrainModel(embAll.filter(mod4 < 3)) // sized defaults, corpus so far
      // the SemDeDup screen under the SIZED model (members = the x82
      // ground truth's mod4<3, queries = mod4==3, same threshold):
      // production screens run against a retrained sized index, so its
      // verdict quality belongs in the recurring probe next to the
      // demo-config x82 row printed below
      sizedScreen = idx.screenSemantic(embAll.filter(mod4 < 3),
          embAll.filter(mod4 === 3), AnnOracleSql.X82DistThreshold,
          nprobe = sizedScreenNprobe)
        .select(col("vec_id"), col("is_dup")).collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      idx.ingestBatch(embAll.filter(mod4 === 3), 1)(_ => ())
      recall("sized maintained tiered serve", pairs(
        idx.searchRerank(embAll, q20, kTop = 3, nprobe = 3,
          knownQueryCount = Some(20L))))
    } finally idx.close()

    // x82 semantic-screen verdict quality: the screen decides from the
    // probed-cell ADC shortlist's exact-reranked top-1; a true duplicate
    // whose nearest member hides in an unprobed cell (or outside the
    // shortlist) can be missed. Compare every verdict against the exact
    // nearest-indexed-neighbor threshold (brute force over all members —
    // the quality axis the hash oracle, which pins the ADC arithmetic
    // itself, deliberately does not measure).
    val emb = Tables.embeddings(spark, dir)
    val m4 = pmod(col("vec_id"), lit(4))
    val t = AnnOracleSql.X82DistThreshold
    val screened = graft.streaming.MaintainedAnnIndex
      .x82SemanticScreen(spark, dir)
      .select(col("vec_id"), col("is_dup")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val q = emb.filter(m4 === 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val d2 = aggregate(zip_with(col("embedding"), col("qe"),
      (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, v) => acc + v)
    val exactDup = emb.filter(m4 < 3).crossJoin(broadcast(q))
      .groupBy(col("qid")).agg(min(d2).as("mind"))
      .select(col("qid"), (round(col("mind"), 4) <= lit(t)).as("dup"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // a query the screen dropped (no candidates in its probed cells) is
    // novelty-by-absence — compare it as is_dup=false, the
    // screenAndAdmit coalesce convention, not as a disagreement
    val agree = exactDup.count { case (id, d) => screened.getOrElse(id, false) == d }
    val trueDups = exactDup.count(_._2)
    val caught = exactDup.count { case (id, d) => d && screened.getOrElse(id, false) }
    println(f"x82 screen (nprobe 3/8)      verdict agreement = ${agree.toDouble / exactDup.size}%.3f, dup recall = ${caught.toDouble / math.max(trueDups, 1)}%.3f (${exactDup.size} screened, $trueDups true dups)")
    // the same ground truth scores the SIZED screen (members and queries
    // match exactDup's split by construction)
    val sAgree = exactDup.count { case (id, d) => sizedScreen.getOrElse(id, false) == d }
    val sCaught = exactDup.count { case (id, d) => d && sizedScreen.getOrElse(id, false) }
    println(f"sized screen (nprobe $sizedScreenNprobe/$sNlist)  verdict agreement = ${sAgree.toDouble / exactDup.size}%.3f, dup recall = ${sCaught.toDouble / math.max(trueDups, 1)}%.3f")
    spark.stop()
  }
}
