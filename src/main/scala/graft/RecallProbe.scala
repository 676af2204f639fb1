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
    // recall against an EXPLICIT ground truth (the decomposition rows
    // compare against members-only or full-corpus exact as appropriate)
    def recallVs(name: String, ground: Set[(Long, Long)],
                 approx: Set[(Long, Long)]): Unit =
      println(f"$name%-44s recall@3 = ${approx.intersect(ground).size.toDouble / ground.size}%.3f")
    try {
      idx.initIndex(embAll.filter(mod4 < 2))
      idx.ingestBatch(embAll.filter(mod4 === 2), 0)(_ => ())
      idx.retrainModel(embAll.filter(mod4 < 3)) // sized defaults, corpus so far
      // ---- tiered-serve recall DECOMPOSITION (round-17: the sf0.1
      // 0.750-tiered vs 0.950-batch gap, stage-isolated). Stage A: serve
      // immediately after the retrain with NO live delta, against exact
      // restricted to the index's members (mod4 < 3) — isolates the
      // serve machinery (tier resolution absent, retrain-encoded base
      // only). Stage B (after the ingest below): the standard tiered row
      // vs full-corpus exact. Stage C: the same TRAINING SET as the
      // index's model but the plain batch topology (no index, full
      // corpus encoded in one pass) — isolates model coverage (trained
      // on 75% of the corpus vs the batch row's 100%). Stage D: nprobe
      // sweep on the tiered serve — isolates probe depth.
      val exactMembers = pairs(graft.functions.Similarity.annBruteForce(
        embAll.filter(mod4 < 3), q20, 3))
      recallVs("decomp A: post-retrain serve, no delta (vs members-exact)",
        exactMembers,
        pairs(idx.searchRerank(embAll, q20, kTop = 3, nprobe = 3,
          knownQueryCount = Some(20L))))
      sizedScreen = idx.screenSemantic(embAll.filter(mod4 < 3),
          embAll.filter(mod4 === 3), AnnOracleSql.X82DistThreshold,
          nprobe = sizedScreenNprobe)
        .select(col("vec_id"), col("is_dup")).collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      idx.ingestBatch(embAll.filter(mod4 === 3), 1)(_ => ())
      recall("sized maintained tiered serve", pairs(
        idx.searchRerank(embAll, q20, kTop = 3, nprobe = 3,
          knownQueryCount = Some(20L))))
      for (np <- Seq(math.max(6, sNlist / 16), math.max(8, sNlist / 8)))
        recall(f"decomp D: tiered serve, nprobe $np%d", pairs(
          idx.searchRerank(embAll, q20, kTop = 3, nprobe = np,
            knownQueryCount = Some(20L))))
      // freshness-aware serve (round 18): the two §14 levers wired — the
      // drift gauge (window vs base assign-sim after the stale-model
      // ingest above) decides per serve whether to widen the probe depth
      // to decomp D's recovery point; this row is the recovered operating
      // point a maintainer ACTUALLY serves between drift-fire and
      // retrain-land
      recall(f"freshness-aware serve (drift=${idx.stats("drift_micro")}µ, " +
        f"boost nprobe 3→${math.max(8, sNlist / 8)}%d)", pairs(
        idx.searchRerankFresh(embAll, q20, kTop = 3, nprobe = 3,
          driftThresholdMicro = 0L, boostedNprobe = math.max(8, sNlist / 8),
          knownQueryCount = Some(20L))))
      println(s"  (boosted_serves=${idx.stats("boosted_serves")} — 1 when the gauge fired)")
    } finally idx.close()
    // Stage C — model coverage only: the index retrain's EXACT budget
    // (sized from the 75% training slice, not the full corpus — √(0.75N)
    // cells), trained on the same slice, but served via the plain batch
    // topology over the full corpus (one encode pass, no tiers). If this
    // row matches the tiered serve, the gap is the model/budget, not the
    // index machinery.
    val n75 = embAll.filter(mod4 < 3).count()
    val nl75 = graft.streaming.MaintainedAnnIndex.sizedNlist(n75)
    val (m75m, m75k) = graft.streaming.MaintainedAnnIndex.sizedPq(dim, n75)
    val m75 = Ivfadc.train(embAll.filter(mod4 < 3), nlist = nl75, m = m75m, k = m75k)
    recall(s"decomp C: batch @ retrain budget ($nl75 cells, ($m75m,$m75k) pq)", pairs(
      Ivfadc.searchRerank(embAll, Ivfadc.encode(embAll, m75), q20, m75,
        k = 3, nprobe = 3, knownQueryCount = Some(20L))))

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
