package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
    import graft.functions.Dedup
    val docs = Tables.documents(spark, sfDir)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // generic gate-recording measurement: any arg naming a declared query
    // runs it 3× (BASELINE.md's min-of-uncontended derivation)
    val declared = args.filter(SparkEntry.queries.contains)
    if (declared.nonEmpty) {
      for (name <- declared; i <- 1 to 3)
        time(s"$name run $i")(noop(SparkEntry.queries(name)(spark, sfDir)))
      spark.stop(); return
    }

    if (args.contains("u10")) {
      // gate-recording measurement for u10 (BASELINE.md)
      for (i <- 1 to 3)
        time(s"u10 utf8 bm25 run $i")(noop(
          graft.functions.Text.u10Utf8Bm25(spark, sfDir)))
      spark.stop(); return
    }

    if (args.contains("x81")) {
      // BASELINE-recording measurement for the x81 maintained-hybrid slice
      for (i <- 1 to 3)
        time(s"x81 maintained hybrid rrf run $i")(noop(
          graft.streaming.HybridRetrieval.x81MaintainedHybridRrf(spark, sfDir)))
      spark.stop(); return
    }

    if (args.contains("x83")) {
      // gate-recording measurement for the x83 declared slice (BASELINE.md)
      for (i <- 1 to 3)
        time(s"x83 admission screen run $i")(noop(
          graft.streaming.MaintainedAnnIndex.x83AdmissionScreen(spark, sfDir)))
      spark.stop(); return
    }
    if (args.contains("x82")) {
      // gate-recording measurement for the x82 declared slice (BASELINE.md)
      for (i <- 1 to 3)
        time(s"x82 semantic screen run $i")(noop(
          graft.streaming.MaintainedAnnIndex.x82SemanticScreen(spark, sfDir)))
      spark.stop(); return
    }
    if (args.contains("x80")) {
      // gate-recording measurement for the x80 declared slice (see
      // BASELINE.md): seed train+encode + 2-window ingest + ADC search
      for (i <- 1 to 3)
        time(s"x80 incremental ivfadc run $i")(noop(
          graft.streaming.MaintainedAnnIndex.x80IncrementalIvfadc(spark, sfDir)))
      spark.stop(); return
    }

    if (args.contains("x79phase")) {
      // phase decomposition of the x79 lifecycle (round-20 optimization)
      import org.apache.spark.sql.functions.{col, pmod, lit}
      for (i <- 1 to 2) {
        val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        val root = java.nio.file.Files.createTempDirectory("graft_x79ph_").toString
        val idx = new graft.streaming.MaintainedTextIndex(spark, root,
          flushEvery = 1, maxDeltas = 2)
        time(s"run $i initIndex")(idx.initIndex(docs.filter(pmod(col("doc_id"), lit(4)) < 2)))
        time(s"run $i ingest 0")(idx.ingestBatch(docs.filter(pmod(col("doc_id"), lit(4)) === 2), 0)(_ => ()))
        time(s"run $i ingest 1")(idx.ingestBatch(docs.filter(pmod(col("doc_id"), lit(4)) === 3), 1)(_ => ()))
        time(s"run $i search")(noop(idx.search(graft.functions.Search.QueryTerms, 20)))
        idx.close()
      }
      spark.stop(); return
    }

    if (args.contains("x83phase")) {
      // phase decomposition of the x83 admission loop (round-20)
      import org.apache.spark.sql.functions.{col, pmod, lit}
      val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(j.jobId, (j.time, String.valueOf(j.properties.getProperty("spark.job.description"))))
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val st = jobs.get(j.jobId)
          if (st != null) println(f"  [job ${j.jobId}%3d] ${(j.time - st._1) / 1000.0}%6.2f s  ${st._2.take(90)}")
        }
      })
      for (i <- 1 to 2) {
        val emb = Tables.embeddings(spark, sfDir)
        val m8 = pmod(col("vec_id"), lit(8))
        val root = java.nio.file.Files.createTempDirectory("graft_x83ph_").toString
        val idx = new graft.streaming.MaintainedAnnIndex(spark, root,
          flushEvery = 1, maxDeltas = 0)
        val seed = emb.filter(m8 < 4)
        time(s"run $i initIndex")(idx.initIndex(seed))
        val t = graft.AnnOracleSql.X82DistThreshold
        val batchA = emb.filter(m8.isin(4, 5))
        time(s"run $i screenAndAdmit A")(
          idx.screenAndAdmit(seed, batchA, t, nprobe = 3, 0L)(
            _.write.parquet(s"$root/va_scratch")))
        val va = spark.read.parquet(s"$root/va_scratch")
        val novelA = batchA.join(
          va.filter(col("is_dup")).select(col("vec_id")), Seq("vec_id"), "left_anti")
        time(s"run $i screenAndAdmit B")(
          idx.screenAndAdmit(seed.unionByName(novelA), emb.filter(m8.isin(6, 7)),
            t, nprobe = 3, 1L)(_.write.parquet(s"$root/vb_scratch")))
        val vb = spark.read.parquet(s"$root/vb_scratch")
        time(s"run $i counts+assert")({
          val expected = seed.count() + novelA.count() +
            vb.filter(!col("is_dup")).count()
          val stored = idx.currentCodes.count()
          require(stored == expected)
        })
        time(s"run $i final union")(noop(
          va.withColumn("batch", lit(0)).unionByName(vb.withColumn("batch", lit(1)))
            .select(col("batch"), col("vec_id"), col("nearest_id"),
              col("dist"), col("is_dup"))
            .orderBy(col("batch"), col("vec_id"))))
        idx.close()
      }
      spark.stop(); return
    }

    if (args.contains("x83probe")) {
      // sub-decomposition of one x83 screen (round-20)
      import org.apache.spark.sql.functions.{col, pmod, lit}
      val emb = Tables.embeddings(spark, sfDir)
      val m8 = pmod(col("vec_id"), lit(8))
      val root = java.nio.file.Files.createTempDirectory("graft_x83pr_").toString
      val idx = new graft.streaming.MaintainedAnnIndex(spark, root,
        flushEvery = 1, maxDeltas = 0)
      val seed = emb.filter(m8 < 4)
      idx.initIndex(seed)
      val batchA = emb.filter(m8.isin(4, 5))
      for (i <- 1 to 2) {
        time(s"run $i adc search only (k=8)")(noop(
          idx.search(batchA, kTop = 8, nprobe = 3)))
        time(s"run $i searchRerank (k=1)")(noop(
          idx.searchRerank(seed, batchA, kTop = 1, nprobe = 3)))
        time(s"run $i screenSemantic")(noop(
          idx.screenSemantic(seed, batchA,
            graft.AnnOracleSql.X82DistThreshold, nprobe = 3)))
      }
      idx.close()
      spark.stop(); return
    }

    if (args.contains("x83stage")) {
      // round-21: per-stage task-count/duration dump for one ADC search at
      // the probe scale — find the stage that refuses to parallelize
      import org.apache.spark.scheduler._
      import org.apache.spark.sql.functions.{col, pmod, lit}
      val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Int, Long, Long)]()
      val taskMax = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      val taskSum = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          stages.put(si.stageId, (si.name.take(60), si.numTasks,
            taskMax.getOrDefault(si.stageId, 0L), taskSum.getOrDefault(si.stageId, 0L)))
        }
        override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
          val d = te.taskInfo.duration
          taskMax.merge(te.stageId, d, (a, b) => math.max(a, b))
          taskSum.merge(te.stageId, d, _ + _)
        }
      })
      val emb = Tables.embeddings(spark, sfDir)
      val m8 = pmod(col("vec_id"), lit(8))
      val root = java.nio.file.Files.createTempDirectory("graft_x83st_").toString
      val idx = new graft.streaming.MaintainedAnnIndex(spark, root,
        flushEvery = 1, maxDeltas = 0)
      idx.initIndex(emb.filter(m8 < 4))
      stages.clear(); taskMax.clear(); taskSum.clear()
      val sdf = idx.search(emb.filter(m8.isin(4, 5)), kTop = 8, nprobe = 3)
      time("adc search (k=8)")(noop(sdf))
      println(sdf.queryExecution.executedPlan.toString.take(8000))
      Thread.sleep(2000)
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(-_._2._4).take(12).foreach { case (id, (nm, nt, mx, sm)) =>
        println(f"stage $id%5d tasks=$nt%4d taskSumMs=$sm%8d taskMaxMs=$mx%7d  $nm")
      }
      idx.close()
      spark.stop(); return
    }

    if (args.contains("cacheprobe")) {
      // round-21: does InMemoryTableScan propagate a cached repartition's
      // hashpartitioning to consumers (groupBy on key / superset / join)?
      val df = spark.range(0, 1000000)
        .select((col("id") % 1000).as("k"), col("id").as("v"))
        .repartition(col("k")).persist(StorageLevel.MEMORY_AND_DISK)
      df.count()
      def exch(d: org.apache.spark.sql.DataFrame, tag: String): Unit = {
        noop(d)
        val s = d.queryExecution.executedPlan.toString
        println(s"$tag: exchanges=${s.split("\n").count(_.contains("Exchange"))}")
        s.split("\n").filter(_.contains("Exchange")).foreach(l => println("  " + l.trim.take(120)))
      }
      exch(df.groupBy("k").agg(count(lit(1))), "groupBy(k) over cached-repart(k)")
      exch(df.groupBy("k", "v").agg(count(lit(1))), "groupBy(k,v) over cached-repart(k)")
      exch(df.groupBy("k").agg(countDistinct(col("v"))), "countDistinct over cached-repart(k)")
      df.unpersist()
      spark.stop(); return
    }

    if (args.contains("hofprobe")) {
      // round-21: per-row text-primitive costs over the sf0.1 corpus —
      // which interpreted HOF (if any) is worth a native expression
      import graft.functions.Text
      val d = Tables.documents(spark, sfDir)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("text"))
      val stop = Seq("the", "a", "and", "of", "to", "in")
      for (i <- 1 to 3) {
        time(s"run $i tokenize only")(noop(
          d.select(col("doc_id"), Text.tokens(col("text")).as("t"))))
        time(s"run $i tokenize+shingles")(noop(
          d.select(col("doc_id"), Text.shingles(Text.tokens(col("text"))).as("tg"))))
        time(s"run $i tokenize+stopratio")(noop(
          d.select(col("doc_id"), {
            val toks = Text.tokens(col("text"))
            when(size(toks) > 0,
              size(filter(toks, t => t.isin(stop.map(x => x: Any): _*)))
                / size(toks)).otherwise(lit(0.0)).as("r")
          })))
        time(s"run $i fingerprint")(noop(
          d.select(col("doc_id"),
            md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))))
        time(s"run $i full md5 signatures")(noop(
          graft.functions.Dedup.minhashSignatures(d)))
        time(s"run $i full xxh64 signatures")(noop(
          graft.functions.Dedup.minhashSignaturesFast(d)))
      }
      spark.stop(); return
    }

    if (args.contains("x71phase")) {
      // round-21: phase decomposition of x71 (warm = min-of-attempts shape:
      // the bench's second attempt reuses the session signature/shingle
      // caches, so time each stage warm after one full cold run)
      import graft.functions.{Curation, Dedup}
      val tag = s"$sfDir|x71survivors"
      time("cold full x71")(noop(Curation.x71PretrainPipeline(spark, sfDir)))
      for (i <- 1 to 2) {
        val f = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"), col("text"),
          graft.functions.Text.fingerprint(col("text")).as("fp"),
          coalesce(size(graft.functions.Text.tokens(col("text"))), lit(0))
            .cast("long").as("n_tokens"))
        val gated = f.filter(col("n_tokens") >= Curation.MinTokens)
        val kept1 = gated
          .withColumn("keep_id", min(col("doc_id")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("fp")))
          .filter(col("doc_id") === col("keep_id"))
        time(s"run $i kept1 (gate+fp window)")(noop(kept1))
        val sig = Dedup.signaturesFor(spark, kept1.select(col("doc_id"), col("text")), tag)
        val tg = Dedup.shinglesFor(spark, kept1.select(col("doc_id"), col("text")), tag)
        time(s"run $i candidates (LSH)")(noop(Dedup.nearDupPairsFromSignatures(sig)))
        val ver = Dedup.verifiedNearDups(sig, tg)
        time(s"run $i verified pairs")(noop(ver))
        time(s"run $i connected components")(noop(Dedup.connectedComponents(ver)))
        time(s"run $i full x71 (warm)")(noop(Curation.x71PretrainPipeline(spark, sfDir)))
      }
      spark.stop(); return
    }

    if (args.contains("topkprobe")) {
      // round-21: window row_number vs native TopKPairs over the IDENTICAL
      // scored relation, two regimes:
      //  (a) bench shape — many groups (2.5k queries), ~2k candidates each
      //  (b) corpus shape — few groups (64 queries), 600k candidates each
      //     (the true-scale serve: the window must exchange+sort the whole
      //      scored relation; the aggregate ships O(q·k))
      import org.apache.spark.sql.expressions.Window
      graft.plans.GraftExtensions.register(spark)
      def bed(nq: Int, ncand: Int) = {
        val df = spark.range(0, nq.toLong * ncand, 1, 32)
          .select((col("id") % nq).as("query_id"),
            floor(col("id") / nq).cast("long").as("neighbor_id"),
            round(pmod(col("id") * 2654435761L, lit(1000003)) / 1000.0, 4).as("adist"))
        df.localCheckpoint(true)
      }
      for ((nq, ncand, k) <- Seq((2500, 2000, 8), (64, 600000, 8))) {
        val scored = bed(nq, ncand)
        for (i <- 1 to 2) {
          time(s"nq=$nq ncand=$ncand run $i WINDOW") {
            val w = Window.partitionBy("query_id")
              .orderBy(col("adist"), col("neighbor_id"))
            noop(scored.withColumn("rk", row_number().over(w))
              .filter(col("rk") <= k))
          }
          time(s"nq=$nq ncand=$ncand run $i TOPKAGG") {
            noop(graft.functions.TopK.perGroup(
              scored, "query_id", "adist", "neighbor_id", k))
          }
        }
      }
      spark.stop(); return
    }

    if (args.contains("x79")) {
      // gate-recording measurement for the x79 declared slice (see
      // BASELINE.md): the full seed + 2-window ingest + tiered search
      time("x79 incremental bm25 (full declared slice)")(noop(
        graft.streaming.MaintainedTextIndex.x79IncrementalBm25(spark, sfDir)))
      time("x79 incremental bm25 2nd")(noop(
        graft.streaming.MaintainedTextIndex.x79IncrementalBm25(spark, sfDir)))
      time("x79 incremental bm25 3rd")(noop(
        graft.streaming.MaintainedTextIndex.x79IncrementalBm25(spark, sfDir)))
      spark.stop(); return
    }

    // fast (xxhash64) minhash decomposition at the probe scale
    time("fast signatures alone")(noop(Dedup.minhashSignaturesFast(docs)))
    time("fast signatures alone 2nd")(noop(Dedup.minhashSignaturesFast(docs)))
    val sigP = Dedup.minhashSignaturesFast(docs).persist(StorageLevel.MEMORY_AND_DISK)
    time("fast signatures persist")(noop(sigP))
    time("pairs from persisted fast sigs")(noop(Dedup.nearDupPairsFromSignatures(sigP)))
    time("pairs uncached fast (probe shape)")(noop(Dedup.nearDupCandidatesFast(docs)))
    sigP.unpersist()

    // md5 decomposition for contrast
    time("md5 signatures alone")(noop(Dedup.minhashSignatures(docs)))
    val sigM = Dedup.minhashSignatures(docs).persist(StorageLevel.MEMORY_AND_DISK)
    time("md5 signatures persist")(noop(sigM))
    time("pairs from persisted md5 sigs")(noop(Dedup.nearDupPairsFromSignatures(sigM)))
    sigM.unpersist()
    spark.stop()
  }
}
