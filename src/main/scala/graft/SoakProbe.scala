package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Endurance/chaos probe (diagnostic, not part of the driver contract):
  * drives [[graft.streaming.Soak.textSoak]] — N randomized windows of
  * ingest / delete / flush / shadow-major / reopen with kill injections
  * at the commit seams — and reports the op census. The seed is printed
  * FIRST so any failure replays exactly.
  *
  * Run from the repo root:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 tools/runjava.sh \
  *     graft.SoakProbe [windows] [seed]
  *       [text|ann|dedup|neardup|curation|retrieval|assembled|assembledretrieval]
  *
  * Defaults: 40 windows, a time-derived seed (pass one to replay), the
  * text pillar. The CI-pinned fixed-seed runs live in RoundEighteenSpec. */
object SoakProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val windows = args.headOption.flatMap(_.toIntOption).getOrElse(40)
    val seed = args.drop(1).headOption.flatMap(_.toLongOption)
      .getOrElse(System.nanoTime())
    val pillar = args.drop(2).headOption.getOrElse("text")
    println(s"SoakProbe: pillar=$pillar windows=$windows seed=$seed sf=$dir (replay: " +
      s"tools/runjava.sh graft.SoakProbe $windows $seed $pillar)")
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft_soak_").toString
    val t0 = System.nanoTime()
    try {
      val res =
        if (pillar == "ann")
          graft.streaming.Soak.annSoak(spark, Tables.embeddings(spark, dir),
            root, seed, windows, progress = m => println(s"  [soak] $m"))
        else if (pillar == "dedup")
          graft.streaming.Soak.dedupSoak(spark,
            Tables.documents(spark, dir).select(col("doc_id"), col("text")),
            root, seed, windows, progress = m => println(s"  [soak] $m"))
        else if (pillar == "retrieval")
          graft.streaming.Soak.retrievalSoak(spark,
            Tables.documents(spark, dir).select(col("doc_id"), col("text")),
            root, seed, windows, progress = m => println(s"  [soak] $m"))
        else if (pillar == "curation")
          graft.streaming.Soak.curationSoak(spark, root, seed, windows,
            progress = m => println(s"  [soak] $m"))
        else if (pillar == "assembled")
          graft.streaming.Soak.assembledSoak(spark, root, seed, windows,
            progress = m => println(s"  [soak] $m"))
        else if (pillar == "assembledretrieval")
          graft.streaming.Soak.assembledRetrievalSoak(spark, root, seed, windows,
            progress = m => println(s"  [soak] $m"))
        else if (pillar == "neardup")
          graft.streaming.Soak.nearDupSoak(spark,
            Tables.documents(spark, dir).select(col("doc_id"), col("text")),
            root, seed, windows, progress = m => println(s"  [soak] $m"))
        else
          graft.streaming.Soak.textSoak(spark,
            Tables.documents(spark, dir).select(col("doc_id"), col("text")),
            root, seed, windows, progress = m => println(s"  [soak] $m"))
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"SoakProbe PASS: ${res.windows} windows, " +
        s"${res.parityChecks} parity checks, ${math.round(secs)} s, " +
        s"census=${res.opCounts.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(",")}")
    } catch {
      case e: Throwable =>
        println(s"SoakProbe FAIL (seed=$seed): ${e.getMessage}")
        spark.stop()
        sys.exit(1)
    }
    spark.stop()
  }
}
