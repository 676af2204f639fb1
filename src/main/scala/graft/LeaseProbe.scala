package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cross-PROCESS writer-lease probe (diagnostic, not part of the driver
  * contract): the in-JVM single-writer story is lock-serialized and
  * spec-pinned, but the cross-process contract — a second DRIVER pointed
  * at a live root — rests on the `_writer_lease` file + VersionPointer
  * seam alone. This probe turns that contract from documented to
  * measured by actually running a second JVM:
  *
  *  1. the parent seeds + ingests a maintained text index and HOLDS it;
  *  2. a child JVM (own SparkSession, own pid → foreign ownerId)
  *     attempts to open the same root → must be REJECTED at
  *     construction (the misconfigured-second-service failure mode);
  *  3. the parent ingests again (the live writer is unaffected by the
  *     rejected claim) and closes;
  *  4. a second child run now ACQUIRES the released lease, resumes the
  *     stored version via pointer discovery, and serves a search —
  *     the cross-process reopen-and-serve path (x92's topology, second
  *     process edition).
  *
  * Run from the repo root (the child reuses tools/runjava.sh):
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 tools/runjava.sh graft.LeaseProbe
  *
  * Prints PASS/FAIL per step; exits non-zero on any FAIL. */
object LeaseProbe {
  private def session(): SparkSession = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit =
    if (args.length >= 2 && args(0) == "--child") child(args(1))
    else if (args.length >= 2 && args(0) == "--reader") reader(args(1))
    else parent()

  /** Child mode: try to open `root`; print a single machine-readable
    * verdict line the parent greps. */
  private def child(root: String): Unit = {
    val spark = session()
    try {
      val idx = new graft.streaming.MaintainedTextIndex(spark, root, flushEvery = 1)
      try {
        val n = idx.search(graft.functions.Search.QueryTerms, 20).count()
        println(s"CHILD: LEASE_ACQUIRED version=${idx.stats("version")} " +
          s"deltas=${idx.stats("delta_versions")} served_rows=$n")
      } finally idx.close()
    } catch {
      case e: IllegalStateException if e.getMessage != null &&
          e.getMessage.contains("single-writer") =>
        println("CHILD: LEASE_REJECTED")
    } finally spark.stop()
  }

  /** Reader-child mode: open a lease-free READ-ONLY handle on `root` —
    * must succeed even while the parent HOLDS the writer lease — and
    * print the served snapshot (version, deltas, top-doc checksum) so the
    * parent can compare it against its own in-process serve. */
  private def reader(root: String): Unit = {
    val spark = session()
    try {
      val r = graft.streaming.MaintainedTextIndex.openReader(spark, root)
      val rows = r.search(graft.functions.Search.QueryTerms, 20).collect()
      val sum = LeaseProbe.rankChecksum(rows)
      println(s"READER: SERVED version=${r.stats("version")} " +
        s"deltas=${r.stats("delta_versions")} rows=${rows.length} sum=$sum")
    } catch {
      case e: Throwable =>
        println(s"READER: FAILED ${e.getClass.getSimpleName}: ${e.getMessage}")
    } finally spark.stop()
  }

  /** POSITION-WEIGHTED checksum of a served (doc_id, bm25, n_matched)
    * ranking — rank, id, rounded score, and match count all fold in, so
    * a reader that serves the right doc SET in the wrong order (or with
    * stale-stats scores) changes the sum; a commutative id-sum would
    * not. Shared by the parent and the reader child (same binary). */
  def rankChecksum(rows: Array[org.apache.spark.sql.Row]): Long =
    rows.zipWithIndex.foldLeft(0L) { case (acc, (x, i)) =>
      ((acc * 1000003L) ^
        (x.getLong(0) * 31L + math.round(x.getDouble(1) * 10000) * 7L +
          x.getInt(2))) + i
    }

  private def runChild(root: String): String = runSub("--child", "CHILD:", root)
  private def runReader(root: String): String = runSub("--reader", "READER:", root)

  private def runSub(mode: String, tag: String, root: String): String = {
    val pb = new ProcessBuilder("bash", "tools/runjava.sh",
      "graft.LeaseProbe", mode, root)
    pb.redirectErrorStream(true)
    val p = pb.start()
    // drain stdout on a side thread and bound the wait: a child JVM
    // wedged at session startup must FAIL the probe, not hang it forever
    val buf = new java.io.ByteArrayOutputStream()
    val drain = new Thread(() => p.getInputStream.transferTo(buf), "leaseprobe-drain")
    drain.setDaemon(true); drain.start()
    val finished = p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) p.destroyForcibly().waitFor()
    drain.join(5000)
    val out = new String(buf.toByteArray, "UTF-8")
    if (!finished) s"$tag TIMEOUT\n--- child output tail ---\n${out.takeRight(2000)}"
    else out.linesIterator.find(_.startsWith(tag)).getOrElse(
      s"$tag NO_VERDICT\n--- child output tail ---\n${out.takeRight(2000)}")
  }

  private def parent(): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = session()
    val root = java.nio.file.Files.createTempDirectory("graft_leaseprobe_").toString
    var failures = 0
    def check(name: String, ok: Boolean, detail: String = ""): Unit = {
      println(s"${if (ok) "PASS" else "FAIL"}  $name${if (detail.nonEmpty) s"  [$detail]" else ""}")
      if (!ok) failures += 1
    }
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val idx = new graft.streaming.MaintainedTextIndex(spark, root,
      flushEvery = 1, maxDeltas = 2)
    // the parent's own serve, in the reader-child's verdict format — the
    // cross-process reader must reproduce it exactly
    def servedLine(): String = {
      val rows = idx.search(graft.functions.Search.QueryTerms, 20).collect()
      val sum = LeaseProbe.rankChecksum(rows)
      s"READER: SERVED version=${idx.stats("version")} " +
        s"deltas=${idx.stats("delta_versions")} rows=${rows.length} sum=$sum"
    }
    try {
      idx.initIndex(docs.filter(pmod(col("doc_id"), lit(4)) < 2))
      idx.ingestBatch(docs.filter(pmod(col("doc_id"), lit(4)) === 2), 0)(_ => ())
      val v1 = runChild(root)
      check("second JVM rejected while the lease is live", v1 == "CHILD: LEASE_REJECTED", v1)
      // a second-JVM READ-ONLY handle serves the exact committed state
      // WHILE the lease is held — the one-writer-N-readers deployment
      val want1 = servedLine()
      val r1 = runReader(root)
      check("second JVM READER serves under the live lease", r1 == want1,
        s"got '$r1', want '$want1'")
      // the live writer is unaffected by the rejected claim (or the reader)
      idx.ingestBatch(docs.filter(pmod(col("doc_id"), lit(4)) === 3), 1)(_ => ())
      check("holder still writes after the rejected foreign claim",
        idx.stats("delta_versions") == 2L, s"deltas=${idx.stats("delta_versions")}")
      // cross-process freshness: a NEW reader run sees the new delta pair
      // (per-read snapshot re-resolution, no writer involvement)
      val want2 = servedLine()
      val r2 = runReader(root)
      check("second JVM READER sees the post-ingest state during live writing",
        r2 == want2, s"got '$r2', want '$want2'")
    } finally idx.close()
    val expect = {
      val r = new graft.streaming.MaintainedTextIndex(spark, root, flushEvery = 1)
      try (r.stats("version"), r.stats("delta_versions"),
        r.search(graft.functions.Search.QueryTerms, 20).count())
      finally r.close()
    }
    val v2 = runChild(root)
    check("second JVM acquires after release and serves the stored state",
      v2 == s"CHILD: LEASE_ACQUIRED version=${expect._1} deltas=${expect._2} served_rows=${expect._3}",
      s"got '$v2', want version=${expect._1} deltas=${expect._2} rows=${expect._3}")
    spark.stop()
    if (failures > 0) sys.exit(1)
    println("LeaseProbe: all checks passed")
  }
}
