package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway-style DIAGNOSTIC main for the x100 assembled-curation row
  * (kept: the AtomDebug convention — a read-only lens over a declared
  * query's intermediate state, never on any serve path). Runs the same
  * scenario as [[graft.streaming.CurationService.x100AssembledCuration]]
  * step by step with the intermediate sets printed, then diffs the final
  * reduction against the batch x71 recompute. */
object X100Debug {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val s = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val out = graft.streaming.CurationService.x100AssembledCuration(s, dir)
    val truth = graft.functions.Curation.x71PretrainPipeline(s, dir)
    val got = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val docs = graft.Tables.documents(s, dir).agg(min(col("doc_id")), max(col("doc_id")))
      .collect().head
    val (lo, hi) = (docs.getLong(0), docs.getLong(1))
    val mid = graft.streaming.CurationService.takedownMid(lo, hi)
    val want = truth.select("doc_id").collect().map(_.getLong(0))
      .map(id => if (id < mid) id + graft.streaming.CurationService.CloneOffset else id)
      .toSet
    println(s"X100DBG got=${got.size} want=${want.size}")
    println(s"X100DBG missing=${(want -- got).toSeq.sorted.take(20)}")
    println(s"X100DBG extra=${(got -- want).toSeq.sorted.take(20)}")
    s.stop()
  }
}
