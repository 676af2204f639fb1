package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: print the changelog admission atoms (groups + pages) of a
  * staged coalesced copy of an events table — run with
  * `tools/runjava.sh graft.tools.AtomDebug <sfDir>`. */
object AtomDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = java.nio.file.Files.createTempDirectory("atom_dbg").toString
    spark.read.parquet(s"$sfDir/events.parquet").select(col("event_id"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(path)
    val cfg = graft.sources.ChangelogConfig(path, "event_id", "props", Long.MaxValue, 4)
    val metas = graft.sources.ChangelogSource.fileMetas(cfg)
    metas.foreach { m =>
      println(s"file=${m.path} groups=${m.groups.length}")
      m.groups.foreach { g =>
        println(s"  group [${g.minOff},${g.maxOff}] rows=${g.rows} pages=${g.pages.length}")
        g.pages.take(5).foreach(p => println(s"    page [${p.minOff},${p.maxOff}] rows=${p.rows}"))
      }
    }
    spark.stop()
  }
}
