package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables._

/** Graph analytics over the near-duplicate pair relation — the second
  * graph-shaped operator family next to x26's connected components.
  *
  * PageRank centrality over the dup graph ranks each document's
  * "connectedness" inside its duplicate neighborhood: curation pipelines
  * use it to pick the most-central representative of a near-dup cluster
  * (instead of x26's min-id convention) and to flag template/boilerplate
  * hubs that near-match MANY documents without being exact duplicates of
  * any.
  *
  * Scale shape: the edge relation is the LSH-pruned pair set — orders of
  * magnitude smaller than the corpus — persisted once and shuffled per
  * round only on its own keys; ranks are node-sized. The iteration count
  * is a FIXED small constant (3), so the oracle can unroll the same three
  * rounds as SQL CTEs and the plan depth is bounded (no lineage growth
  * concern at this depth; x26's localCheckpoint discipline applies only to
  * its data-dependent loop).
  *
  * Determinism: every per-round op is an IEEE double +,*,/ mirrored
  * operation-for-operation in the oracle ((1−d)/n computed as written, not
  * folded to a decimal literal — 1−0.85 is 0.15000000000000002 in
  * binary64, which `0.15` would NOT reproduce).
  */
object GraphOps {

  /** Fixed power-iteration rounds for the declared query (unrolled in the
    * oracle — keep the two in sync). */
  val PrIters = 3

  /** Standard damping factor. */
  val Damping = 0.85

  /** Undirected PageRank over a (v1, v2) pair relation. Returns every node
    * that appears in at least one pair with its rank after [[PrIters]]
    * rounds, rounded to 4. All nodes have degree ≥ 1 by construction, so
    * there is no dangling-mass term. */
  def pageRank(pairs: DataFrame, iters: Int = PrIters,
               damping: Double = Damping): DataFrame = {
    val edges = pairs.select(col("v1").as("src"), col("v2").as("dst"))
      .union(pairs.select(col("v2").as("src"), col("v1").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nodes = edges.select(col("src").as("node")).distinct()
    val n = nodes.count() // control-plane scalar (node count, not corpus)
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    (0 until iters).foreach { _ =>
      val inflow = edges
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      ranks = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit((1 - damping) / n) +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
    }
    ranks.select(col("node").as("vec_id"), round(col("rank"), 4).as("rank"))
      .orderBy(col("vec_id"))
  }

  /** x51 — dup-graph centrality: PageRank over the x10 embedding near-dup
    * pair relation. */
  def x51DupPagerank(s: SparkSession, dir: String): DataFrame =
    pageRank(Dedup.embeddingNearDups(embeddings(s, dir),
      threshold = Dedup.EmbeddingNearDupThreshold))
}
