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

  /** Survivor-quotient PageRank: exact-dedup the embedding relation FIRST
    * (one representative per distinct vector, with the family size `m`),
    * generate near-dup pairs over SURVIVORS only, and run the power
    * iteration on the family quotient graph with multiplicities — then
    * expand ranks back to every member id.
    *
    * This is exact, not approximate: clones (identical vectors) share a
    * bucket, pair with each other (cosine 1.0) and with exactly the same
    * external neighbors at exactly the same scores, so every clone of a
    * family has the same full-graph rank by symmetry, and the full-graph
    * iteration collapses to the quotient recurrence
    * `r_i ← (1−d)/n + d·[(m_i−1)·r_i/deg_i + Σ_{j~i} m_j·r_j/deg_j]`
    * with `deg_i = (m_i−1) + Σ_{j~i} m_j` and `n = Σ m_i` over families
    * with at least one (self- or cross-) edge. Self-edges carry weight
    * `m_i−1`; cross contributions carry the SOURCE family's size. On a
    * clone-free corpus every m = 1, the self-edges vanish, the per-edge
    * coefficient is `(rank/deg)·1.0` (an exact identity), and the result
    * is bit-identical to [[pageRank]] over the full pair relation.
    *
    * Scale shape — this is the x71 survivor-ordering lesson applied to
    * the graph family: the within-bucket pair join is quadratic in bucket
    * occupancy, so clone-dense corpora (the boilerplate/template case
    * that near-dup graphs exist for) explode the FULL-graph form's
    * candidate bill, while the quotient form pays |distinct|² and a
    * node-sized multiplicity bookkeeping. The expansion back to members
    * is one broadcast-sized join. */
  def pageRankQuotient(emb: DataFrame,
                       threshold: Double = Dedup.EmbeddingNearDupThreshold,
                       iters: Int = PrIters,
                       damping: Double = Damping): DataFrame = {
    val fam = emb.groupBy(col("embedding"))
      .agg(min(col("vec_id")).as("rep"), count(lit(1)).as("m"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val survivors = fam.select(col("rep").as("vec_id"), col("embedding"))
    val pairs = Dedup.embeddingNearDups(survivors, threshold)
    val fm = fam.select(col("rep"), col("m"))
    // directed contribution edges (src, dst, w): cross edges weighted by
    // the SOURCE family size, self-edges by m−1 (the in-family clique)
    val cross = pairs.select(col("v1").as("src"), col("v2").as("dst"))
      .union(pairs.select(col("v2").as("src"), col("v1").as("dst")))
      .join(fm.select(col("rep").as("src"), col("m").as("w")), Seq("src"))
    // a family's in-clique edges exist in the FULL graph only if the
    // clone-pair score passes the full form's threshold filter; gating the
    // self-edge on the SAME expression reproduces that filter exactly,
    // degenerate inputs included: cosine(v, v) is 1.0 for a real vector,
    // NaN for a zero vector (and Spark SQL sorts NaN above every number,
    // so NaN >= t PASSES — zero-vector clone families DO become ranked
    // nodes, in both forms; SurvivorFormSpec pins this), and NULL for a
    // null/mismatched-dim embedding, whose families alone drop out
    // (null >= t is false)
    val self = fam.filter(col("m") >= 2)
      .filter(round(Similarity.cosineNative(col("embedding"), col("embedding")), 4)
        >= threshold)
      .select(col("rep").as("src"), col("rep").as("dst"),
        (col("m") - 1).as("w"))
    val edges = cross.select(col("src"), col("dst"), col("w").cast("double").as("w"))
      .union(self.select(col("src"), col("dst"), col("w").cast("double").as("w")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // deg of any clone in family f = Σ w over edges INTO f
    val deg = edges.groupBy(col("dst").as("node")).agg(sum(col("w")).as("deg"))
    val nodes = edges.select(col("dst").as("node")).distinct()
      .join(fm.select(col("rep").as("node"), col("m")), Seq("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // control-plane scalar; coalesce covers the empty-graph case (no
    // nodes → n = 0 → empty result, like the full form's nodes.count())
    val n = nodes.agg(coalesce(sum(col("m")), lit(0L))).collect()(0).getLong(0)
    var ranks = nodes.select(col("node")).withColumn("rank", lit(1.0 / n))
    (0 until iters).foreach { _ =>
      val inflow = edges
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg.select(col("node").as("src"), col("deg")), Seq("src"))
        .select(col("dst").as("node"), ((col("rank") / col("deg")) * col("w")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      ranks = nodes.select(col("node")).join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit((1 - damping) / n) +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
    }
    // materialize the node-sized rank table, then release the iteration's
    // persisted relations — without this every call leaks three cached
    // relations for the life of the session (Bpe.train's per-round
    // persist/unpersist discipline, applied at whole-loop granularity)
    val finalRanks = ranks.localCheckpoint()
    fam.unpersist()
    edges.unpersist()
    nodes.unpersist()
    // expand family ranks to every member vec_id (fam recomputes — one
    // groupBy over the vector relation, the price of not holding the cache)
    val members = emb.join(fam.select(col("embedding"), col("rep")), Seq("embedding"))
      .select(col("vec_id"), col("rep").as("node"))
    finalRanks.join(members, Seq("node"))
      .select(col("vec_id"), round(col("rank"), 4).as("rank"))
      .orderBy(col("vec_id"))
  }

  /** x51 — dup-graph centrality: PageRank over the x10 embedding near-dup
    * pair relation, in the survivor-quotient form ([[pageRankQuotient]] —
    * exact-dedup first, quotient iteration, member expansion). */
  def x51DupPagerank(s: SparkSession, dir: String): DataFrame =
    pageRankQuotient(embeddings(s, dir))
}
