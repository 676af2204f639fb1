package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** k-nearest-neighbor label propagation over the embedding table — the
  * standard way a curation pipeline turns a small labeled seed set into
  * corpus-wide labels (quality tiers, topic buckets, safety classes):
  * every unlabeled vector takes the majority label of its k nearest
  * labeled neighbors.
  *
  * Scale shape: the QUERY side is the bounded one (the docs being labeled
  * in this pass) and rides broadcast against one scan of the labeled pool
  * — the same broadcast-crossjoin + per-query bounded window topology as
  * x08, so the pool is never shuffled and the top-k prunes map-side
  * (WindowGroupLimit on the literal k). The vote aggregate then runs over
  * |queries|·k rows — control-plane sized. At 100 TB, batches of queries
  * stream through the same single-scan plan.
  */
object Knn {

  /** Neighbors per query for the declared query. */
  val K = 5

  /** Top-k labeled neighbors by cosine (rounded to 4 before ranking so the
    * rank order is fp-stable — the x08 discipline). */
  def neighborVotes(pool: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.plans.GraftExtensions.register(pool.sparkSession)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = pool
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("label"),
        round(Similarity.cosineNative(col("embedding"), col("q_emb")), 4).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Majority vote over the k neighbors; ties break to the smallest label
    * id (deterministic). */
  def predict(pool: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val votes = neighborVotes(pool, queries, k)
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
    val w = Window.partitionBy("query_id").orderBy(col("n_votes").desc, col("label"))
    votes.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("query_id"), col("label").as("pred_label"), col("n_votes"))
  }

  /** x45 — kNN label propagation: vectors 0..19 get the majority label of
    * their 5 nearest labeled neighbors (vec_id ≥ 20). */
  def x45KnnLabel(s: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(s, dir)
    predict(emb.filter(col("vec_id") >= 20), emb.filter(col("vec_id") < 20), K)
      .orderBy(col("query_id"))
  }

  /** x65 — label centroids + embedding outlier flags: per label, the mean
    * vector; per embedding, its euclidean distance to its own label's
    * centroid and a rank-percentile outlier flag (top 5% farthest — the
    * mislabel/noise screen run before using labels for training or x45
    * propagation). Scale shape: the centroid is a (label, pos)-keyed avg
    * whose map-side partial aggregation collapses every task to
    * |labels|·dim rows, so the exchange is control-plane-sized regardless
    * of corpus rows; the distance join broadcasts those same rows back;
    * the only corpus-sized exchanges are the per-vector sum and the
    * label-partitioned percentile window. Ordering ties on the ROUNDED
    * distance break by vec_id, which keeps the rank identical across
    * engines even when two distances differ only by summation order. */
  def x65LabelCentroids(s: SparkSession, dir: String): DataFrame = {
    val pos = embeddings(s, dir)
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "v")))
    val cent = pos.groupBy(col("label"), col("pos")).agg(avg(col("v")).as("c"))
    val dist = pos.join(broadcast(cent), Seq("label", "pos"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sqrt(sum((col("v") - col("c")) * (col("v") - col("c")))).as("dist"))
    val w = Window.partitionBy("label").orderBy(round(col("dist"), 4), col("vec_id"))
    dist
      .withColumn("pct", percent_rank().over(w))
      .select(col("vec_id"), col("label"), round(col("dist"), 4).as("dist_r"),
        round(col("pct"), 4).as("pct_r"), (col("pct") >= 0.95).as("is_outlier"))
      .orderBy(col("vec_id"))
  }
}
