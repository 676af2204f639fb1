package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Scoring uses the native single-pass [[graft.plans.CosineSimilarity]]
  * expression (~17x faster than the zip_with+aggregate HOF pipeline on 4M
  * pairs, measured at sf0.1); the HOF form is kept as [[cosine]] for
  * reference and parity tests. Two search paths:
  *  - brute force: linear scan against a broadcast query set — exact; the
  *    right plan when the query set is small (plan = BroadcastNestedLoopJoin
  *    + per-partition top-k, never a cartesian shuffle);
  *  - LSH (random hyperplanes): bucket both sides, search within buckets —
  *    the 100 TB path; approximate, recall measured in SimilaritySpec.
  */
object Similarity {

  /** Sequential-fold dot product in double precision (matches the oracle's
    * list_dot_product over DOUBLE[] element order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Native single-pass codegen'd cosine (graft.plans.CosineSimilarity) —
    * same per-element double accumulation order as [[cosine]], so results
    * are bit-identical; one loop instead of three HOF pipelines. Resolved
    * through the session FunctionRegistry — callers must have run
    * [[graft.plans.GraftExtensions.register]] (idempotent) or configured
    * `spark.sql.extensions=graft.plans.GraftExtensions`. */
  def cosineNative(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)

  /** Native single-pass dot product ([[graft.plans.DotProduct]]) — same
    * double accumulation order as [[dot]], so projections (and therefore LSH
    * bucket ids) are bit-identical; same registration requirement as
    * [[cosineNative]]. */
  def dotNative(a: Column, b: Column): Column =
    call_function("dot_product", a, b)

  /** D20 — exact top-k cosine neighbors of one query vector. The single-row
    * query side is broadcast; the corpus is scanned once; ORDER BY+LIMIT
    * compiles to TakeOrderedAndProject (per-partition heap, no global sort).
    * Ordering is on the rounded score so result ranks are fp-stable. */
  def d20TopKNeighbors(s: SparkSession, dir: String, queryId: Long = 0, k: Int = 5): DataFrame = {
    graft.plans.GraftExtensions.register(s)
    val emb = embeddings(s, dir)
    val q = emb.filter(col("vec_id") === queryId).select(col("embedding").as("q_emb"))
    emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("neighbor_id"),
        round(cosineNative(col("embedding"), col("q_emb")), 4).as("score"))
      .orderBy(col("score").desc, col("neighbor_id"))
      .limit(k)
  }

  /** Exact brute-force ANN for a broadcast query set: top-k per query via a
    * window over the rounded score. Linear in |corpus|·|queries|; the right
    * exact plan while |queries| is broadcastable. */
  def annBruteForce(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.plans.GraftExtensions.register(corpus.sparkSession)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = corpus
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosineNative(col("embedding"), col("q_emb")), 4).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Multi-query exact ANN over the test corpus (query set = vec_id < 20). */
  def x08AnnMultiQuery(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val emb = embeddings(s, dir)
    annBruteForce(emb, emb.filter(col("vec_id") < 20), k)
      .orderBy(col("query_id"), col("rk"))
  }

  /** Same scoring, but top-k per query via the [[TopKByScore]] Aggregator
    * (map-side bounded heaps, no window sort) and the native cosine
    * expression — the 100 TB formulation; result set identical to
    * [[x08AnnMultiQuery]] and checked against the same oracle. */
  def x08bAnnTopKAgg(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    graft.plans.GraftExtensions.register(s)
    val emb = embeddings(s, dir)
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = emb
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosineNative(col("embedding"), col("q_emb")), 4).as("score"))
    TopKByScore.topKPerQuery(scored, k).orderBy(col("query_id"), col("rk"))
  }

  /** Deterministic random hyperplanes (fixed seed — reproducible plans and
    * resumable jobs at scale; dim = embedding dimensionality). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** LSH bucket id: sign bits of the projections onto `planes`. Projections
    * use the native [[dotNative]] (bucket assignment runs per-row × nPlanes
    * over the full corpus — the map-side hot loop of every LSH consumer);
    * callers must have registered [[graft.plans.GraftExtensions]]. */
  def lshBucket(emb: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dotNative(emb, typedlit(p.toIndexedSeq)) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Approximate ANN: bucket corpus and queries with random-hyperplane LSH,
    * shuffle both sides on the bucket id, top-k within the bucket. At 100 TB
    * this replaces the |corpus|·|queries| scan with a co-partitioned equi-
    * join on bucket — the scan cost drops by ~2^nPlanes for unskewed data.
    * Trade-off: recall < 1 (SimilaritySpec measures it vs brute force).
    */
  def annLsh(corpus: DataFrame, queries: DataFrame, k: Int, nPlanes: Int = 4,
             dim: Int = 64, seed: Long = 42L): DataFrame = {
    graft.plans.GraftExtensions.register(corpus.sparkSession)
    val planes = hyperplanes(nPlanes, dim, seed)
    val c = corpus.withColumn("bucket", lshBucket(col("embedding"), planes))
    val q = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .withColumn("bucket", lshBucket(col("q_emb"), planes))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosineNative(col("embedding"), col("q_emb")), 4).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** LSH ANN as a declared query — full hash oracle (the hyperplane seeds
    * are deterministic, so SparkEntry.x09OracleSql recomputes the exact
    * bucket assignment + within-bucket ranking in SQL). */
  def x09AnnLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(s, dir)
    annLsh(emb, emb.filter(col("vec_id") < 20), k = 3)
      .orderBy(col("query_id"), col("rk"))
  }

  /** Number of independent hash tables in the multi-table LSH path. */
  val LshTables = 4

  /** Multi-table LSH ANN: `tables` independent hyperplane sets (seeds
    * `seed..seed+tables-1`), candidate = same bucket in ANY table, exact
    * re-score, top-k. This is the standard recall lever — miss probability
    * decays exponentially in the table count ((1−p)^L for per-table
    * collision probability p) at a linear candidate-cost increase. One
    * corpus scan computes ALL tables' buckets (posexplode), so the join
    * key is (table, bucket) and the shuffle stays a single co-partitioned
    * equi-join; duplicate candidates across tables collapse via max_by
    * before scoring. Measured (RecallProbe): recall@3 0.20 → 0.57 at
    * sf0.1 (0.12 → 0.43 at sf0.01) vs the single-table x09. */
  def annLshMulti(corpus: DataFrame, queries: DataFrame, k: Int,
                  nPlanes: Int = 4, dim: Int = 64, tables: Int = LshTables,
                  seed: Long = 42L): DataFrame = {
    graft.plans.GraftExtensions.register(corpus.sparkSession)
    val allPlanes = (0 until tables).map(t => hyperplanes(nPlanes, dim, seed + t))
    def buckets(emb: Column): Column =
      array(allPlanes.map(p => lshBucket(emb, p)): _*)
    val c = corpus
      .select(col("vec_id"), col("embedding"), posexplode(buckets(col("embedding"))))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
    val q = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        posexplode(buckets(col("embedding"))))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
    val cand = c.join(q, Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(first(col("embedding")).as("embedding"), first(col("q_emb")).as("q_emb"))
    val scored = cand.select(col("query_id"), col("vec_id").as("neighbor_id"),
      round(cosineNative(col("embedding"), col("q_emb")), 4).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Multi-table LSH as a declared query — oracle-exact like x09: every
    * table's hyperplanes are seeded constants the SQL can inline. */
  def x09bAnnLshMulti(s: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(s, dir)
    annLshMulti(emb, emb.filter(col("vec_id") < 20), k = 3)
      .orderBy(col("query_id"), col("rk"))
  }
}
