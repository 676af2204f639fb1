package graft

/** DuckDB SQL generators for the k-means ANN family oracles (x13 IVF, x30
  * PQ, x31 IVFADC) — the last queries that were rows-only.
  *
  * What made this possible: `Ivf.train`/`Pq.train` compute Lloyd means in
  * EXACT integer 2^-20 units (floor-quantize, BIGINT sum, one double
  * division) — integer sums are order-free, so the trained model is
  * bit-identical under any partitioning AND independently recomputable by
  * another engine. These generators unroll the fixed training rounds as
  * CTEs (the BPE/PageRank pattern): seeded init from the lowest-id
  * vectors, per-round assignment by the same double arithmetic Spark's
  * native expressions run (cosine argmax for IVF cells with first-max
  * tie-break; `‖c‖² − 2·sv·c` argmin for PQ codes, ties to the lowest
  * code — exactly PqEncode's accumulation), quantized means, empty cells
  * keeping their previous centroid. Search mirrors the declared queries:
  * probe/window, ADC tables in Spark's `sqDist` association order
  * `((a·a − 2·a·b) + b·b)`, the score fold reproduced as an ORDERED
  * `list_reduce` (Spark folds from 0.0, and `0.0 + t₀ ≡ t₀`), round(…,4),
  * row_number top-k.
  *
  * Config constants below mirror the declared queries' calls
  * (x13AnnIvf / x30PqAnn / x31IvfadcAnn + cached trainers) — change
  * either side and the CORRECTNESS gate catches the drift. */
private[graft] object AnnOracleSql {

  private val Nlist = 8      // Ivf.cachedCentroids(nlist = 8, iters = 2)
  private val IvfIters = 2
  // the trainers' cap-bounded sample draws ~this many rows per centroid;
  // the mod is ⌈n/cap⌉ in exact integer arithmetic, recomputed per
  // training set below. REFERENCED (not copied) so a tuning of the
  // trainer constant cannot silently desynchronize every ANN oracle
  private val MaxPts = graft.functions.Ivf.MaxPointsPerCentroid
  private val M = 8          // Pq.train(m = 8, k = 16, iters = 2)
  private val Kcodes = 16
  private val PqIters = 2
  private val Dsub = 8       // dim 64 / m 8 (embeddings table layout)
  private val TopK = 3
  private val Nprobe = 3
  private val Short = 24     // shortlistFactor 8 × k 3

  private def dot(a: String, b: String) = s"list_dot_product($a, $b)"
  private def cos(a: String, b: String) =
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  /** PqEncode's per-code distance (the ‖sv‖² term dropped). */
  private def enc(sv: String, c: String) =
    s"(${dot(c, c)} - 2.0e0 * ${dot(sv, c)})"
  /** Pq.sqDist in Spark's association order. */
  private def sqd(a: String, b: String) =
    s"((${dot(a, a)} - 2.0e0 * ${dot(a, b)}) + ${dot(b, b)})"
  private def sub(v: String, s: String) =
    s"list_slice($v, $s * $Dsub + 1, ($s + 1) * $Dsub)"
  /** The exact integer 2^-20-unit mean (mirrors the trainers). */
  private val qmean =
    "CAST(sum(CAST(floor(val * 1048576.0e0) AS BIGINT)) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1048576.0e0)"

  private def ivfLloyd(i: Int): String =
    s"a$i AS (SELECT s.vec_id, s.de, c.cell, ${cos("s.de", "c.cen")} AS sim FROM samp s CROSS JOIN c${i - 1} c), " +
      s"b$i AS (SELECT vec_id, de, cell, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn FROM a$i), " +
      s"m$i AS (SELECT cell, pos - 1 AS pos, $qmean AS m FROM (SELECT cell, unnest(de) AS val, generate_subscripts(de, 1) AS pos FROM b$i WHERE rn = 1) GROUP BY cell, pos), " +
      s"c$i AS (SELECT c.cell, coalesce(g.cen, c.cen) AS cen FROM c${i - 1} c LEFT JOIN (SELECT cell, list(m ORDER BY pos) AS cen FROM m$i GROUP BY cell) g ON c.cell = g.cell)"

  /** CTEs `e`, `tr`, `samp`, `c0..c{IvfIters}`: the trained coarse
    * centroids. `trainWhere` restricts the TRAINING corpus (init +
    * Lloyd sample) — empty trains on all of `e` (x13/x30/x31); x80
    * trains on its seed half while still encoding/searching all of `e`,
    * exactly like `Ivf.train(seed)` against a grown corpus. */
  /** `Ivf.boundedSample`'s mod over training set `src`, verbatim:
    * max(1, ⌈count/ (MaxPts·ncentroids)⌉) in integer arithmetic. */
  private def sampleModSql(src: String, ncentroids: Int): String = {
    val cap = MaxPts.toLong * ncentroids
    s"(SELECT GREATEST(1, (COUNT(*) + ${cap - 1}) // $cap) FROM $src)"
  }

  private def ivfTrainCtes(trainWhere: String = ""): String =
    "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings), " +
      s"tr AS (SELECT * FROM e$trainWhere), " +
      s"samp AS (SELECT * FROM tr WHERE vec_id % ${sampleModSql("tr", Nlist)} = 0), " +
      s"c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell, de AS cen FROM (SELECT * FROM tr ORDER BY vec_id LIMIT $Nlist)), " +
      (1 to IvfIters).map(ivfLloyd).mkString(", ")

  /** PQ code assignment of `src(vec_id, de)` against `pcb$i` → `out`. */
  private def pqEncodeCte(i: Int, src: String, out: String): String =
    s"${out}_d AS (SELECT s.vec_id, s.de, c.sub, c.code, ${enc(sub("s.de", "c.sub"), "c.cen")} AS d FROM $src s CROSS JOIN pcb$i c), " +
      s"$out AS (SELECT vec_id, de, sub, code FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) AS rn FROM ${out}_d) WHERE rn = 1)"

  private def pqLloyd(i: Int): String =
    pqEncodeCte(i - 1, "psamp", s"pas$i") + ", " +
      s"psv$i AS (SELECT sub, code, unnest(${sub("de", "sub")}) AS val, generate_subscripts(${sub("de", "sub")}, 1) AS pos FROM pas$i), " +
      s"pm$i AS (SELECT sub, code, pos - 1 AS pos, $qmean AS m FROM psv$i GROUP BY sub, code, pos), " +
      s"pcb$i AS (SELECT c.sub, c.code, coalesce(g.cen, c.cen) AS cen FROM pcb${i - 1} c LEFT JOIN (SELECT sub, code, list(m ORDER BY pos) AS cen FROM pm$i GROUP BY sub, code) g ON c.sub = g.sub AND c.code = g.code)"

  /** CTEs training a PQ codebook over `src(vec_id, de)` → `pcb{PqIters}`.
    * `trainWhere` restricts the training rows (init + Lloyd sample) the
    * same way [[ivfTrainCtes]]'s does. */
  private def pqTrainCtes(src: String, trainWhere: String = ""): String =
    s"ptr AS (SELECT * FROM $src$trainWhere), " +
      s"psamp AS (SELECT vec_id, de FROM ptr WHERE vec_id % ${sampleModSql("ptr", Kcodes)} = 0), " +
      s"pinit AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS code, de FROM (SELECT * FROM ptr ORDER BY vec_id LIMIT $Kcodes)), " +
      s"subs AS (SELECT CAST(unnest(range(0, $M)) AS INTEGER) AS sub), " +
      s"pcb0 AS (SELECT subs.sub, pinit.code, ${sub("pinit.de", "subs.sub")} AS cen FROM pinit CROSS JOIN subs), " +
      (1 to PqIters).map(pqLloyd).mkString(", ")

  private def rerankTail(topK: Int = TopK, short: Int = Short): String =
    s"shortl AS (SELECT query_id, neighbor_id FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rk FROM sc) WHERE rk <= $short), " +
      s"ex AS (SELECT s.query_id, s.neighbor_id, round(${sqd("e.de", "q.q_emb")}, 4) AS dist FROM shortl s JOIN e ON e.vec_id = s.neighbor_id JOIN qs q ON q.query_id = s.query_id) " +
      s"SELECT query_id, neighbor_id, dist, CAST(rk AS INTEGER) AS rk FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rk FROM ex) WHERE rk <= $topK ORDER BY query_id, rk"

  /** x13: IVF train + probe + within-cell exact cosine top-k. */
  def x13OracleSql: String =
    s"WITH ${ivfTrainCtes()}, " +
      s"ca AS (SELECT e.vec_id, e.de, c.cell, ${cos("e.de", "c.cen")} AS sim FROM e CROSS JOIN c$IvfIters c), " +
      "cc AS (SELECT vec_id, de, cell FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn FROM ca) WHERE rn = 1), " +
      s"qp AS (SELECT vec_id AS query_id, de AS q_emb, cell FROM (SELECT e.vec_id, e.de, c.cell, row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cos("e.de", "c.cen")} DESC, c.cell) AS pr FROM e CROSS JOIN c$IvfIters c WHERE e.vec_id < 20) WHERE pr <= $Nprobe), " +
      s"sc AS (SELECT qp.query_id, cc.vec_id AS neighbor_id, round(${cos("cc.de", "qp.q_emb")}, 4) AS score FROM cc JOIN qp ON cc.cell = qp.cell AND cc.vec_id <> qp.query_id) " +
      s"SELECT query_id, neighbor_id, score, CAST(rk AS INTEGER) AS rk FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rk FROM sc) WHERE rk <= $TopK ORDER BY query_id, rk"

  /** x30: PQ train on raw vectors + ADC shortlist + exact re-rank. */
  def x30OracleSql: String =
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings), " +
      pqTrainCtes("e") + ", " +
      pqEncodeCte(PqIters, "e", "cc") + ", " +
      "qs AS (SELECT vec_id AS query_id, de AS q_emb FROM e WHERE vec_id < 20), " +
      s"tab AS (SELECT q.query_id, c.sub, c.code, ${sqd(sub("q.q_emb", "c.sub"), "c.cen")} AS d FROM qs q CROSS JOIN pcb$PqIters c), " +
      "sc AS (SELECT t.query_id, cc.vec_id AS neighbor_id, round(list_reduce(list(t.d ORDER BY t.sub), (a, b) -> a + b), 4) AS adist " +
      "FROM cc JOIN tab t ON cc.sub = t.sub AND cc.code = t.code AND cc.vec_id <> t.query_id GROUP BY t.query_id, cc.vec_id), " +
      rerankTail()

  /** The full IVFADC pipeline — IVF train, residual PQ train, encode ALL
    * of `e`, probed-cell residual ADC + re-rank — with both training
    * stages restricted by `trainWhere`. Shared by x31 (trains on the
    * full corpus) and x80 (trains on the maintained index's seed half,
    * searching the grown corpus — the incremental-lifecycle contract). */
  private def ivfadcSql(trainWhere: String, qsWhere: String = "vec_id < 20",
                        topK: Int = TopK, nprobe: Int = Nprobe,
                        short: Int = Short, encodeWhere: String = "",
                        tail: Option[String] = None): String =
    s"WITH ${ivfTrainCtes(trainWhere)}, " +
      s"rca AS (SELECT e.vec_id, e.de, c.cell, c.cen, ${cos("e.de", "c.cen")} AS sim FROM e CROSS JOIN c$IvfIters c$encodeWhere), " +
      "rc AS (SELECT vec_id, cell, list_transform(range(1, len(de) + 1), i -> de[i] - cen[i]) AS de FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn FROM rca) WHERE rn = 1), " +
      pqTrainCtes("rc", trainWhere) + ", " +
      pqEncodeCte(PqIters, "rc", "cc0") + ", " +
      "cc AS (SELECT cc0.vec_id, rc.cell, cc0.sub, cc0.code FROM cc0 JOIN rc ON cc0.vec_id = rc.vec_id), " +
      s"qs AS (SELECT vec_id AS query_id, de AS q_emb FROM e WHERE $qsWhere), " +
      s"qc0 AS (SELECT q.query_id, q.q_emb, c.cell, c.cen, ${cos("q.q_emb", "c.cen")} AS c_sim FROM qs q CROSS JOIN c$IvfIters c), " +
      s"qc AS (SELECT query_id, cell, list_transform(range(1, len(q_emb) + 1), i -> q_emb[i] - cen[i]) AS qres FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY c_sim DESC, cell) AS pr FROM qc0) WHERE pr <= $nprobe), " +
      s"tab AS (SELECT qc.query_id, qc.cell, c.sub, c.code, ${sqd(sub("qc.qres", "c.sub"), "c.cen")} AS d FROM qc CROSS JOIN pcb$PqIters c), " +
      "sc AS (SELECT t.query_id, cc.vec_id AS neighbor_id, round(list_reduce(list(t.d ORDER BY t.sub), (a, b) -> a + b), 4) AS adist " +
      "FROM cc JOIN tab t ON cc.cell = t.cell AND cc.sub = t.sub AND cc.code = t.code AND cc.vec_id <> t.query_id GROUP BY t.query_id, cc.vec_id), " +
      tail.getOrElse(rerankTail(topK, short))

  /** x31: IVF train, residual PQ train, probed-cell residual ADC + re-rank. */
  def x31OracleSql: String = ivfadcSql("")

  /** x85: the x80 seed-trained pipeline with the DELETED slice
    * (`vec_id % 8 = 2` — delta-resident vectors the maintained index
    * tombstones) excluded from ENCODING only: deletion never retrains
    * (the stored model keeps its seed training set — the deleted slice
    * is disjoint from the seed, so the training CTEs are unaffected by
    * the encode restriction), it just removes the vectors from the
    * served code store, which is a search-side membership change exactly
    * like x82's. */
  def x85OracleSql: String = ivfadcSql(" WHERE vec_id % 4 < 2",
    encodeWhere = " WHERE e.vec_id % 4 < 3 AND e.vec_id % 8 <> 2")

  /** x80: the x31 pipeline with BOTH k-means stages trained on the
    * maintained ANN index's seed half (`vec_id % 4 < 2` — what
    * `MaintainedAnnIndex.x80IncrementalIvfadc` passes to initIndex) while
    * encoding and searching the full grown corpus — exactly the stored
    * model + incremental map-only encode the maintained lifecycle serves. */
  def x80OracleSql: String = ivfadcSql(" WHERE vec_id % 4 < 2")

  /** The dense side of x81's hybrid fusion: the x80 seed-trained IVFADC
    * pipeline for the single hybrid query vector (`vec_id = 0`), re-rank
    * depth 20 (shortlist 8×20), nprobe 3 — exactly what
    * `HybridRetrieval.searchRrf(depth = 20, nprobe = 3)` runs against the
    * maintained index. `rk` of this result is the fusion's `r_dense`. */
  def x81DenseSql: String =
    ivfadcSql(" WHERE vec_id % 4 < 2", "vec_id = 0", topK = 20, nprobe = 3,
      short = 160)

  /** x82's semantic-dup verdict boundary, in round(·,4) squared-L2 units
    * of the exact re-rank distance. Shared by the declared query and the
    * oracle — a literal either engine compares the identically-rounded
    * `dist` against, so the verdict is deterministic on both sides.
    * 1.32 sits at the nearest-indexed-neighbor distance median of the
    * embeddings table (stable ~1.30–1.38 across sf0.001/0.01/0.1), so
    * the declared verdict set is a genuine mix at every tested SF. */
  val X82DistThreshold: Double = 1.32

  /** x82: the x80 seed-trained IVFADC pipeline with ENCODING restricted
    * to the index members (`vec_id % 4 < 3` — seed + the ingested delta
    * window) and the held-out quarter (`vec_id % 4 = 3`) as the query
    * batch: nearest indexed neighbor via probed-cell ADC shortlist +
    * exact re-rank (top-1 of shortlist 8), `is_dup` when the exact
    * distance is within [[X82DistThreshold]] — the incremental SemDeDup
    * screen `MaintainedAnnIndex.screenSemantic` runs. */
  def x82OracleSql: String = {
    val verdictTail =
      s"shortl AS (SELECT query_id, neighbor_id FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rk FROM sc) WHERE rk <= 8), " +
        s"ex AS (SELECT s.query_id, s.neighbor_id, round(${sqd("e.de", "q.q_emb")}, 4) AS dist FROM shortl s JOIN e ON e.vec_id = s.neighbor_id JOIN qs q ON q.query_id = s.query_id) " +
        s"SELECT query_id AS vec_id, neighbor_id AS nearest_id, dist, dist <= $X82DistThreshold AS is_dup " +
        "FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rk FROM ex) WHERE rk = 1 ORDER BY vec_id"
    ivfadcSql(" WHERE vec_id % 4 < 2", "vec_id % 4 = 3",
      encodeWhere = " WHERE e.vec_id % 4 < 3", tail = Some(verdictTail))
  }

  /** One suffixed screen stage over the shared encode (`cc`, one row per
    * (vec,sub)): probe, ADC against cc rows satisfying `memberPred`
    * (membership is a FILTER on the search side — codes don't depend on
    * it), shortlist 8, exact re-rank top-1, threshold verdict →
    * `v$sfx(vec_id, nearest_id, dist, is_dup)`. */
  private def screenCtes(sfx: String, qsWhere: String, memberPred: String): String =
    s"qs$sfx AS (SELECT vec_id AS query_id, de AS q_emb FROM e WHERE $qsWhere), " +
      s"qc0$sfx AS (SELECT q.query_id, q.q_emb, c.cell, c.cen, ${cos("q.q_emb", "c.cen")} AS c_sim FROM qs$sfx q CROSS JOIN c$IvfIters c), " +
      s"qc$sfx AS (SELECT query_id, cell, list_transform(range(1, len(q_emb) + 1), i -> q_emb[i] - cen[i]) AS qres FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY c_sim DESC, cell) AS pr FROM qc0$sfx) WHERE pr <= $Nprobe), " +
      s"tab$sfx AS (SELECT qc.query_id, qc.cell, c.sub, c.code, ${sqd(sub("qc.qres", "c.sub"), "c.cen")} AS d FROM qc$sfx qc CROSS JOIN pcb$PqIters c), " +
      s"sc$sfx AS (SELECT t.query_id, cc.vec_id AS neighbor_id, round(list_reduce(list(t.d ORDER BY t.sub), (a, b) -> a + b), 4) AS adist " +
      s"FROM cc JOIN tab$sfx t ON cc.cell = t.cell AND cc.sub = t.sub AND cc.code = t.code AND cc.vec_id <> t.query_id WHERE $memberPred GROUP BY t.query_id, cc.vec_id), " +
      s"shortl$sfx AS (SELECT query_id, neighbor_id FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rk FROM sc$sfx) WHERE rk <= 8), " +
      s"ex$sfx AS (SELECT s.query_id, s.neighbor_id, round(${sqd("e.de", "q.q_emb")}, 4) AS dist FROM shortl$sfx s JOIN e ON e.vec_id = s.neighbor_id JOIN qs$sfx q ON q.query_id = s.query_id), " +
      s"v$sfx AS (SELECT query_id AS vec_id, neighbor_id AS nearest_id, dist, dist <= $X82DistThreshold AS is_dup " +
      s"FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rk FROM ex$sfx) WHERE rk = 1)"

  /** x83: the ADMISSION LOOP hash-verified end to end. Train on the seed
    * half (`vec_id % 8 < 4`), encode EVERYTHING once (a vector's codes
    * under a fixed model don't depend on index membership — membership
    * is a search-side filter), then: screen batch A (`% 8 IN (4,5)`)
    * against the seed members; ADMIT A's non-duplicates (absence of
    * candidates = novelty — the anti-join on the DUP set, exactly the
    * declared query's admission rule); screen batch B (`% 8 IN (6,7)`)
    * against seed ∪ admitted-A. vB's verdicts therefore depend on the
    * admission decisions of vA — a wrong admission in either engine
    * cascades into B's hash. */
  def x83OracleSql: String =
    s"WITH ${ivfTrainCtes(" WHERE vec_id % 8 < 4")}, " +
      s"rca AS (SELECT e.vec_id, e.de, c.cell, c.cen, ${cos("e.de", "c.cen")} AS sim FROM e CROSS JOIN c$IvfIters c), " +
      "rc AS (SELECT vec_id, cell, list_transform(range(1, len(de) + 1), i -> de[i] - cen[i]) AS de FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn FROM rca) WHERE rn = 1), " +
      pqTrainCtes("rc", " WHERE vec_id % 8 < 4") + ", " +
      pqEncodeCte(PqIters, "rc", "cc0") + ", " +
      "cc AS (SELECT cc0.vec_id, rc.cell, cc0.sub, cc0.code FROM cc0 JOIN rc ON cc0.vec_id = rc.vec_id), " +
      screenCtes("a", "vec_id % 8 IN (4, 5)", "cc.vec_id % 8 < 4") + ", " +
      // screenAndAdmit emits a row for EVERY batch vector (absence of
      // candidates = novelty, is_dup false with null neighbor): wrap
      // each screen as a left join back to its query set
      "vaw AS (SELECT q.query_id AS vec_id, v.nearest_id, v.dist, coalesce(v.is_dup, false) AS is_dup FROM qsa q LEFT JOIN va v ON v.vec_id = q.query_id), " +
      "dupa AS (SELECT vec_id FROM vaw WHERE is_dup), " +
      screenCtes("b", "vec_id % 8 IN (6, 7)",
        "(cc.vec_id % 8 < 4 OR (cc.vec_id % 8 IN (4, 5) AND cc.vec_id NOT IN (SELECT vec_id FROM dupa)))") + ", " +
      "vbw AS (SELECT q.query_id AS vec_id, v.nearest_id, v.dist, coalesce(v.is_dup, false) AS is_dup FROM qsb q LEFT JOIN vb v ON v.vec_id = q.query_id) " +
      "SELECT CAST(0 AS INTEGER) AS batch, vec_id, nearest_id, dist, is_dup FROM vaw " +
      "UNION ALL SELECT CAST(1 AS INTEGER) AS batch, vec_id, nearest_id, dist, is_dup FROM vbw " +
      "ORDER BY batch, vec_id"
}
