package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables._

/** Distributed BPE-style vocabulary training: the iterative most-frequent-
  * pair merge loop that byte-pair-encoding tokenizers are trained with
  * (Sennrich et al. 2016), expressed Spark-first.
  *
  * Scale shape — the load-bearing observation is that after the FIRST pass
  * the working relation is VOCABULARY-sized, not corpus-sized: one
  * corpus-scale token explosion + count produces (word, count), and every
  * subsequent merge round runs over that aggregated relation (≤ |vocab|
  * rows). Per round: a pair explosion + weighted hash agg (map-side
  * partials) to find the argmax pair — ONE control-plane row collected —
  * then a codegen'd higher-order `aggregate` rewrites each word's symbol
  * array in place (map-only). Rounds persist + unpersist the symbol
  * relation so neither the plan nor the lineage grows with the step count.
  *
  * Determinism: ties on pair count break by (left, right) lexicographic
  * order, making the whole merge table reproducible — the JVM parity test
  * replays the identical algorithm on collected counts.
  */
object Bpe {

  /** Number of merge rounds for the declared query. */
  val MergeSteps = 8

  /** Characters of a word as an array<string> (split keeps a trailing empty
    * string; filter it). */
  def charSymbols(w: Column): Column =
    filter(split(w, ""), s => s =!= "")

  /** Adjacent symbol pairs of one word as structs (left, right); empty
    * below 2 symbols. */
  def adjacentPairs(sym: Column): Column =
    when(size(sym) >= 2,
      transform(sequence(lit(1), size(sym) - 1),
        i => struct(element_at(sym, i).as("left"), element_at(sym, i + 1).as("right"))))
      .otherwise(array().cast("array<struct<left:string,right:string>>"))

  /** Greedy left-to-right non-overlapping merge of (left, right) → merged
    * inside a symbol array, as a single codegen'd fold. */
  def mergePair(sym: Column, left: String, right: String): Column =
    aggregate(sym, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(left) && x === lit(right),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
        .otherwise(concat(acc, array(x))))

  /** One merge round: the argmax pair of the current symbol relation, or
    * None when no word has 2 symbols left. */
  private def bestPair(words: DataFrame): Option[(String, String, Long)] = {
    val rows = words
      .select(col("cnt"), explode(adjacentPairs(col("sym"))).as("p"))
      .groupBy(col("p.left"), col("p.right"))
      .agg(sum(col("cnt")).as("pc"))
      .orderBy(col("pc").desc, col("left"), col("right"))
      .limit(1)
      .collect()
    rows.headOption.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
  }

  /** Train `steps` merges over a (w, cnt) word-count relation; returns the
    * merge table (step, left, right, merged, pair_count). */
  def train(wordCounts: DataFrame, steps: Int): DataFrame = {
    val s = wordCounts.sparkSession
    var words = wordCounts
      .select(col("cnt"), charSymbols(col("w")).as("sym"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    words.count() // materialize before the loop reads it `steps` times
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var step = 0
    while (step < steps) {
      bestPair(words) match {
        case Some((l, r, pc)) =>
          merges += ((step, l, r, l + r, pc))
          val next = words
            .withColumn("sym", mergePair(col("sym"), l, r))
            .persist(StorageLevel.MEMORY_AND_DISK)
          next.count()
          words.unpersist()
          words = next
          step += 1
        case None => step = steps
      }
    }
    words.unpersist()
    import s.implicits._
    merges.toSeq.toDF("step", "left", "right", "merged", "pair_count")
      .orderBy(col("step"))
  }

  /** x37 — BPE merge-table training over the document corpus: one
    * corpus-scale token count, then [[MergeSteps]] vocabulary-sized merge
    * rounds. */
  def x37BpeMerges(s: SparkSession, dir: String): DataFrame =
    train(
      documents(s, dir)
        .select(explode(graft.functions.Text.tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt")),
      MergeSteps)

  /** The trained merge table applied to one word column, as ONE native
    * codegen'd expression ([[graft.plans.BpeApply]]): plan size is O(1)
    * in the merge count, so a real 32k-merge vocabulary costs the same
    * plan as 8 merges. Applied at VOCAB granularity — tokenization is a
    * pure function of the word, so the corpus-scale stream never
    * re-folds; it joins the vocab-sized symbol table instead. */
  def bpeApply(word: Column, merges: Seq[(String, String)]): Column =
    call_function("bpe_apply", word,
      typedLit(merges.map(m => Seq(m._1, m._2))))

  /** Apply a trained merge table to a word relation (see [[bpeApply]]).
    * [[applyMergesHof]] is the plan-per-merge higher-order-function twin
    * kept as the cross-check form. */
  def applyMerges(words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    graft.plans.GraftExtensions.register(words.sparkSession)
    words.withColumn("sym", bpeApply(col("w"), merges))
  }

  /** The original chained-fold apply: one greedy [[mergePair]] fold per
    * merge. Plan (and codegen) size grows linearly with the merge count —
    * correct, but only usable at demonstration vocabularies; the declared
    * queries use [[applyMerges]]. Kept as the independently-derived
    * cross-check for the native expression's semantics. */
  def applyMergesHof(words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(words.withColumn("sym", charSymbols(col("w")))) {
      case (df, (l, r)) => df.withColumn("sym", mergePair(col("sym"), l, r))
    }

  /** Steps cap for the scaled trainer: far past this corpus's exhaustion
    * point, demonstrating the real-vocabulary operating point (training
    * stops early when no mergeable pair remains). */
  val ScaledMergeSteps = 1000

  /** Unrolled-round budget of the SCALED oracles (x37b/x55b): the DuckDB
    * MATERIALIZED CTE chain's cost is superlinear in the round count
    * (~5 s at 96 rounds, ~225 s at 256 on this corpus), so the declared
    * queries RETURN/APPLY only the first [[OracleBpeRounds]] merges —
    * both sides agree BY CONSTRUCTION even if a regenerated corpus
    * exhausts later than the budget. On the current corpus exhaustion
    * (89 merges) is under the budget, so the declared result is the
    * complete table; the ≥1000-merge capability is pinned by
    * RoundNineSpec's synthetic-vocabulary test, not the declared row
    * count. */
  val OracleBpeRounds = 96

  /** Hard cap on the collected word-count rows: past this the collect is
    * no longer control-plane-sized and the trainer must NOT silently OOM
    * the driver — it bails out loudly instead (raise `minFreq` to shrink
    * the tail, or fall back to the distributed [[x37BpeMerges]] loop).
    * 4M (word, count) rows ≈ a few hundred MB on the driver — comfortably
    * inside a production driver heap, far above any real BPE vocabulary. */
  val MaxCollectedWords = 4000000

  /** The corpus word-count relation of [[x37BpeMerges]], collected — ONE
    * Spark job; the result is vocabulary-bounded (control-plane sized),
    * and that boundedness is now ENFORCED, not assumed:
    *
    *   - `minFreq` prunes the long tail (`cnt >= minFreq`) BEFORE the
    *     collect, so a web-scale hapax tail never ships to the driver.
    *   - `maxWords` is a hard cap applied as `LIMIT maxWords+1` INSIDE
    *     the plan — the driver receives at most `maxWords + 1` rows even
    *     on the failing path — and one extra row triggers a loud
    *     [[IllegalStateException]] instead of a silent truncation.
    *
    * Merge-table invariance under pruning — the bound: let
    * M = Σ over pruned words of cnt·(symbols−1) (each word contributes at
    * most cnt·(symbols−1) total pair mass, across ALL its pairs, at every
    * step of training — merging only shrinks a word's pair count; see
    * [[prunedPairMass]]). Pruning lowers any pair's count by at most M in
    * aggregate and raises none, so whenever the pruned run's argmax beats
    * its runner-up by MORE than M at a step, the unpruned run's argmax at
    * that step is the same pair; by induction (both runs then rewrite the
    * same pair, and the surviving words' symbol states stay identical) a
    * per-step margin > M for the whole run implies an IDENTICAL merge
    * table. RoundTenSpec pins this: margins > M ⇒ pruned ≡ unpruned.
    *
    * Defaults (`minFreq = 1`) keep the declared x37b/x55b oracles
    * byte-identical — nothing is pruned on the test corpus. */
  private[graft] def collectWordCounts(
      s: SparkSession, dir: String,
      minFreq: Long = 1L, maxWords: Int = MaxCollectedWords): Array[(String, Long)] =
    collectWordCountsOf(documents(s, dir), minFreq, maxWords)

  /** [[collectWordCounts]] over an arbitrary `(…, text)` relation — the
    * u09 multibyte projection trains on this. */
  private[graft] def collectWordCountsOf(
      docs: DataFrame,
      minFreq: Long = 1L, maxWords: Int = MaxCollectedWords): Array[(String, Long)] = {
    val rows = docs
      .select(explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minFreq)
      .limit(maxWords + 1)
      .collect()
    if (rows.length > maxWords)
      throw new IllegalStateException(
        s"BPE word-count collect exceeds the $maxWords-row driver cap even at " +
          s"minFreq=$minFreq: the vocabulary tail is not control-plane-sized. " +
          "Raise minFreq (the pruned-mass bound in Bpe.collectWordCounts's doc " +
          "says when that provably preserves the merge table) or train with " +
          "the distributed loop (x37BpeMerges).")
    rows.map(r => (r.getString(0), r.getLong(1)))
  }

  /** Total pair mass of the words `minFreq` would prune — the M of the
    * invariance bound in [[collectWordCounts]]: an upper bound, valid at
    * EVERY training step, on how much pruning can lower any single pair's
    * count. */
  def prunedPairMass(counts: Iterable[(String, Long)], minFreq: Long): Long =
    counts.iterator
      .filter(_._2 < minFreq)
      .map { case (w, c) => c * math.max(0, codePointSymbols(w).length - 1) }
      .sum

  /** Production JVM trainer over a COLLECTED word-count table: the
    * incremental pair-index algorithm (Sennrich et al. 2016 §3) — build
    * the adjacent-pair counts, a pair→words index, and an ORDERED mirror
    * of the counts once, then each merge touches only the words containing
    * the merged pair. O(total symbols · log |pairs|) init,
    * O(affected-word symbols · log |pairs|) per step (the ordered mirror
    * makes each argmax a first-key lookup instead of a full count scan —
    * at a real 100k-word vocabulary the scan would dominate all 32k
    * steps), ZERO Spark jobs — this is how the 2-jobs-per-merge
    * distributed loop reaches a real 32k-merge vocabulary. Bit-identical
    * to [[referenceMerges]] (same greedy rewrite and (count desc, left,
    * right) UTF-8-byte tie-break); the quantized k-means trainers' replay
    * pattern, applied to BPE. */
  def trainJvmMerges(counts: Iterable[(String, Long)], steps: Int): Seq[(Int, String, String, String, Long)] = {
    import scala.collection.mutable
    val wordSyms = mutable.ArrayBuffer[Array[String]]()
    val wordCnt = mutable.ArrayBuffer[Long]()
    for ((w, c) <- counts) {
      wordSyms += codePointSymbols(w).toArray
      wordCnt += c
    }
    val pairCount = mutable.HashMap[(String, String), Long]()
    val pairWords = mutable.HashMap[(String, String), mutable.BitSet]()
    // ordered mirror: (count desc, left, right in UTF-8 byte order) —
    // first() IS the next merge
    val order = new java.util.TreeSet[(Long, String, String)](
      new java.util.Comparator[(Long, String, String)] {
        override def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
          if (a._1 != b._1) java.lang.Long.compare(b._1, a._1)
          else {
            val cl = utf8Order.compare(a._2, b._2)
            if (cl != 0) cl else utf8Order.compare(a._3, b._3)
          }
        }
      })
    def addPairs(wi: Int, sign: Long): Unit = {
      val sym = wordSyms(wi)
      val c = wordCnt(wi) * sign
      var j = 0
      while (j < sym.length - 1) {
        val p = (sym(j), sym(j + 1))
        val oc = pairCount.getOrElse(p, 0L)
        if (oc != 0L) order.remove((oc, p._1, p._2))
        val nc = oc + c
        if (nc == 0L) { pairCount.remove(p); pairWords.remove(p) }
        else {
          pairCount(p) = nc
          order.add((nc, p._1, p._2))
          if (sign > 0) pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += wi
        }
        j += 1
      }
    }
    for (wi <- wordSyms.indices) addPairs(wi, 1L)
    val out = mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var step = 0
    while (step < steps && !order.isEmpty) {
      val (bc, bl, br) = order.first()
      val lr = bl + br
      out += ((step, bl, br, lr, bc))
      val affected = pairWords((bl, br)).toArray
      for (wi <- affected) {
        addPairs(wi, -1L)
        val old = wordSyms(wi)
        val acc = mutable.ArrayBuffer[String]()
        for (x <- old)
          if (acc.nonEmpty && acc.last == bl && x == br) { acc.remove(acc.length - 1); acc += lr }
          else acc += x
        wordSyms(wi) = acc.toArray
        addPairs(wi, 1L)
      }
      step += 1
    }
    out.toSeq
  }

  /** x37b — BPE training at the REAL operating point: the word-count
    * relation collected once (it is vocabulary-bounded — control-plane
    * data, the same size argument as the IVF centroid collect), then the
    * full merge table trained in the JVM with a [[ScaledMergeSteps]] cap.
    * O(1) Spark jobs regardless of the merge count, vs 2 jobs PER MERGE
    * in the distributed loop (x37's declared 8-round form). On this
    * corpus the vocabulary exhausts all mergeable pairs well under the
    * cap, so the result is the COMPLETE merge table — oracled round by
    * round to exhaustion (declared rows clamped to [[OracleBpeRounds]],
    * the oracle's unroll budget — a no-op here). */
  def x37bBpeMergesScaled(s: SparkSession, dir: String): DataFrame = {
    val merges = trainJvmMerges(collectWordCounts(s, dir), ScaledMergeSteps)
      .take(OracleBpeRounds)
    import s.implicits._
    merges.toDF("step", "left", "right", "merged", "pair_count")
      .orderBy(col("step"))
  }

  // merge-table cache — the trained vocabulary is an index-build artifact
  // (deterministic, corpus-version-scoped), the Pq.cachedCodebook rationale.
  // Trained in the JVM from one collected word-count pass (parity with the
  // distributed loop is pinned by BpeSpec); value = merges at ScaledMergeSteps,
  // of which the first MergeSteps are the declared-query vocabulary.
  private val mergeCache = graft.GraftCaches.register(
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]())

  private[graft] def cachedScaledMerges(s: SparkSession, dir: String): Seq[(String, String)] = {
    val key = s"${System.identityHashCode(s)}|$dir"
    mergeCache.computeIfAbsent(key, _ =>
      trainJvmMerges(collectWordCounts(s, dir), ScaledMergeSteps).map(m => (m._2, m._3)))
  }

  private[graft] def cachedMerges(s: SparkSession, dir: String): Seq[(String, String)] =
    cachedScaledMerges(s, dir).take(MergeSteps)

  /** Merge table trained on the MULTIBYTE projection of the corpus
    * ([[graft.functions.Text.utf8Text]]) — the u09 vocabulary, cached per
    * (session, dir) like [[cachedScaledMerges]]. 2- and 3-byte code
    * points participate in merges here, so the trainer's code-point
    * symbol split and the UTF-8-byte tie-break are exercised where they
    * can actually diverge from UTF-16/char arithmetic. */
  private[graft] def cachedUtf8Merges(s: SparkSession, dir: String): Seq[(String, String)] = {
    val key = s"${System.identityHashCode(s)}|$dir|utf8"
    mergeCache.computeIfAbsent(key, _ =>
      trainJvmMerges(
        collectWordCountsOf(documents(s, dir)
          .withColumn("text", graft.functions.Text.utf8Text(col("text")))),
        MergeSteps).map(m => (m._2, m._3)))
  }

  /** The shared x55-family tokenization body: per doc, whitespace token
    * count, BPE symbol count under `merges` (native [[applyMerges]] at
    * VOCAB granularity — the corpus pays one explode + one word-keyed
    * join + one per-doc aggregate), and the symbols-per-token ratio. */
  private def tokenizeStats(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .distinct()
    val vocab = applyMerges(words, merges)
      .select(col("w"), size(col("sym")).as("n_sym"))
    val perDoc = docs
      .select(col("doc_id"), explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .join(vocab, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("n_sym")).as("n_symbols"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_symbols"), lit(0L)).as("n_symbols"),
        round(when(col("n_tokens") > 0,
          col("n_symbols").cast("double") / col("n_tokens")).otherwise(lit(0.0)), 4)
          .as("sym_per_token"))
      .orderBy(col("doc_id"))
  }

  /** u09 — the BPE train→tokenize path over MULTIBYTE text: x55's exact
    * shape with both the training corpus and the tokenized corpus under
    * the [[graft.functions.Text.utf8Text]] projection, so trained merges
    * contain 2- and 3-byte code points and the apply side folds them.
    * Closes the BPE family's last ASCII-contract corner (u01–u08 pinned
    * the tokenizer/fingerprint/quality families; the x55b unit test
    * pinned BpeApply alone — this oracle-verifies the whole path). */
  def u09Utf8BpeTokenize(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
      .withColumn("text", graft.functions.Text.utf8Text(col("text")))
    tokenizeStats(docs, cachedUtf8Merges(s, dir))
  }

  /** x55 — BPE tokenization with the TRAINED vocabulary (x37's apply
    * side): per document, whitespace token count, BPE symbol count under
    * [[MergeSteps]] trained merges, and the symbols-per-token ratio a
    * tokenizer-budget planner needs. Rows-only like x37 (the merge table
    * is iteratively trained); the JVM parity test replays train+apply on
    * collected counts. Scale shape: merges fold over the DISTINCT-word
    * relation only; the corpus pays one explode + one word-keyed join +
    * one per-doc aggregate. */
  def x55BpeTokenize(s: SparkSession, dir: String): DataFrame =
    // word-keyed equi-join inside tokenizeStats; vocab is usually
    // broadcast-sized but AQE makes that call at runtime (a 100 TB corpus
    // can exceed the broadcast cap)
    tokenizeStats(graft.Tables.documents(s, dir), cachedMerges(s, dir))

  /** x55b — tokenization with the FULL exhaustion-trained vocabulary
    * (every merge [[x37bBpeMergesScaled]] finds under the
    * [[ScaledMergeSteps]] cap), applied by the native
    * [[graft.plans.BpeApply]] expression: the whole merge table is one
    * fold-once reference object, so the plan is the same size at 8 merges
    * and at 32k. Same corpus shape as x55 — merges run over the
    * DISTINCT-word relation only; the corpus pays one explode + one
    * word-keyed join + one per-doc aggregate. */
  def x55bBpeTokenizeFull(s: SparkSession, dir: String): DataFrame =
    tokenizeStats(graft.Tables.documents(s, dir),
      cachedScaledMerges(s, dir).take(OracleBpeRounds))

  /** Unsigned lexicographic order over a string's UTF-8 bytes — the
    * collation Spark's `orderBy` applies to strings (UTF8String is
    * compared byte-wise). Plain `String` ordering compares UTF-16 code
    * units, which agrees with this only up to the BMP; supplementary
    * characters (surrogate pairs, 0xF0.. in UTF-8 vs 0xD800.. in UTF-16)
    * would diverge, so the parity reference must use the byte order. */
  private val utf8Order: Ordering[String] = (x: String, y: String) => {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(a.length, b.length)
    var r = 0
    while (i < n && r == 0) { r = (a(i) & 0xff) - (b(i) & 0xff); i += 1 }
    if (r != 0) r else a.length - b.length
  }

  /** Code-point symbol split (surrogate pairs stay whole) — the JVM twin
    * of [[charSymbols]] (`split(w, "")`); `String#toVector` (UTF-16
    * chars) would disagree on non-BMP input. */
  private[functions] def codePointSymbols(w: String): Vector[String] =
    w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))

  /** Reference JVM implementation (same tie-break, including Spark's
    * UTF-8-byte string collation and code-point symbol split). For the
    * parity tests — [[trainJvmMerges]] is the production form. */
  def referenceMerges(counts: Map[String, Long], steps: Int): Seq[(Int, String, String, String, Long)] = {
    var words: Map[Vector[String], Long] =
      counts.groupMapReduce { case (w, _) => codePointSymbols(w) } { case (_, c) => c }(_ + _)
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    for (step <- 0 until steps) {
      val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
      for ((sym, c) <- words; i <- 0 until sym.length - 1)
        pairCounts((sym(i), sym(i + 1))) = pairCounts.getOrElse((sym(i), sym(i + 1)), 0L) + c
      if (pairCounts.nonEmpty && out.length == step) {
        val ((l, r), pc) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }(
          Ordering.Tuple3(Ordering.Long, utf8Order, utf8Order))
        out += ((step, l, r, l + r, pc))
        words = words.groupMapReduce { case (sym, _) =>
          val acc = scala.collection.mutable.ArrayBuffer[String]()
          for (x <- sym)
            if (acc.nonEmpty && acc.last == l && x == r) { acc.remove(acc.length - 1); acc += (l + r) }
            else acc += x
          acc.toVector
        } { case (_, c) => c }(_ + _)
      }
    }
    out.toSeq
  }
}
