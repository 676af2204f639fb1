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

  /** Apply a trained merge table to a word relation: the chain of greedy
    * [[mergePair]] folds, in merge order, over the symbol arrays. Applied
    * at VOCAB granularity — tokenization is a pure function of the word,
    * so the corpus-scale stream never re-folds; it joins the vocab-sized
    * symbol table instead. */
  def applyMerges(words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(words.withColumn("sym", charSymbols(col("w")))) {
      case (df, (l, r)) => df.withColumn("sym", mergePair(col("sym"), l, r))
    }

  // merge-table cache — the trained vocabulary is an index-build artifact
  // (deterministic, corpus-version-scoped), the Pq.cachedCodebook rationale
  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()

  private[functions] def cachedMerges(s: SparkSession, dir: String): Seq[(String, String)] = {
    val key = s"${System.identityHashCode(s)}|$dir"
    mergeCache.computeIfAbsent(key, _ =>
      x37BpeMerges(s, dir).collect().map(r => (r.getString(1), r.getString(2))).toSeq)
  }

  /** x55 — BPE tokenization with the TRAINED vocabulary (x37's apply
    * side): per document, whitespace token count, BPE symbol count under
    * [[MergeSteps]] trained merges, and the symbols-per-token ratio a
    * tokenizer-budget planner needs. Rows-only like x37 (the merge table
    * is iteratively trained); the JVM parity test replays train+apply on
    * collected counts. Scale shape: merges fold over the DISTINCT-word
    * relation only; the corpus pays one explode + one word-keyed join +
    * one per-doc aggregate. */
  def x55BpeTokenize(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(s, dir)
    val words = docs
      .select(explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .distinct()
    val vocab = applyMerges(words, cachedMerges(s, dir))
      .select(col("w"), size(col("sym")).as("n_sym"))
    // word-keyed equi-join; vocab is usually broadcast-sized but AQE makes
    // that call at runtime (a 100 TB corpus can exceed the broadcast cap)
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

  /** Reference JVM implementation (same tie-break, including Spark's
    * UTF-8-byte string collation and code-point symbol split — `split(w,
    * "")` keeps surrogate pairs whole, so `String#toVector` (UTF-16 chars)
    * would disagree on non-BMP input). For the parity test. */
  def referenceMerges(counts: Map[String, Long], steps: Int): Seq[(Int, String, String, String, Long)] = {
    def codePointSymbols(w: String): Vector[String] =
      w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
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
