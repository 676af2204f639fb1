package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd BPE merge-table application: all trained merges folded
  * over one word's code-point symbols in a single JVM pass. Replaces the
  * per-merge `foldLeft` of chained higher-order `aggregate` columns in the
  * original `Bpe.applyMerges`, whose plan size (and codegen output) grew
  * LINEARLY with the merge count — fine at 8 merges, unusable at a real
  * 32k-merge vocabulary. Here the merge table is a fold-once reference
  * object; plan size is O(1) in the vocabulary size.
  *
  * Semantics are exactly `Bpe.mergePair` applied in merge order: for each
  * (left, right) merge, one greedy left-to-right non-overlapping rewrite
  * of the symbol array (the merged symbol can immediately serve as the
  * LEFT of the next position's comparison, matching the aggregate() fold).
  * A merged pair is adjacent only if `left+right` occurs as a contiguous
  * substring of the original word, so each merge is prechecked with a
  * byte-level `UTF8String.contains` before paying for a rewrite pass —
  * on a natural-language vocabulary almost all of a large merge table is
  * skipped per word.
  *
  * `right` must be a FOLDABLE `array<array<string>>` merge table, each
  * element a 2-element [left, right] in merge order. Symbols are split at
  * code-point granularity (surrogate pairs stay whole), matching both
  * `Bpe.charSymbols` (Spark's `split(w, "")`) and the JVM trainer.
  */
case class BpeApply(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "bpe_apply"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val wordOk = left.dataType == StringType
    val tabOk = right.dataType match {
      case ArrayType(ArrayType(StringType, _), _) => right.foldable
      case _ => false
    }
    if (wordOk && tabOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, foldable array<array<string>>), " +
        s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  /** Merge table folded at first use: (left, right, left+right as String,
    * left+right as UTF8String for the byte-level substring precheck). */
  @transient private lazy val folded
      : (Array[String], Array[String], Array[String], Array[UTF8String]) = {
    val tab = right.eval().asInstanceOf[ArrayData]
    val n = tab.numElements()
    val ls = new Array[String](n)
    val rs = new Array[String](n)
    val lrs = new Array[String](n)
    val lrU = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val m = tab.getArray(i)
      require(m.numElements() == 2,
        s"$prettyName merge table entries must be [left, right] pairs")
      ls(i) = m.getUTF8String(0).toString
      rs(i) = m.getUTF8String(1).toString
      lrs(i) = ls(i) + rs(i)
      lrU(i) = UTF8String.fromString(lrs(i))
      i += 1
    }
    (ls, rs, lrs, lrU)
  }

  /** One greedy left-to-right merge pass, in place; returns new length. */
  private def mergePass(sym: Array[String], n: Int, l: String, r: String,
      lr: String): Int = {
    var w = 0
    var i = 0
    while (i < n) {
      if (w > 0 && sym(w - 1) == l && sym(i) == r) sym(w - 1) = lr
      else { sym(w) = sym(i); w += 1 }
      i += 1
    }
    w
  }

  /** Apply the full merge table to one word (called from codegen too). */
  def applyWord(word: UTF8String): ArrayData = {
    val (ls, rs, lrs, lrU) = folded
    val s = word.toString
    // code-point symbol split (surrogate pairs whole)
    val sym = new Array[String](s.codePointCount(0, s.length))
    var n = 0
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      sym(n) = new String(Character.toChars(cp))
      n += 1
      ci += Character.charCount(cp)
    }
    var mi = 0
    while (mi < ls.length && n >= 2) {
      if (word.contains(lrU(mi)))
        n = mergePass(sym, n, ls(mi), rs(mi), lrs(mi))
      mi += 1
    }
    val out = new Array[AnyRef](n)
    var oi = 0
    while (oi < n) { out(oi) = UTF8String.fromString(sym(oi)); oi += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    applyWord(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApply", this, classOf[BpeApply].getName)
    nullSafeCodeGen(ctx, ev, (w, _) =>
      s"${ev.value} = $ref.applyWord($w);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeApply =
    copy(left = newLeft, right = newRight)
}
