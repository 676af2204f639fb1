package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram builder — the per-document hot loop of the whole
  * minhash/dedup/span family (shingle relations, LSH signatures, x29/x54
  * positional grams). Replaces the
  * `transform(sequence(0, size−n), i -> concat_ws(" ", toks[i+1]…))`
  * (+ `array_distinct` for shingles) pipeline, whose lambda is interpreted
  * per gram per document and which allocates a sequence array, an
  * intermediate gram array, and a distinct pass per row.
  *
  * Semantics match the HOF form exactly:
  *  - null or shorter-than-n token arrays yield an EMPTY array (the
  *    `when(size(toks) >= n, …).otherwise(array())` contract — note null
  *    in, empty out, so the expression is never null);
  *  - grams are the space-joined token windows in position order,
  *    `concat_ws` null handling included (null tokens are skipped inside
  *    a window, never nulling the gram);
  *  - `distinct = true` reproduces `array_distinct`: first occurrence
  *    wins, order preserved, binary string equality.
  */
case class WordGrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  override def prettyName: String = if (distinct) "word_shingles" else "word_pos_grams"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    WordGrams.compute(v.asInstanceOf[ArrayData], n, distinct)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val resultCode =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.plans.WordGrams.compute(
            ${c.isNull} ? null : ${c.value}, $n, $distinct);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

object WordGrams {
  private val Sep = UTF8String.fromString(" ")
  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Shared kernel (also called from generated code). */
  def compute(toks: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    if (toks == null) return Empty
    val sz = toks.numElements()
    if (sz < n) return Empty
    val m = sz - n + 1
    val parts = new Array[UTF8String](n)
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
      var i = 0
      while (i < m) {
        var j = 0
        while (j < n) {
          parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
          j += 1
        }
        seen.add(UTF8String.concatWs(Sep, parts: _*))
        i += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])
    } else {
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        var j = 0
        while (j < n) {
          parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
          j += 1
        }
        out(i) = UTF8String.concatWs(Sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}
