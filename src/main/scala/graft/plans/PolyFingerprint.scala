package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp polynomial fingerprint of a string: `h = (h·31 + cp) mod P`
  * folded over the code points, P = 274876858367 (prime < 2^39, so
  * `h·31 + cp` never overflows a signed 64-bit intermediate). The
  * polynomial family is the classic *rolling* hash — a sliding window
  * updates in O(1) by subtracting the outgoing term — making this the
  * building block for content-defined chunking and shingle fingerprints;
  * the declared x15 query uses the whole-document fold as the dedup
  * fingerprint (a cheaper, codegen'd alternative to the md5 hex form in
  * Text.fingerprint).
  *
  * Deliberately SQL-reproducible: DuckDB computes the identical value via
  * `list_reduce(list_prepend(0, list_transform(range(1, length(t)+1),
  * i -> ascii(substr(t, i, 1)))), (h, c) -> (h*31 + c) % 274876858367)`,
  * which is how the oracle checks it bit-for-bit.
  */
case class PolyFingerprint(child: Expression) extends UnaryExpression {

  override def prettyName: String = "poly_fingerprint"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    PolyFingerprint.hash(input.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.PolyFingerprint.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)
}

object PolyFingerprint {
  /** Prime modulus < 2^39: keeps h·31 + codePoint inside a signed long. */
  val P: Long = 274876858367L

  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }
}
