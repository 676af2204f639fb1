package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries via a TRUE rolling hash — the operator
  * the [[PolyFingerprint]] family exists for: a sliding [[CdcBoundaries.W]]-
  * code-point Rabin–Karp window updates in O(1) per position
  * (`h' = (h·31 + c_in − c_out·31^W) mod P`), and a boundary is declared
  * after position i when `h mod 2^maskBits == 0`; the final position is
  * always a boundary. Because boundaries depend only on local CONTENT, an
  * insertion early in a document shifts every byte offset but leaves all
  * downstream chunk hashes identical — the property that makes CDC chunking
  * the dedup-stable storage layout (and the reason fixed-size chunking
  * can't be used for dedup at all).
  *
  * O(n) per document vs the O(n·W) per-position refold; whole-stage codegen
  * via a static helper (same discipline as [[PolyFingerprint]]). The DuckDB
  * oracle reproduces boundaries bit-for-bit with the O(n·W) refold, which
  * doubles as the rolling-update correctness check: both sides agree only
  * if the incremental subtraction is exactly the window fold. */
case class CdcBoundaries(child: Expression) extends UnaryExpression {

  override def prettyName: String = "cdc_chunks"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    CdcBoundaries.boundaries(input.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.CdcBoundaries.boundaries($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {
  /** Rolling window width in code points. */
  val W = 16

  /** Boundary when the window hash has this many low zero bits → expected
    * chunk length 2^MaskBits = 64 code points. */
  val MaskBits = 6

  private val P = PolyFingerprint.P
  /** 31^W mod P, the outgoing term's coefficient. */
  val Pow31W: Long = {
    var r = 1L
    var i = 0
    while (i < W) { r = (r * 31) % P; i += 1 }
    r
  }

  def boundaries(s: String): GenericArrayData = {
    val mask = (1 << MaskBits) - 1
    // code points of the current window, ring-buffered for the O(1) slide
    val ring = new Array[Int](W)
    val out = scala.collection.mutable.ArrayBuffer[Int]()
    var h = 0L
    var cp = 0 // code points consumed
    var i = 0  // char index
    while (i < s.length) {
      val c = s.codePointAt(i)
      if (cp < W) h = (h * 31 + c) % P
      else {
        val outgoing = ring(cp % W)
        // Math.floorMod keeps the subtraction's result in [0, P)
        h = Math.floorMod(h * 31 + c - (outgoing * Pow31W) % P, P)
      }
      ring(cp % W) = c
      cp += 1
      if (cp >= W && (h & mask) == 0) out += cp
      i += Character.charCount(c)
    }
    if (out.isEmpty || out.last != cp) out += cp
    new GenericArrayData(out.toArray)
  }
}
