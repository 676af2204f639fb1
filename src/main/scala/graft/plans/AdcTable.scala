package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd ADC table builder: `tab[j][i] = ‖q_j − cb[j][i]‖²`
  * for every subspace j and codeword i, where `q_j` is the j-th
  * dsub-wide slice of the query (residual) vector — one tight loop over
  * primitive arrays per query row. Replaces the nested
  * `transform(m) × transform(k) × sqDist(slice…)` HOF pipeline in
  * `Pq.adcTable`, whose lambdas are interpreted per codeword and
  * re-slice the subvector per comparison ([[PqEncode]]'s rationale
  * applied to the query side of the search).
  *
  * Distance semantics match the HOF form bit-for-bit: the expanded
  * `a·a − 2·a·b + b·b` with each dot accumulated left-to-right over the
  * dsub components (the [[DotProduct]] order), so the oracle-pinned
  * rounded distances are unchanged. `right` must be a FOLDABLE
  * m × k × dsub codebook literal; a query whose length ≠ m·dsub, or any
  * null element, yields null (the HOF's null-poisoned fold).
  */
case class AdcTable(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "adc_table"
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val qOk = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val cbOk = right.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => right.foldable
      case _ => false
    }
    if (qOk && cbOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, foldable array<array<array<double>>>), " +
        s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  /** Codebook flattened at first use: (flat codewords [((j·k)+i)·dsub+p],
    * m, k, dsub) — the [[PqEncode.folded]] shape WITHOUT the norm
    * pre-fold: the HOF computes the full expanded `a·a − 2ab + b·b` per
    * cell with the dots accumulated component-wise, and bit-parity
    * requires reproducing exactly that order (a pre-folded ‖b‖² would
    * sum b·b once in isolation — same value here, but kept inline for
    * clarity that each term is the plain DotProduct accumulation). */
  @transient private lazy val folded: (Array[Double], Int, Int, Int) = {
    val cb = right.eval().asInstanceOf[ArrayData]
    val m = cb.numElements()
    val sub0 = cb.getArray(0)
    val k = sub0.numElements()
    val dsub = sub0.getArray(0).numElements()
    val flat = new Array[Double](m * k * dsub)
    var j = 0
    while (j < m) {
      val sub = cb.getArray(j)
      var i = 0
      while (i < k) {
        val cw = sub.getArray(i)
        val off = (j * k + i) * dsub
        var p = 0
        while (p < dsub) { flat(off + p) = cw.getDouble(p); p += 1 }
        i += 1
      }
      j += 1
    }
    (flat, m, k, dsub)
  }

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** The shared scoring kernel (also called from generated code):
    * returns null on length mismatch or null elements. */
  def buildTable(q: ArrayData, flat: Array[Double], m: Int, k: Int,
                 dsub: Int, fl: Boolean): GenericArrayData = {
    if (q.numElements() != m * dsub) return null
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val row = new Array[Double](k)
      var i = 0
      while (i < k) {
        val off = (j * k + i) * dsub
        // a·b, a·a, b·b each accumulated left-to-right over the dsub
        // components — the DotProduct order the HOF form used
        var ab = 0.0; var aa = 0.0; var bb = 0.0
        var p = 0
        while (p < dsub) {
          val idx = j * dsub + p
          if (q.isNullAt(idx)) return null
          val x = if (fl) q.getFloat(idx).toDouble else q.getDouble(idx)
          val y = flat(off + p)
          ab += x * y; aa += x * x; bb += y * y
          p += 1
        }
        row(i) = aa - 2.0 * ab + bb
        i += 1
      }
      out(j) = new GenericArrayData(row)
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (flat, m, k, dsub) = folded
    buildTable(a.asInstanceOf[ArrayData], flat, m, k, dsub, isFloat)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (flat, m, k, dsub) = folded
    val flatRef = ctx.addReferenceObj("adcFlat", flat, "double[]")
    val self = ctx.addReferenceObj("adcTabExpr", this, classOf[AdcTable].getName)
    nullSafeCodeGen(ctx, ev, (q, _) => {
      val res = ctx.freshName("tabRes")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $res =
         |  $self.buildTable($q, $flatRef, $m, $k, $dsub, ${isFloat.toString});
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): AdcTable =
    copy(left = newLeft, right = newRight)
}
