package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd product-quantization encoder: all `m` subspace code
  * assignments of one embedding in a single tight loop over primitive
  * arrays. Replaces the nested `transform`(m) × `transform`(k) × dot HOF
  * pipeline in `Pq.encode`, whose lambdas are interpreted per codeword and
  * re-slice the subvector per comparison — the difference is ~100× on the
  * encode scan, which is the dominant term of `x30_pq_ann` after training.
  *
  * Distance: argmin over `‖c‖² − 2·(sv·c)` — the per-subvector `‖sv‖²`
  * term of the full expanded squared L2 is constant across codewords, so
  * dropping it preserves the argmin while removing a third of the
  * multiplies. `‖c‖²` is folded once per codeword at codebook load, with
  * the same left-to-right accumulation order as [[DotProduct]]; ties keep
  * the lowest codeword id (strict `<` on the scan). The JVM parity test
  * (FunctionsSpec "exact parity") recomputes this exact formula.
  *
  * `right` must be a FOLDABLE `array<array<array<double>>>` codebook
  * literal of shape m × k × dsub; the input embedding must have exactly
  * m·dsub float/double elements (else null, like a length-mismatched
  * [[DotProduct]]).
  */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val embOk = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val cbOk = right.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => right.foldable
      case _ => false
    }
    if (embOk && cbOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, foldable array<array<array<double>>>), " +
        s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  /** Codebook flattened at first use: (flat codewords [((j·k)+i)·dsub+p],
    * ‖c‖² per (j·k)+i, m, k, dsub). */
  @transient private lazy val folded: (Array[Double], Array[Double], Int, Int, Int) = {
    val cb = right.eval().asInstanceOf[ArrayData]
    val m = cb.numElements()
    val sub0 = cb.getArray(0)
    val k = sub0.numElements()
    val dsub = sub0.getArray(0).numElements()
    val flat = new Array[Double](m * k * dsub)
    val cnorm = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      val sub = cb.getArray(j)
      var i = 0
      while (i < k) {
        val cw = sub.getArray(i)
        val off = (j * k + i) * dsub
        var n2 = 0.0
        var p = 0
        while (p < dsub) {
          val v = cw.getDouble(p)
          flat(off + p) = v
          n2 += v * v
          p += 1
        }
        cnorm(j * k + i) = n2
        i += 1
      }
      j += 1
    }
    (flat, cnorm, m, k, dsub)
  }

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (flat, cnorm, m, k, dsub) = folded
    val emb = a.asInstanceOf[ArrayData]
    if (emb.numElements() != m * dsub) return null
    val fl = isFloat
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var i = 0
      while (i < k) {
        val off = (j * k + i) * dsub
        var ab = 0.0
        var p = 0
        while (p < dsub) {
          val idx = j * dsub + p
          if (emb.isNullAt(idx)) return null
          ab += (if (fl) emb.getFloat(idx).toDouble else emb.getDouble(idx)) * flat(off + p)
          p += 1
        }
        val d = cnorm(j * k + i) - 2.0 * ab
        if (d < bestD) { bestD = d; best = i }
        i += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (flat, cnorm, m, k, dsub) = folded
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val cnormRef = ctx.addReferenceObj("pqCnorm", cnorm, "double[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (emb, _) => {
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val ab = ctx.freshName("ab")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val off = ctx.freshName("off")
      val idx = ctx.freshName("idx")
      s"""
         |if ($emb.numElements() != ${m * dsub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $codes = new int[$m];
         |  for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
         |    int $best = 0;
         |    double $bestD = Double.POSITIVE_INFINITY;
         |    for (int $i = 0; $i < $k && !${ev.isNull}; $i++) {
         |      int $off = ($j * $k + $i) * $dsub;
         |      double $ab = 0.0;
         |      for (int $p = 0; $p < $dsub; $p++) {
         |        int $idx = $j * $dsub + $p;
         |        if ($emb.isNullAt($idx)) { ${ev.isNull} = true; break; }
         |        $ab += ((double) $emb.$getter($idx)) * $flatRef[$off + $p];
         |      }
         |      double $d = $cnormRef[$j * $k + $i] - 2.0 * $ab;
         |      if ($d < $bestD) { $bestD = $d; $best = $i; }
         |    }
         |    $codes[$j] = $best;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}
