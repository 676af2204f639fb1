package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd ADC score: `Σ_j tab[j][codes[j]]` — the per-row hot
  * loop of every IVFADC/PQ search, evaluated for ~nprobe/nlist of the
  * corpus per query batch. Replaces the `aggregate(sequence(0, m−1), …)`
  * higher-order-function pipeline in `Pq.adcScore`, whose lambda is
  * interpreted per subspace per row (the same reason [[PqEncode]] exists
  * for the encode side).
  *
  * Semantics match the HOF form for codes in [0, k) — the only values
  * [[PqEncode]] produces — including the accumulation order
  * (left-to-right over j, starting from 0.0 — IEEE-identical) and the
  * null contract: a null/short `codes` entry, an out-of-range code, or a
  * null table cell — anything the HOF's `element_at` would turn into a
  * null addend — makes the whole score null, exactly like `acc + null`
  * poisons the fold. Known intentional divergence (ADVICE r20): NEGATIVE
  * codes also return null here, whereas the HOF's `element_at(row, c+1)`
  * throws on c = −1 and reads from the array END for c in [−k, −2];
  * corrupted/adversarial code rows degrade to null instead of
  * engine-specific behavior.
  */
case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "adc_score"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val tabOk = left.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    val codesOk = right.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (tabOk && codesOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<array<double>>, array<int>), " +
        s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val tab = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = tab.numElements()
    if (codes.numElements() < m) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (tab.isNullAt(j) || codes.isNullAt(j)) return null
      val row = tab.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= row.numElements() || row.isNullAt(c)) return null
      acc += row.getDouble(c)
      j += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tab, codes) => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      s"""
         |int $m = $tab.numElements();
         |if ($codes.numElements() < $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
         |    if ($tab.isNullAt($j) || $codes.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    org.apache.spark.sql.catalyst.util.ArrayData $row = $tab.getArray($j);
         |    int $c = $codes.getInt($j);
         |    if ($c < 0 || $c >= $row.numElements() || $row.isNullAt($c)) { ${ev.isNull} = true; break; }
         |    $acc += $row.getDouble($c);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}
