package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two numeric array columns (float or
  * double elements) — the single-accumulator sibling of [[CosineSimilarity]].
  * Used by the LSH bucketing hot path (per-row × nPlanes projections over the
  * full corpus): one tight primitive loop replaces the `zip_with`+`aggregate`
  * HOF pipeline, which allocates an intermediate array and evaluates a lambda
  * per element.
  *
  * Semantics match the HOF form exactly: per-element double accumulation in
  * array order (so results are bit-identical and the deterministic LSH bucket
  * ids — which feed the inlined-hyperplane DuckDB oracles — are unchanged).
  * Returns null for null inputs, length mismatch, or any null array element
  * (a null element poisons the HOF fold).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "dot_product"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => other
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> inputs, " +
        s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  @inline private def get(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case _         => arr.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (arr1, arr2) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = arr1.numElements()
    if (n != arr2.numElements()) return null
    val (et1, et2) = (elemType(left), elemType(right))
    var ab = 0.0
    var i = 0
    while (i < n) {
      if (arr1.isNullAt(i) || arr2.isNullAt(i)) return null
      ab += get(arr1, i, et1) * get(arr2, i, et2)
      i += 1
    }
    ab
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(arr: String, i: String, et: DataType): String = et match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (arr1, arr2) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ab = ctx.freshName("ab")
      s"""
         |int $n = $arr1.numElements();
         |if ($n != $arr2.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $ab = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($arr1.isNullAt($i) || $arr2.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $ab += ${getter(arr1, i, elemType(left))} * ${getter(arr2, i, elemType(right))};
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $ab;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
