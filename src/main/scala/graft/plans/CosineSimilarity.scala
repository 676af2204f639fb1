package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity over two numeric array columns
  * (float or double elements), single-pass: one loop accumulates a·b, a·a,
  * b·b. Replaces the `zip_with`+`aggregate` higher-order-function pipeline
  * (which allocates an intermediate array and evaluates a lambda per
  * element) with a tight primitive loop inside whole-stage codegen — the
  * (b)-tier extension path from SURVEY.md §2.3 for the D20 hot loop.
  *
  * Semantics match the declared oracle exactly: per-element double
  * accumulation in array order, `dot / (sqrt(aa) * sqrt(bb))`. Returns null
  * for null inputs, length mismatch, or any null array element (matching
  * the zip_with/aggregate HOF form, where a null element poisons the fold).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "cosine_similarity"
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
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if (arr1.isNullAt(i) || arr2.isNullAt(i)) return null
      val x = get(arr1, i, et1)
      val y = get(arr2, i, et2)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
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
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      s"""
         |int $n = $arr1.numElements();
         |if ($n != $arr2.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($arr1.isNullAt($i) || $arr2.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double x = ${getter(arr1, i, elemType(left))};
         |    double y = ${getter(arr2, i, elemType(right))};
         |    $ab += x * y; $aa += x * x; $bb += y * y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
