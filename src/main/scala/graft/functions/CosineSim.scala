package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over two `array<float>` (or `array<double>`)
  * columns.
  *
  * A single fused loop (dot + both norms) with full whole-stage codegen —
  * versus the composed `aggregate`/`zip_with` formulation, this avoids three
  * separate array traversals and the lambda-variable interpretation
  * overhead. This is the hot inner loop of every similarity scan, so it gets
  * the native treatment (SURVEY.md §2.H).
  *
  * Element types are checked at ANALYSIS (float/double arrays read with the
  * matching accessor, anything else rejected) — before this check, an
  * `array<double>` argument silently read garbage through `getFloat` on a
  * differently-laid-out ArrayData.
  *
  * Mismatched lengths score over the common prefix; empty/zero vectors
  * yield NaN (caller filters).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  private def elemOf(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOf(left.dataType).isEmpty || elemOf(right.dataType).isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val getLeft: (ArrayData, Int) => Double =
    if (elemOf(left.dataType).contains(DoubleType)) (a, i) => a.getDouble(i)
    else (a, i) => a.getFloat(i).toDouble
  @transient private lazy val getRight: (ArrayData, Int) => Double =
    if (elemOf(right.dataType).contains(DoubleType)) (a, i) => a.getDouble(i)
    else (a, i) => a.getFloat(i).toDouble

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0d; var na = 0d; var nb = 0d
    var i = 0
    while (i < n) {
      val xv = getLeft(x, i)
      val yv = getRight(y, i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def accessor(e: Expression): String =
    if (elemOf(e.dataType).contains(DoubleType)) "getDouble" else "getFloat"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double dot = 0.0, na = 0.0, nb = 0.0;
         |for (int i = 0; i < n; i++) {
         |  double x = (double) $a.${accessor(left)}(i);
         |  double y = (double) $b.${accessor(right)}(i);
         |  dot += x * y; na += x * x; nb += y * y;
         |}
         |${ev.value} = dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
