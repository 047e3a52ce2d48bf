package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native marker-word counter over an `array<string>` token column —
  * `marker_count(tokens, 'w1,w2,…')` → number of tokens in the set.
  *
  * Replaces the `size(filter(tokens, w => w.isin(words)))` higher-order
  * formulation, which is CodegenFallback (interpreted per row, one lambda
  * invocation per token) — the largest remaining per-row interpreter cost
  * on the text hot path (language ID evaluates four marker sets per
  * document). Here the marker set is one hash set built at plan
  * construction and shipped as a plan reference; per row the count is a
  * single fused loop with O(1) membership probes. The HOF formulation
  * survives in `FunctionsSpec` as the differential reference.
  *
  * Reference behavior mirrored: language/quality scoring over the
  * documents table (SURVEY.md §2.F).
  */
case class MarkerCountExpr(child: Expression, words: Seq[String])
    extends UnaryExpression {

  @transient private lazy val markerSet: java.util.HashSet[UTF8String] =
    MarkerCountExpr.setOf(words)

  override def dataType: DataType = IntegerType
  override def prettyName: String = "marker_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MarkerCountExpr.compute(input.asInstanceOf[ArrayData], markerSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("markers", markerSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.MarkerCountExpr.compute($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MarkerCountExpr {
  def setOf(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** Static helper shared by eval and codegen. Null tokens never match
    * (isin(null) is null → filter drops it, same as here).
    */
  def compute(tokens: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = tokens.numElements()
    var count = 0
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i) && set.contains(tokens.getUTF8String(i))) count += 1
      i += 1
    }
    count
  }
}
