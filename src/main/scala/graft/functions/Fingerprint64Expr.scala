package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native rolling polynomial document fingerprint over an `array<string>`
  * token column (Rabin-Karp style) —
  * `fingerprint64(tokens)` → h where h_i = h_{i-1} * B + xxhash64(token_i)
  * (mod 2^64 via Long overflow, B = 1000003).
  *
  * Bit-equivalent to the `aggregate(tokens, 0L, (acc, t) => acc * B +
  * xxhash64(t))` higher-order formulation (which is CodegenFallback —
  * interpreted lambda per token, plus a per-step Literal re-wrap) — that
  * formulation survives in `FunctionsSpec` as the differential reference.
  * Null tokens contribute the seed (42), exactly what `xxhash64(null)`
  * yields inside the aggregate.
  */
case class Fingerprint64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    Fingerprint64Expr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fingerprint64Expr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Fingerprint64Expr {
  final val B = 1000003L

  /** Static helper shared by eval and codegen. */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    var h = 0L
    var i = 0
    while (i < n) {
      val th = if (tokens.isNullAt(i)) 42L
               else SimHash64Expr.hashUtf8(tokens.getUTF8String(i))
      h = h * B + th
      i += 1
    }
    h
  }
}
