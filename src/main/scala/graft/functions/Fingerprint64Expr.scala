package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native rolling polynomial document fingerprint over an `array<string>`
  * token column (Rabin-Karp style) —
  * `fingerprint64(tokens[, mode])` → h where
  * h_i = h_{i-1} * B + tokenHash(token_i) (mod 2^64 via Long overflow,
  * B = 1000003).
  *
  * Token-hash modes:
  *  - `xx` (default): xxhash64(token, seed 42) — the production hash.
  *    Bit-equivalent to the `aggregate(tokens, 0L, (acc, t) => acc * B +
  *    xxhash64(t))` higher-order formulation (which is CodegenFallback —
  *    interpreted lambda per token, plus a per-step Literal re-wrap) —
  *    that formulation survives in `FunctionsSpec` as the differential
  *    reference. Null tokens contribute the seed (42), exactly what
  *    `xxhash64(null)` yields inside the aggregate.
  *  - `md5_52`: the 52-bit md5 prefix ([[Md5Hash.hash52]]) — the
  *    ENGINE-PORTABLE mode: DuckDB mirrors the whole fold with a
  *    list_reduce over HUGEINT mod-2^64 arithmetic, so `q_fingerprint`
  *    gets a real hash-matched oracle instead of rows-only. Same
  *    rolling structure, same null contract (null token → 42), pinned
  *    bit-equivalent to `xx` STRUCTURE by the cross-mode spec.
  */
case class Fingerprint64Expr(child: Expression, hashMode: String = "xx")
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      if (hashMode == "xx" || hashMode == "md5_52") TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName mode must be xx or md5_52, got '$hashMode'")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${other.simpleString}")
  }

  private def md5Mode: Boolean = hashMode == "md5_52"

  override def nullSafeEval(input: Any): Any =
    Fingerprint64Expr.compute(input.asInstanceOf[ArrayData], md5Mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fingerprint64Expr.compute($c, $md5Mode)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Fingerprint64Expr {
  final val B = 1000003L

  /** Static helper shared by eval and codegen. */
  def compute(tokens: ArrayData, md5Mode: Boolean): Long = {
    val n = tokens.numElements()
    var h = 0L
    var i = 0
    while (i < n) {
      val th = if (tokens.isNullAt(i)) 42L
               else if (md5Mode) Md5Hash.hash52(tokens.getUTF8String(i))
               else SimHash64Expr.hashUtf8(tokens.getUTF8String(i))
      h = h * B + th
      i += 1
    }
    h
  }
}
