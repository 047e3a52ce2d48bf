package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits) of one document's token distribution —
  * `token_entropy(tokens)` → double. A quality signal: very low entropy
  * flags repetitive spam/boilerplate (keyword stuffing, navigation
  * chrome), complementing the repetition ratios (which look at ADJACENT
  * duplication) with a distribution-level view; very high entropy at
  * fixed length flags gibberish/random-id text.
  *
  * One pass, one per-row hash map, ZERO shuffle — the alternative is
  * exploding every token to a (doc, token) count aggregate, a corpus-
  * scale exchange for a per-row scalar. Uses the factored form
  * `H = log2(n) − (Σ c·log2 c)/n`, one log per DISTINCT token.
  *
  * Contract: empty array → 0.0; null tokens count as the empty token
  * (the tokenizer never emits them, but the function is total); null
  * array → null (UnaryExpression convention).
  *
  * Reference behavior mirrored: text-quality scoring over the documents
  * table (SURVEY.md §2.F).
  */
case class TokenEntropyExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "token_entropy"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TokenEntropyExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenEntropyExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenEntropyExpr {
  private val Log2 = math.log(2.0)

  /** Static helper shared by eval and codegen. */
  def compute(tokens: ArrayData): Double = {
    val n = tokens.numElements()
    if (n == 0) return 0.0
    val counts = new java.util.HashMap[UTF8String, Long](n * 2)
    var i = 0
    while (i < n) {
      val t = if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8
              else tokens.getUTF8String(i)
      counts.merge(t, 1L, (a, b) => a + b)
      i += 1
    }
    var s = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      s += c * (math.log(c) / Log2)
    }
    math.log(n.toDouble) / Log2 - s / n
  }
}
