package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct k-token shingles over an `array<string>` token column —
  * `shingles_of(tokens, k)` → `array<string>`.
  *
  * Byte-equivalent to the Column formulation
  * `array_distinct(transform(sequence(...), i → concat_ws(" ", slice(tokens, i, k))))`
  * (short inputs collapse to one whole-text shingle), but one native pass:
  * the HOF chain evaluates interpreted and allocates an intermediate array
  * per lambda step. This feeds every shingle-explode dedup path.
  */
case class ShinglesExpr(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles_of"

  override def nullSafeEval(input: Any): Any =
    ShinglesExpr.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShinglesExpr.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShinglesExpr {
  private val Space = UTF8String.fromString(" ")

  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val nShingles = if (n >= k) n - k + 1 else 1
    val width = if (n >= k) k else n
    // insertion-ordered distinct, matching array_distinct semantics
    val seen = new java.util.LinkedHashSet[UTF8String](nShingles * 2)
    var i = 0
    while (i < nShingles) {
      val parts = new Array[UTF8String](width)
      var j = 0
      while (j < width) {
        parts(j) = if (tokens.isNullAt(i + j)) UTF8String.EMPTY_UTF8
                   else tokens.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next(); idx += 1 }
    new GenericArrayData(out)
  }
}
