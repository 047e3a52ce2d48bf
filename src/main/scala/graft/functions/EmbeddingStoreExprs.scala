package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Embedding STORAGE preprocessing — the two transforms every
  * vector-corpus pipeline runs before persisting embeddings at scale:
  *
  *  - `l2_normalize(vec)` → unit-length `array<float>`: cosine similarity
  *    over normalized vectors degrades to a dot product, and downstream
  *    quantization error becomes scale-independent.
  *  - `quantize_i8(vec)` → `struct(scale double, q array<tinyint>)`:
  *    symmetric int8 quantization (q_i = trunc(x_i · 127/max|x|), clamped
  *    to ±127) — a 4× storage/bandwidth cut on a 100 TB embedding corpus,
  *    with the per-row scale stored for dequantization (x̂_i = q_i/scale).
  *
  * Both are native single-pass expressions (SURVEY.md §2.H): an
  * element-wise `transform` lambda is CodegenFallback — interpreted per
  * LANE, the wrong constant for corpus-wide preprocessing. All arithmetic
  * is double-precision and engine-portable, so the DuckDB oracle mirrors
  * it bit-for-bit.
  *
  * A vector with a NULL lane is an invalid embedding: both expressions
  * return NULL for it (silently reading the slot as 0.0 would fabricate
  * a direction; the caller decides whether to drop or repair).
  */
trait VecUnaryExpr extends UnaryExpression {
  protected def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  override def nullable: Boolean = true // null input OR a null-lane vector

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> or array<double> argument, got ${other.simpleString}")
  }

  /** eval/codegen shared: compute may return null (null-lane vector) —
    * route it into the expression's null slot, not a bare null value.
    */
  protected def nullAwareGenCode(ctx: CodegenContext, ev: ExprCode,
                                 call: String => String): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = ${call(c)};
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
}

case class L2NormalizeExpr(child: Expression) extends VecUnaryExpr {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "l2_normalize"

  override def nullSafeEval(input: Any): Any =
    L2NormalizeExpr.compute(input.asInstanceOf[ArrayData], isDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullAwareGenCode(ctx, ev, c => s"graft.functions.L2NormalizeExpr.compute($c, $isDouble)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object L2NormalizeExpr {
  /** Zero vectors pass through unchanged (still zero after "normalize");
    * a null, NaN, or infinite lane nulls the result — dividing by a
    * NaN/Inf norm would otherwise fabricate a direction out of an
    * invalid embedding (same contract as `quantize_i8`).
    */
  def compute(vec: ArrayData, elemIsDouble: Boolean): ArrayData = {
    val n = vec.numElements()
    var ss = 0d
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      val x = if (elemIsDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
      if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return null
      ss += x * x
      i += 1
    }
    val norm = math.sqrt(ss)
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      val x = if (elemIsDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
      out(i) = if (norm == 0d) 0.0f else (x / norm).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class QuantizeI8Expr(child: Expression) extends VecUnaryExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false)))
  override def prettyName: String = "quantize_i8"

  override def nullSafeEval(input: Any): Any =
    QuantizeI8Expr.compute(input.asInstanceOf[ArrayData], isDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullAwareGenCode(ctx, ev, c => s"graft.functions.QuantizeI8Expr.compute($c, $isDouble)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeI8Expr {
  /** scale = 127/max|x| (0 for the all-zero vector, whose q is all
    * zeros); q_i = trunc(x_i · scale) clamped to [-127, 127]. trunc, not
    * round: truncation is identical across engines while round-half
    * conventions differ. A null, NaN, or infinite lane nulls the result
    * — (NaN·scale).toLong is 0, so such a lane would otherwise quantize
    * to a FABRICATED real value (and an Inf lane would zero the whole
    * vector via scale = 0), exactly the corruption the null contract
    * exists to prevent.
    */
  def compute(vec: ArrayData, elemIsDouble: Boolean): InternalRow = {
    val n = vec.numElements()
    var maxAbs = 0d
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      val x = if (elemIsDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
      if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return null
      val a = math.abs(x)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = if (maxAbs == 0d) 0d else 127d / maxAbs
    val q = new Array[Any](n)
    i = 0
    while (i < n) {
      val x = if (elemIsDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
      val t = (x * scale).toLong // toward zero
      q(i) = math.max(-127L, math.min(127L, t)).toByte
      i += 1
    }
    new GenericInternalRow(Array[Any](scale, new GenericArrayData(q)))
  }
}
