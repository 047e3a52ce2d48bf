package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Morton (Z-order) bit-interleave of a d-dimensional bucket coordinate —
  * `morton_index(array<int>, bitsPerCoord)` → long. The fused sibling of
  * [[HilbertIndexExpr]] behind `writeZOrdered(curve = "morton")`:
  * composed with `quantile_buckets` it replaces the
  * `Σ shiftleft(shiftright(bucketExpr, j) & 1, …)` Column formulation,
  * whose 2^bits-way bucket chains evaluated once per BIT position and
  * kept the write's projection an order of magnitude hotter than one
  * binary search + one interleave loop (measured 3.2 s → 1.9 s on the
  * sf0.1 clustered write after the switch). Bit layout matches the
  * Column formulation exactly: output bit `j·d + i` = bit `j` of
  * coordinate `i`. Null coordinates read as 0.
  */
case class MortonIndexExpr(child: Expression, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "morton_index"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<int> argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MortonIndexExpr.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MortonIndexExpr.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MortonIndexExpr {
  /** Static kernel shared by eval and codegen. */
  def compute(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    // n is only known at runtime for SQL callers; past 63 total bits the
    // shift amount j*n+i wraps mod 64 in Java and indices silently collide.
    if (n.toLong * bits > 63) throw new IllegalArgumentException(
      s"morton_index: $n coords x $bits bits = ${n * bits} total bits exceeds 63")
    var z = 0L
    var i = 0
    while (i < n) {
      val x = if (arr.isNullAt(i)) 0 else arr.getInt(i)
      var j = 0
      while (j < bits) {
        z |= ((x >> j) & 1L) << (j * n + i)
        j += 1
      }
      i += 1
    }
    z
  }
}
