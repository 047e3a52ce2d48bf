package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash over an `array<string>` token column.
  *
  * One pass over the tokens, a 64-int vote accumulator, one 64-bit hash
  * per token — O(tokens) versus the O(64·tokens) pure-Column formulation
  * in `Dedup.simhash64`. Used as the scale path; the Column version
  * doubles as its differential test.
  *
  * Token-hash modes: `xx` (default — same xxhash64(seed 42) family as
  * Spark's `xxhash64`) and `md5_64` (first 8 md5 digest bytes,
  * [[Md5Hash.hash64]]) — the ENGINE-PORTABLE mode whose per-bit majority
  * vote DuckDB can mirror from the md5 hex string, buying
  * `q_dedup_simhash` a real oracle.
  */
case class SimHash64Expr(child: Expression, hashMode: String = "xx")
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType, _) =>
        if (hashMode == "xx" || hashMode == "md5_64") TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName mode must be xx or md5_64, got '$hashMode'")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> argument, got ${other.simpleString}")
    }
  }

  private def md5Mode: Boolean = hashMode == "md5_64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64Expr.compute(arr, md5Mode)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64Expr.compute($c, $md5Mode)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64Expr {
  /** Static helper shared by eval and codegen. */
  def compute(arr: ArrayData, md5Mode: Boolean): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    var total = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = if (md5Mode) Md5Hash.hash64(s) else hashUtf8(s)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1
          b += 1
        }
        total += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) * 2 > total) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Same xxhash64(seed=42) Spark's `xxhash64` function uses on strings. */
  def hashUtf8(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
}
