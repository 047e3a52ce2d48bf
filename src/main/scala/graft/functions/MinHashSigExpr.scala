package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature over an `array<string>` token column:
  * k-token shingles → base hash per shingle → `numHashes` affine lanes
  * (h_j = a_j·x + b_j over Z/2^64, SIGNED-long min per lane).
  *
  * Base-hash modes:
  *  - `xx` (default): xxhash64(seed 42) — the production hash.
  *  - `md5_52`: the 52-bit md5 prefix ([[Md5Hash.hash52]]) — the
  *    ENGINE-PORTABLE mode DuckDB mirrors lane-by-lane (the affine
  *    constants are plain integers and the mod-2^64 lane arithmetic is
  *    HUGEINT-expressible), which is what buys `q_dedup_minhash_sig` a
  *    real hash-matched oracle.
  *
  * One pass over the tokens with zero intermediate arrays. The equivalent
  * higher-order-function formulation (transform/slice/concat_ws/array_min)
  * evaluates interpreted AND re-materializes the shingle array once per
  * lane — measured 50× slower at sf0.1. Shingle bytes are identical to
  * `concat_ws(" ", slice(tokens, i, k))`, so this expression is
  * differentially testable against the Column version.
  */
case class MinHashSigExpr(child: Expression, k: Int, numHashes: Int,
                          hashMode: String = "xx")
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        if (hashMode == "xx" || hashMode == "md5_52") TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName mode must be xx or md5_52, got '$hashMode'")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> argument, got ${other.simpleString}")
    }
  }

  private def md5Mode: Boolean = hashMode == "md5_52"

  override def nullSafeEval(input: Any): Any =
    MinHashSigExpr.compute(input.asInstanceOf[ArrayData], k, numHashes, md5Mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSigExpr.compute($c, $k, $numHashes, $md5Mode)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpr {
  /** Odd multiplier / offset for lane j — fixed constants keep runs
    * reproducible across clusters (SURVEY.md §4).
    */
  @inline def laneA(j: Int): Long = 0x9E3779B97F4A7C15L + 2L * j
  @inline def laneB(j: Int): Long = 0xC2B2AE3D27D4EB4FL * (j + 1)

  private val Space = UTF8String.fromString(" ")

  def compute(tokens: ArrayData, k: Int, numHashes: Int, md5Mode: Boolean): ArrayData = {
    val n = tokens.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)

    val nShingles = if (n >= k) n - k + 1 else 1
    val width = if (n >= k) k else n
    var i = 0
    while (i < nShingles) {
      // shingle := tokens[i .. i+width) joined by " " (= concat_ws bytes)
      val parts = new Array[UTF8String](width)
      var j = 0
      while (j < width) {
        parts(j) = if (tokens.isNullAt(i + j)) UTF8String.EMPTY_UTF8
                   else tokens.getUTF8String(i + j)
        j += 1
      }
      val s = UTF8String.concatWs(Space, parts: _*)
      val h = if (md5Mode) Md5Hash.hash52(s)
              else org.apache.spark.sql.catalyst.expressions.XXH64
                .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      var lane = 0
      while (lane < numHashes) {
        val v = h * laneA(lane) + laneB(lane)
        if (v < mins(lane)) mins(lane) = v
        lane += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
