package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Native linear-classifier margin over hashed token features —
  * `clf_score(tokens, 'w0,w1,…', bias, seed, 'md5'|'xxhash64')` →
  * `bias + mean over tokens of w[bucket(seed, token)]` (the fasttext
  * linear head's raw margin; callers apply the sigmoid as plain Column
  * algebra over the returned attribute).
  *
  * This is THE full-corpus scoring hot path (every document of a 100 TB
  * corpus goes through it once), so the tokenize→hash→lookup→pool chain
  * is ONE fused codegen'd loop. The previous `aggregate` higher-order
  * formulation was CodegenFallback — interpreted per row, with an md5 +
  * two `instr` nibble probes per TOKEN riding a per-step Literal re-wrap
  * (~3× the documents-scan floor, the round-7 verdict's top item). The
  * HOF form survives in `FunctionsSpec` as the differential reference.
  *
  * Bucket modes:
  *  - `md5`: first byte of md5(seed ‖ token) → bucket in [0,256) —
  *    byte-identical to `Curation.hashBucket256`, so scores are
  *    engine-independent and the DuckDB oracle mirrors them exactly.
  *    Requires exactly 256 weights.
  *  - `xxhash64`: XXH64(token, XXH64(seed, 42)) mod weights.length —
  *    the PRODUCTION bucket for real model sizes (2^18+ buckets): no
  *    digest allocation, any weight count. Engine-specific (xxhash64
  *    lanes are not SQL-reproducible in DuckDB by design); semantics
  *    pinned by ScalaTest differential + determinism specs.
  *
  * Null contract (mirrors the HOF fold exactly): null tokens ARRAY →
  * null; a null token ELEMENT nulls the whole score (md5 of null is
  * null, which nulled the fold's accumulator); an empty token array
  * pools 0/0 = NaN.
  */
case class ClfScoreExpr(child: Expression, weights: IndexedSeq[Double], bias: Double,
                        seed: String, bucketMode: String)
    extends UnaryExpression {

  // weights is a Seq, not an Array: case-class equality must compare
  // CONTENTS or two structurally identical clf_score calls would never be
  // equal/semanticEquals (arrays compare by reference), silently defeating
  // Catalyst canonicalization and common-subexpression elimination — the
  // score would be computed once per reference instead of once per row.
  // The hot loop reads the one-time Array copy below.
  @transient private lazy val wArr: Array[Double] = weights.toArray

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "clf_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      if (!ClfScoreExpr.Modes.contains(bucketMode))
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName bucket mode must be one of ${ClfScoreExpr.Modes.mkString("/")}, got '$bucketMode'")
      else if (bucketMode == "md5" && weights.length != 256)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName md5 bucketing needs exactly 256 weights, got ${weights.length}")
      else if (weights.isEmpty)
        TypeCheckResult.TypeCheckFailure(s"$prettyName needs a non-empty weight vector")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> first argument, got ${other.simpleString}")
  }

  @transient private lazy val seedBytes: Array[Byte] =
    seed.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  @transient private lazy val xxSeed: Long = ClfScoreExpr.seedHash(seedBytes)
  private def md5Mode: Boolean = bucketMode == "md5"

  override def nullSafeEval(input: Any): Any =
    ClfScoreExpr.compute(input.asInstanceOf[ArrayData], wArr, bias,
      seedBytes, xxSeed, md5Mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("clfWeights", wArr, "double[]")
    val sRef = ctx.addReferenceObj("clfSeed", seedBytes, "byte[]")
    val boxed = ctx.freshName("clfBoxed")
    nullSafeCodeGen(ctx, ev, c => s"""
      |java.lang.Double $boxed = graft.functions.ClfScoreExpr.compute(
      |  $c, $wRef, $bias, $sRef, ${xxSeed}L, $md5Mode);
      |if ($boxed == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $boxed.doubleValue(); }
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ClfScoreExpr {
  val Modes: Set[String] = Set("md5", "xxhash64")

  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** XXH64 of the raw seed bytes (seed 42) — folded once at plan
    * construction, then each token hashes WITH it as the lane seed, so
    * `seed` perturbs every bucket without a per-token concat.
    */
  def seedHash(seedBytes: Array[Byte]): Long =
    XXH64.hashUnsafeBytes(seedBytes,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, seedBytes.length, 42L)

  /** Static helper shared by eval and codegen: one pass, returns the
    * margin, or null when a token element is null (HOF-fold parity).
    */
  def compute(tokens: ArrayData, w: Array[Double], bias: Double,
              seedBytes: Array[Byte], xxSeed: Long, md5Mode: Boolean): java.lang.Double = {
    val n = tokens.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) return null
      val t = tokens.getUTF8String(i)
      val bucket =
        if (md5Mode) {
          val md = Md5.get()
          md.reset()
          md.update(seedBytes)
          md.update(t.getBytes)
          md.digest()(0) & 0xFF
        } else {
          java.lang.Math.floorMod(
            XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), xxSeed),
            w.length.toLong).toInt
        }
      sum += w(bucket)
      i += 1
    }
    // n == 0 → 0.0/0.0 = NaN, matching aggregate-over-empty / size(empty)
    java.lang.Double.valueOf(bias + sum / n)
  }
}
