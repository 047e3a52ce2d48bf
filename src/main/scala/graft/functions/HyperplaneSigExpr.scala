package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

import scala.util.Random

/** Native random-hyperplane LSH signature over an `array<float>` (or
  * `array<double>`) vector — `hyperplane_sig(vec, dim, numPlanes, seed)` →
  * 64-bit bucket id.
  *
  * Planes are generated ONCE at expression construction from the seed
  * (same `Random(seed).nextGaussian` stream as the Column formulation)
  * and shipped as a plan reference object; per row the signature is
  * `numPlanes` fused dot products. The zip_with/aggregate formulation
  * evaluates interpreted and re-materializes a product array per plane.
  *
  * Element types are checked at ANALYSIS — before this check, an
  * `array<double>` argument silently read garbage through `getFloat`.
  */
case class HyperplaneSigExpr(child: Expression, dim: Int, numPlanes: Int, seed: Long)
    extends UnaryExpression {

  require(numPlanes <= 64, "hyperplane_sig: at most 64 planes fit the long signature")

  @transient private lazy val planes: Array[Array[Double]] =
    HyperplaneSigExpr.planesFor(dim, numPlanes, seed)

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> or array<double> argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    HyperplaneSigExpr.compute(input.asInstanceOf[ArrayData], planes, isDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneSigExpr.compute($c, $planesRef, $isDouble)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSigExpr {
  /** Seeded Gaussian planes — MUST match `Similarity.hyperplanes`'s
    * Random stream so signatures are stable across code paths.
    */
  def planesFor(dim: Int, numPlanes: Int, seed: Long): Array[Array[Double]] = {
    val rng = new Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  def compute(vec: ArrayData, planes: Array[Array[Double]], elemIsDouble: Boolean): Long = {
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(vec.numElements(), plane.length)
      var dot = 0d
      var i = 0
      while (i < n) {
        dot += (if (elemIsDouble) vec.getDouble(i) else vec.getFloat(i).toDouble) * plane(i)
        i += 1
      }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}
