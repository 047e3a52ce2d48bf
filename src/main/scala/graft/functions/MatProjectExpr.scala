package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `mat_project(modelBytes, vec)` → `array<float>`: the CENTERED linear
  * projection `y = B · (x − μ)` — one fused kernel for projecting an
  * embedding corpus into a learned low-dimensional basis (PCA /
  * random-projection compression of a vector store). The model — mean
  * vector μ and k×d basis B, packed by [[MatCodec]] — ships as a
  * BINARY LITERAL riding the plan (the `pq_encode` codebook
  * discipline): deserialized once per task via `addReferenceObj`,
  * never per row, and the projection stays inside whole-stage codegen.
  * A `transform`/`aggregate` lambda chain computing k dot products
  * would be CodegenFallback, interpreted per lane — the wrong constant
  * for a corpus-wide rewrite.
  *
  * NULL contract (the [[L2NormalizeExpr]] rule): a null vector or a
  * vector with a null/NaN/infinite lane yields NULL — projecting an
  * invalid embedding would fabricate a direction. A dimension mismatch
  * against the model refuses loudly (it is a pipeline bug, not a data
  * quality state).
  */
case class MatProjectExpr(model: Expression, vec: Expression)
    extends BinaryExpression {

  override def left: Expression = model
  override def right: Expression = vec
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "mat_project"

  override def checkInputDataTypes(): TypeCheckResult =
    if (model.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary model argument, got ${model.dataType.simpleString}")
    else if (!model.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a LITERAL model (deserialized once per task, not per row)")
    else vec.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> or array<double> vector, got ${other.simpleString}")
    }

  private def elemIsDouble: Boolean = vec.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  @transient private lazy val m: MatCodec.Model = {
    val bytes = model.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: model literal is null")
    MatCodec.deserialize(bytes)
  }

  override def nullSafeEval(mb: Any, v: Any): Any =
    MatCodec.project(v.asInstanceOf[ArrayData], m, elemIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matModel", m, classOf[MatCodec.Model].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => s"""
       |${ev.value} = graft.functions.MatCodec.project($v, $ref, $elemIsDouble);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(model = newLeft, vec = newRight)
}

object MatCodec {
  /** μ (length d) + row-major k×d basis. */
  final case class Model(mean: Array[Float], basis: Array[Float], dim: Int, k: Int)

  /** Pack as: int dim, int k, d mean floats, k·d basis floats
    * (row-major) — one flat buffer, version-free (the two ints ARE the
    * shape check).
    */
  def serialize(mean: Array[Float], basis: Array[Array[Float]]): Array[Byte] = {
    val d = mean.length
    val k = basis.length
    require(basis.forall(_.length == d),
      s"mat_project: every basis row must have length $d")
    val buf = java.nio.ByteBuffer.allocate(8 + 4 * d + 4 * k * d)
    buf.putInt(d); buf.putInt(k)
    mean.foreach(buf.putFloat)
    basis.foreach(_.foreach(buf.putFloat))
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): Model = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val d = buf.getInt
    val k = buf.getInt
    require(d > 0 && k > 0 && bytes.length == 8 + 4 * d + 4 * k * d,
      s"mat_project: malformed model buffer (${bytes.length} bytes for dim=$d, k=$k)")
    val mean = Array.fill(d)(buf.getFloat)
    val basis = Array.fill(k * d)(buf.getFloat)
    Model(mean, basis, d, k)
  }

  /** y_j = Σ_i basis[j·d+i] · (x_i − μ_i); double accumulation per
    * output lane. Null for an invalid vector; loud for a wrong shape.
    */
  def project(vec: ArrayData, m: Model, elemIsDouble: Boolean): ArrayData = {
    val n = vec.numElements()
    require(n == m.dim,
      s"mat_project: vector has $n lanes, model expects ${m.dim}")
    // validity pass first: any null/NaN/Inf lane nulls the whole result
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      val x = if (elemIsDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
      if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return null
      i += 1
    }
    val out = new Array[Any](m.k)
    var j = 0
    while (j < m.k) {
      var acc = 0d
      val base = j * m.dim
      i = 0
      while (i < n) {
        val x = if (elemIsDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
        acc += m.basis(base + i) * (x - m.mean(i))
        i += 1
      }
      out(j) = acc.toFloat
      j += 1
    }
    new GenericArrayData(out)
  }
}
