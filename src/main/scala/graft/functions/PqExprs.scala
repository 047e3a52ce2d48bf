package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Product-quantization kernels (Jégou et al., TPAMI 2011): a vector is
  * split into `m` subvectors, each encoded as the index of its nearest
  * sub-codebook centroid — `m` bytes instead of `dim × 4`, the
  * memory/bandwidth-compression ANN path that complements IVF's
  * partition pruning (`ivf*`) and `quantize_i8`'s scalar quantization.
  *
  * Both expressions take the TRAINED codebook as a foldable binary
  * argument (same convention as `bloom_might_contain`): the ~m·k·subDim
  * floats deserialize ONCE per task via a plan-reference object, never
  * per row. Training (seeded MLlib k-means per subvector) lives in
  * `Similarity.pqTrain`; these kernels are the per-row hot loops.
  */
object PqCodec {
  /** Layout: int m, int k, int subDim, then m·k·subDim floats. */
  def serialize(codebooks: Array[Array[Array[Float]]]): Array[Byte] = {
    val m = codebooks.length
    require(m >= 1, "pq: need at least one sub-codebook")
    val k = codebooks(0).length
    val subDim = codebooks(0)(0).length
    require(k >= 1 && k <= 256, s"pq: k must be in [1,256] (one byte per code), got $k")
    require(codebooks.forall(cb => cb.length == k && cb.forall(_.length == subDim)),
      "pq: ragged codebook")
    val buf = java.nio.ByteBuffer.allocate(12 + 4 * m * k * subDim)
    buf.putInt(m).putInt(k).putInt(subDim)
    for (cb <- codebooks; c <- cb; x <- c) buf.putFloat(x)
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Array[Array[Float]]] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val m = buf.getInt; val k = buf.getInt; val subDim = buf.getInt
    Array.fill(m)(Array.fill(k)(Array.fill(subDim)(buf.getFloat)))
  }

  /** Nearest-centroid code per subvector (squared L2; ties → smaller
    * index, deterministic). A vector shorter than m·subDim is padded
    * with zeros conceptually (reads stop at its length).
    */
  def encode(vec: ArrayData, cb: Array[Array[Array[Float]]], elemIsDouble: Boolean): Array[Byte] = {
    val m = cb.length
    val subDim = cb(0)(0).length
    val n = vec.numElements()
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val base = j * subDim
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb(j).length) {
        val cent = cb(j)(c)
        var d = 0d
        var i = 0
        while (i < subDim) {
          val v = if (base + i < n) {
            if (elemIsDouble) vec.getDouble(base + i) else vec.getFloat(base + i).toDouble
          } else 0d
          val diff = v - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  /** Asymmetric score: inner product of the query with the RECONSTRUCTED
    * vector, Σ_j ⟨q_sub_j, centroid_j[code_j]⟩ — same FLOPs as an exact
    * dot but over an m-byte row instead of dim×4 (the scan/shuffle is
    * what shrinks 32×). Pass l2-normalized corpus + queries for cosine
    * semantics.
    */
  def score(codes: Array[Byte], q: ArrayData, cb: Array[Array[Array[Float]]],
            elemIsDouble: Boolean): Double = {
    val m = math.min(codes.length, cb.length)
    val subDim = cb(0)(0).length
    val n = q.numElements()
    var acc = 0d
    var j = 0
    while (j < m) {
      val cent = cb(j)(codes(j) & 0xFF)
      val base = j * subDim
      var i = 0
      while (i < subDim && base + i < n) {
        val qv = if (elemIsDouble) q.getDouble(base + i) else q.getFloat(base + i).toDouble
        acc += qv * cent(i)
        i += 1
      }
      j += 1
    }
    acc
  }
}

trait PqCodebookBearing { self: Expression =>
  def codebook: Expression

  protected def codebookCheck(): TypeCheckResult =
    if (codebook.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary codebook argument, got ${codebook.dataType.simpleString}")
    else if (!codebook.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a LITERAL codebook (deserialized once per task, not per row)")
    else TypeCheckResult.TypeCheckSuccess

  @transient protected lazy val cb: Array[Array[Array[Float]]] = {
    val bytes = codebook.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: codebook literal is null")
    PqCodec.deserialize(bytes)
  }

  protected def arrayElemCheck(e: Expression, what: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> or array<double> $what, got ${other.simpleString}")
    }

  protected def elemIsDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }
}

/** `pq_encode(codebookBytes, vec)` → m-byte code. */
case class PqEncodeExpr(codebook: Expression, vec: Expression)
    extends BinaryExpression with PqCodebookBearing {

  override def left: Expression = codebook
  override def right: Expression = vec
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = {
    val c = codebookCheck()
    if (c.isFailure) c else arrayElemCheck(vec, "vector")
  }

  override def nullSafeEval(cbBytes: Any, v: Any): Any =
    PqCodec.encode(v.asInstanceOf[ArrayData], cb, elemIsDouble(vec))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCb", cb, "float[][][]")
    nullSafeCodeGen(ctx, ev, (_, v) =>
      s"${ev.value} = graft.functions.PqCodec.encode($v, $ref, ${elemIsDouble(vec)});")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(codebook = newLeft, vec = newRight)
}

/** `pq_score(codebookBytes, codes, qvec)` → approximate inner product. */
case class PqScoreExpr(codebook: Expression, codes: Expression, qvec: Expression)
    extends TernaryExpression with PqCodebookBearing {

  override def first: Expression = codebook
  override def second: Expression = codes
  override def third: Expression = qvec
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_score"

  override def checkInputDataTypes(): TypeCheckResult = {
    val c = codebookCheck()
    if (c.isFailure) c
    else if (codes.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary codes argument, got ${codes.dataType.simpleString}")
    else arrayElemCheck(qvec, "query vector")
  }

  override def nullSafeEval(cbBytes: Any, code: Any, q: Any): Any =
    PqCodec.score(code.asInstanceOf[Array[Byte]], q.asInstanceOf[ArrayData],
      cb, elemIsDouble(qvec))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCb", cb, "float[][][]")
    nullSafeCodeGen(ctx, ev, (_, code, q) =>
      s"${ev.value} = graft.functions.PqCodec.score($code, $q, $ref, ${elemIsDouble(qvec)});")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
                                                 newSecond: Expression,
                                                 newThird: Expression): Expression =
    copy(codebook = newFirst, codes = newSecond, qvec = newThird)
}
