package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Generic-payload bounded top-k state: (score, payload) with a size
  * cap; weakest evicted. Payload order (when the type is orderable)
  * breaks score ties ascending so results are deterministic.
  */
final class TopKAnyState(val k: Int, cmp: java.util.Comparator[(Double, Any)]) {
  val heap = new java.util.PriorityQueue[(Double, Any)](math.max(k, 1), cmp)
  def add(item: (Double, Any)): Unit = {
    if (heap.size < k) heap.add(item)
    else if (cmp.compare(item, heap.peek()) > 0) { heap.poll(); heap.add(item) }
  }
}

/** `top_k_any(score, payload, k)` — exact top-k per group as
  * `array<struct<score:double, payload:<payload type>>>`, descending by
  * score, score ties broken by ascending payload order (for orderable
  * payload types). The generic sibling of [[TopKByAgg]]: the payload can
  * be a struct of arbitrary columns, so whole rows ride the bounded heap
  * — "top 3 customers per nation with their names" without a window
  * sort, shuffling ≤k payloads per group per mapper.
  */
case class TopKAnyAgg(score: Expression, payload: Expression, kExpr: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKAnyState] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case other => throw new IllegalArgumentException(s"top_k_any: k must be int literal, got $other")
  }

  @transient private lazy val payloadOrd: Option[Ordering[Any]] =
    if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(payload.dataType))
      Some(PhysicalDataType.ordering(payload.dataType).asInstanceOf[Ordering[Any]])
    else None

  /** min-heap comparator: "greater" = stronger = higher score, then
    * SMALLER payload (so peek() is the weakest candidate).
    */
  @transient private lazy val cmp: java.util.Comparator[(Double, Any)] =
    (a: (Double, Any), b: (Double, Any)) => {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c
      else payloadOrd.map(o => o.compare(b._2, a._2)).getOrElse(0)
    }

  @transient private lazy val payloadProj =
    UnsafeProjection.create(Array(payload.dataType))

  override def children: Seq[Expression] = Seq(score, payload, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("payload", payload.dataType))), containsNull = false)
  override def prettyName: String = "top_k_any"

  override def createAggregationBuffer(): TopKAnyState = new TopKAnyState(k, cmp)

  override def update(buffer: TopKAnyState, input: InternalRow): TopKAnyState = {
    val s = score.eval(input)
    if (s != null) {
      val p = InternalRow.copyValue(payload.eval(input))
      // null payloads are skipped (as in TopKByAgg): the tie-break
      // ordering can't compare null, and a rank entry without its
      // payload carries no information
      if (p != null) buffer.add((s.asInstanceOf[Double], p))
    }
    buffer
  }

  override def merge(buffer: TopKAnyState, other: TopKAnyState): TopKAnyState = {
    val it = other.heap.iterator()
    while (it.hasNext) buffer.add(it.next())
    buffer
  }

  override def eval(buffer: TopKAnyState): Any = {
    val arr = buffer.heap.toArray(new Array[(Double, Any)](buffer.heap.size))
    java.util.Arrays.sort(arr, cmp.reversed()) // strongest first
    new GenericArrayData(arr.map { case (s, p) => InternalRow(s, p) }
      .asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: TopKAnyState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.heap.size)
    val it = buffer.heap.iterator()
    val rowHolder = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    while (it.hasNext) {
      val (s, p) = it.next()
      out.writeDouble(s)
      rowHolder.update(0, p)
      val bytes = payloadProj(rowHolder).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKAnyState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val state = new TopKAnyState(in.readInt(), cmp)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      val row = new UnsafeRow(1)
      row.pointTo(buf, len)
      state.add((s, InternalRow.copyValue(row.get(0, payload.dataType))))
      i += 1
    }
    state
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAnyAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAnyAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), payload = newChildren(1), kExpr = newChildren(2))
}
