package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k state: a size-k min-heap of (score, id) — the weakest
  * element is evicted on overflow. Orderings are deterministic:
  * higher score wins; equal scores break toward the SMALLER id.
  */
final class TopKState(val k: Int) {
  // min-heap: head = weakest (lowest score; among equal, LARGEST id)
  val heap = new java.util.PriorityQueue[(Double, Long)](
    math.max(k, 1),
    (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    })

  def add(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.add((score, id))
    else {
      val w = heap.peek()
      if (score > w._1 || (score == w._1 && id < w._2)) {
        heap.poll(); heap.add((score, id))
      }
    }
  }
}

/** `top_k_by(score, id, k)` — exact top-k rows per group as
  * `array<struct<score:double, id:bigint>>`, descending, ties to the
  * smaller id.
  *
  * The scale story vs the `row_number() OVER (PARTITION BY g ORDER BY s)`
  * formulation: a window must shuffle and fully sort EVERY row of every
  * group; this aggregate keeps an O(k) heap per group and partial-merges
  * map-side, so the shuffle carries at most k rows per group per mapper.
  * For brute-force ANN scoring that is the difference between shuffling
  * |corpus|×|queries| rows and |queries|×k.
  */
case class TopKByAgg(score: Expression, payload: Expression, kExpr: Expression,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKState] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case other => throw new IllegalArgumentException(s"top_k_by: k must be int literal, got $other")
  }

  override def children: Seq[Expression] = Seq(score, payload, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k_by"

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(buffer: TopKState, input: InternalRow): TopKState = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null)
      buffer.add(s.asInstanceOf[Double], p.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKState, other: TopKState): TopKState = {
    val it = other.heap.iterator()
    while (it.hasNext) { val (s, i) = it.next(); buffer.add(s, i) }
    buffer
  }

  override def eval(buffer: TopKState): Any = {
    val arr = buffer.heap.toArray(new Array[(Double, Long)](buffer.heap.size))
    // descending score, ascending id
    java.util.Arrays.sort(arr, (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    })
    new GenericArrayData(arr.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: TopKState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.heap.size)
    val it = buffer.heap.iterator()
    while (it.hasNext) { val (s, i) = it.next(); out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val state = new TopKState(in.readInt())
    val n = in.readInt()
    var j = 0
    while (j < n) { state.add(in.readDouble(), in.readLong()); j += 1 }
    state
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), payload = newChildren(1), kExpr = newChildren(2))
}
