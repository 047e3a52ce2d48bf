package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequency summary state: at most `budget` counters.
  * Point update is the classic MG step (hit → +1; room → insert;
  * full → decrement ALL, drop zeros — each decrement "cancels" one
  * occurrence of `budget` distinct items, which is where the n/budget
  * error bound comes from). Merge is the mergeable-summaries form
  * (Agarwal et al., PODS'12): sum counts, then subtract the
  * (budget+1)-th largest count from everything and drop ≤0 — the merged
  * summary keeps the additive error bound, so partial aggregation across
  * any partitioning stays sound.
  */
final class HeavyHittersState(val budget: Int) {
  val counts = new java.util.HashMap[String, Long]()

  def add(item: String): Unit = {
    val cur = counts.get(item)
    if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + 1L)
    else if (counts.size < budget) counts.put(item, 1L)
    else {
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  def mergeFrom(other: HeavyHittersState): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counts.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    if (counts.size > budget) {
      // subtract the (budget+1)-th largest count, drop what falls to ≤0
      val vals = new Array[Long](counts.size)
      var i = 0
      val vi = counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - budget - 1)
      val ei = counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        if (e.getValue - cut <= 0L) ei.remove() else e.setValue(e.getValue - cut)
      }
    }
  }
}

/** `heavy_hitters(item, budget)` — a bounded-memory Misra–Gries
  * frequency summary over a string column, as
  * `array<struct<item:string, count:long>>` sorted by (count desc,
  * item asc).
  *
  * Counts are LOWER bounds: est ≥ true − n/budget, and every item with
  * true frequency > n/budget is GUARANTEED present. That guarantee is
  * what makes the two-pass exact top-k (`TextAnalysis.approxTopK`)
  * deterministic: pass 1 finds a candidate superset of the true heavy
  * hitters without ever shuffling item keys — the aggregation buffer IS
  * the summary, so the exchange carries ONE ≤budget-entry summary per
  * partition instead of every distinct token — and pass 2 recounts only
  * the candidates exactly.
  *
  * The summary CONTENT depends on partition layout (like any MG sketch);
  * the guarantee does not — downstream recount makes query output
  * layout-independent. Null items are skipped.
  */
case class HeavyHittersAgg(item: Expression, budgetExpr: Expression,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HeavyHittersState] {

  private lazy val budget: Int = budgetExpr.eval(InternalRow.empty) match {
    case i: Int if i >= 1 => i
    case other => throw new IllegalArgumentException(
      s"heavy_hitters: budget must be a positive int literal, got $other")
  }

  override def children: Seq[Expression] = Seq(item, budgetExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("count", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (item.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters: item must be string, got ${item.dataType.catalogString}")

  override def createAggregationBuffer(): HeavyHittersState =
    new HeavyHittersState(budget)

  override def update(buffer: HeavyHittersState, input: InternalRow): HeavyHittersState = {
    val v = item.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: HeavyHittersState, other: HeavyHittersState): HeavyHittersState = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: HeavyHittersState): Any = {
    val entries = new Array[(String, Long)](buffer.counts.size)
    var i = 0
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue)
      i += 1
    }
    java.util.Arrays.sort(entries, (a: (String, Long), b: (String, Long)) => {
      val c = java.lang.Long.compare(b._2, a._2)
      if (c != 0) c else a._1.compareTo(b._1)
    })
    new GenericArrayData(entries.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: HeavyHittersState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.budget)
    out.writeInt(buffer.counts.size)
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): HeavyHittersState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val state = new HeavyHittersState(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      state.counts.put(new String(buf, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    state
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0), budgetExpr = newChildren(1))
}
