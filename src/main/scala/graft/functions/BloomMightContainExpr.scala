package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(bloomBytes, hash)` — probe a serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] (built once from a
  * corpus fingerprint table, shipped to every task as a literal) with a
  * 64-bit hash. False means DEFINITELY absent; true means "check
  * exactly". This is the broadcast prefilter that lets a firehose batch
  * skip the anti-join shuffle for the overwhelmingly-common
  * never-seen-before row ([[graft.operators.Dedup.dedupAgainstCorpusBloom]]).
  *
  * The bloom argument must be FOLDABLE (a literal): the filter is
  * deserialized once per task via a plan-reference object, not per row —
  * a non-literal bloom would force a per-row deserialization, which is
  * never what you want.
  */
case class BloomMightContainExpr(bloom: Expression, item: Expression)
    extends BinaryExpression {

  override def left: Expression = bloom
  override def right: Expression = item
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (bloom.dataType != BinaryType || item.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint) arguments, got " +
          s"${bloom.dataType.simpleString} and ${item.dataType.simpleString}")
    else if (!bloom.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a LITERAL bloom filter (deserialized once, " +
          "not per row)")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val filter: BloomFilter = {
    val bytes = bloom.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: bloom filter literal is null")
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(bloomBytes: Any, hash: Any): Any =
    filter.mightContainLong(hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, h) => s"${ev.value} = $ref.mightContainLong($h);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(bloom = newLeft, item = newRight)
}
