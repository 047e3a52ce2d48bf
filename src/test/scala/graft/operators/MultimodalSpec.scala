package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.withBinaryPayload(
    Seq((1L, "hello world of binary payloads"), (2L, "tiny")).toDF("doc_id", "text"),
    "doc_id", "text")

  test("featurize: stable sha, byte length, bounded dims, 8-dim feature") {
    val out = Multimodal.featurize(spark, media).orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("byte_len") == 30)
    assert(out(0).getAs[String]("content_sha") ==
      Multimodal.featurize(spark, media).orderBy("doc_id").collect()(0).getAs[String]("content_sha"))
    assert(out(0).getSeq[Float](out(0).fieldIndex("feature")).length == 8)
    val (w, h) = (out(0).getAs[Int]("width"), out(0).getAs[Int]("height"))
    assert(w >= 1 && w <= 64 && h >= 1 && h <= 64)
  }

  test("featurize skips null-payload/null-id rows instead of failing the job") {
    val dirty = Multimodal.withBinaryPayload(
      Seq((Some(1L), Some("good doc")), (Some(2L), Option.empty[String]),
        (Option.empty[Long], Some("null id"))).toDF("doc_id", "text"),
      "doc_id", "text")
    val out = Multimodal.featurize(spark, dirty).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("frameSampleStub rejects non-positive frame counts") {
    intercept[IllegalArgumentException] { Multimodal.frameSampleStub(media, 0, 4) }
    intercept[IllegalArgumentException] { Multimodal.frameSampleStub(media, 3, 0) }
  }

  test("resizeStub truncates payloads and tags the media type") {
    val out = Multimodal.resizeStub(media, maxBytes = 5)
      .select(length(col("payload")).as("len"), col("media_type"))
      .orderBy(col("len")).collect()
    assert(out.map(_.getAs[Int]("len")).toSeq == Seq(4, 5)) // "tiny" shorter than max
    assert(out.forall(_.getAs[String]("media_type").endsWith(";resized")))
  }

  test("real image decode: planted PNG dims recovered, histogram sums to 1") {
    val png = Multimodal.syntheticPng(37, 23, seed = 5L)
    val out = Multimodal.featurize(spark,
        Seq((1L, png, "image/png")).toDF("doc_id", "payload", "media_type"))
      .collect()(0)
    assert(out.getAs[Int]("width") == 37)
    assert(out.getAs[Int]("height") == 23)
    val feat = out.getSeq[Float](out.fieldIndex("feature"))
    assert(feat.length == 8)
    assert(math.abs(feat.sum - 1.0f) < 1e-4, s"histogram must sum to 1: $feat")
    // decode is deterministic: same bytes → same features
    val again = Multimodal.featurize(spark,
      Seq((1L, png, "image/png")).toDF("doc_id", "payload", "media_type")).collect()(0)
    assert(again.getSeq[Float](again.fieldIndex("feature")) == feat)
  }

  test("corrupt image bytes fall back to the deterministic stub, never fail") {
    // PNG magic + garbage body: looksLikeImage passes, ImageIO fails
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 42, 42, 42)
    val viaStub = Multimodal.featurize(spark,
      Seq((7L, corrupt, "image/png")).toDF("doc_id", "payload", "media_type")).collect()(0)
    // the stub's dims for these bytes (len=11): deterministic arithmetic
    assert(viaStub.getAs[Int]("width") == 1 + ((11L * 31 + 7) % 64).toInt)
    assert(viaStub.getAs[Int]("height") == 1 + ((11L * 17 + 49) % 64).toInt)
    // text payloads (no image magic) keep the stub path byte-for-byte
    val textOut = Multimodal.featurize(spark, media).orderBy("doc_id").collect()(0)
    assert(textOut.getAs[Int]("width") == 1 + ((30L * 31 + 1) % 64).toInt)
  }

  test("frameSampleStub emits evenly spaced frames as child rows") {
    val out = Multimodal.frameSampleStub(media, frames = 3, frameBytes = 4)
    assert(out.count() == 6) // 2 docs × 3 frames
    val doc1 = out.filter(col("doc_id") === 1L).orderBy("frame_idx")
      .select("frame_bytes").collect().map(r => new String(r.getAs[Array[Byte]](0)))
    assert(doc1.length == 3)
    assert(doc1(0) == "hell")       // frame 0 anchored at start
    assert(doc1.distinct.length == 3) // frames are distinct windows
  }
}
