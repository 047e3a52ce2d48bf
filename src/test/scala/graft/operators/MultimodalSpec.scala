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
