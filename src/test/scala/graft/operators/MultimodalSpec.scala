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

  test("real resize: dims fit the box, constant color survives, inside-box passes through byte-identical") {
    // 100x60 into 40x30: width binds (100*30 >= 60*40) → 40 x floor(60*40/100)=24
    assert(Multimodal.fitDims(100, 60, 40, 30) == (40, 24))
    // height binds: 20x90 into 40x30 → floor(20*30/90)=6 x 30
    assert(Multimodal.fitDims(20, 90, 40, 30) == (6, 30))
    // degenerate aspect floors at 1, never 0
    assert(Multimodal.fitDims(1000, 1, 10, 10) == (10, 1))
    assert(Multimodal.fitDims(1, 1000, 10, 10) == (1, 10))

    val inside = Multimodal.constPng(30, 20, gray = 100) // already fits
    val big = Multimodal.constPng(80, 20, gray = 100)    // width binds → 40x10
    val media = Seq(
      (1L, inside, "image/png"), (2L, big, "image/png"),
      (3L, "not an image at all".getBytes("UTF-8"), "text/plain"))
      .toDF("doc_id", "payload", "media_type")
    val out = Multimodal.resize(spark, media, maxW = 40, maxH = 30)
      .orderBy("doc_id").collect()
    // inside-box: byte-identical payload (no lossy re-encode of a no-op)
    assert(out(0).getAs[Array[Byte]]("payload").toSeq == inside.toSeq)
    assert(out(0).getAs[String]("media_type") == "image/png;resized")
    assert((out(0).getAs[Int]("width"), out(0).getAs[Int]("height")) == (30, 20))
    // downscaled: claimed dims AND re-decoded dims are the fitted box;
    // nearest-neighbor keeps the constant color → lum bin 100/32 = 3
    assert((out(1).getAs[Int]("width"), out(1).getAs[Int]("height")) == (40, 10))
    val redecoded = Multimodal.featurize(spark,
      Seq((2L, out(1).getAs[Array[Byte]]("payload"), "x")).toDF("doc_id", "payload", "media_type"))
      .collect()(0)
    assert(redecoded.getAs[Int]("width") == 40 && redecoded.getAs[Int]("height") == 10)
    assert(redecoded.getSeq[Float](redecoded.fieldIndex("feature"))(3) == 1.0f)
    // non-image falls back to the stub slice, loudly tagged
    assert(out(2).getAs[String]("media_type") == "text/plain;resized-stub")
    assert(out(2).getAs[Array[Byte]]("payload").length <= 40 * 30)
  }

  test("real GIF frame extraction: stored frames counted, evenly sampled, planted grays recovered") {
    val gif = Multimodal.syntheticGif(10, 8, frames = 6, seed = 3L)
    val media = Seq((1L, gif, "image/gif")).toDF("doc_id", "payload", "media_type")
    val out = Multimodal.frameSample(spark, media, frames = 4)
      .orderBy("frame_idx").collect()
    assert(out.length == 4)
    // evenly spaced anchors over 6 stored frames: 0, 5/3=1, 10/3=3, 5
    assert(out.map(_.getAs[Int]("src_frame")).toSeq == Seq(0, 1, 3, 5))
    assert(out.forall(_.getAs[Int]("n_frames") == 6))
    assert(out.forall(r => r.getAs[Int]("frame_w") == 10 && r.getAs[Int]("frame_h") == 8))
    // constant-gray frames: dominant luminance bin == planted gray / 32
    out.foreach { r =>
      val v = Multimodal.gifFrameGray(3L, r.getAs[Int]("src_frame"))
      assert(r.getAs[Int]("lum_bin") == v * 8 / 256, s"frame ${r.getAs[Int]("src_frame")}")
      val feat = r.getSeq[Float](r.fieldIndex("feature"))
      assert(feat(v * 8 / 256) == 1.0f, s"constant frame must land fully in its bin: $feat")
    }
    // fewer stored frames than requested → all of them, no fabrication
    val short = Seq((2L, Multimodal.syntheticGif(5, 5, frames = 2, seed = 9L), "image/gif"))
      .toDF("doc_id", "payload", "media_type")
    val s = Multimodal.frameSample(spark, short, frames = 4).orderBy("frame_idx").collect()
    assert(s.length == 2 && s.map(_.getAs[Int]("src_frame")).toSeq == Seq(0, 1))
    // non-GIF bytes fall back to stub windows — still `frames` rows, never a throw
    val stub = Multimodal.frameSample(spark, media
      .withColumn("payload", encode(lit("plain text, not a gif"), "UTF-8")), frames = 4)
    assert(stub.count() == 4)
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

  test("real WAV decode: planted constant-amplitude audio recovers exact duration/rms/peak") {
    import spark.implicits._
    // seed 4: mono, 8000 Hz, 90 ms, amp0 = 128 + 16*((4*31+0) % 900) = 2112
    // seed 5: stereo, 8000 Hz, 100 ms, amp_c = 128 + 16*((5*31+c) % 900)
    val wavs = Seq(4L, 5L).map(s => (s, Multimodal.syntheticWav(s)))
      .toDF("doc_id", "payload")
    val out = Multimodal.audioFeatures(spark, wavs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val m = out(4L)
    assert(m.getBoolean(1) && m.getInt(2) == 1 && m.getInt(3) == 8000)
    assert(m.getLong(4) == 90L)
    assert(m.getDouble(5) == 2112.0 && m.getDouble(6) == 2112.0,
      s"constant amplitude must round-trip exactly, got rms=${m.getDouble(5)}")
    assert(m.isNullAt(7) && m.isNullAt(8), "mono carries no channel-1 stats")
    val st = out(5L)
    val a0 = 128 + 16 * ((5 * 31 + 0) % 900)
    val a1 = 128 + 16 * ((5 * 31 + 1) % 900)
    assert(st.getInt(2) == 2 && st.getLong(4) == 100L)
    assert(st.getDouble(5) == a0.toDouble && st.getDouble(7) == a1.toDouble,
      "interleaved stereo channels must decode independently")
    assert(st.getDouble(6) == a0.toDouble && st.getDouble(8) == a1.toDouble)
    // corrupt/non-audio payloads fall back to the tagged row, never throw
    val junk = Seq((9L, "not audio at all".getBytes("UTF-8")),
        (10L, Multimodal.syntheticPng(8, 8, 1L)),
        (11L, Multimodal.syntheticWav(4L).take(30).toArray)) // truncated header
      .toDF("doc_id", "payload")
    val fb = Multimodal.audioFeatures(spark, junk).collect()
    assert(fb.length == 3 && fb.forall(r => !r.getBoolean(1) && r.isNullAt(2)),
      "non-audio must land on the decoded=false fallback")
  }
}
