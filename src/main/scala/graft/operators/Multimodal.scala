package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in bounded batches.
  *
  * IMAGE decode is REAL: payloads carrying an image magic number
  * (PNG/BMP/GIF/JPEG) go through the pure-JVM `javax.imageio` readers —
  * no native libs needed — and yield true width/height plus an 8-bin
  * luminance histogram feature. Payloads that are not images (or fail to
  * decode) fall back to `stubDecode`, the clearly-marked deterministic
  * fake that keeps the pipeline hermetic for arbitrary bytes. Audio and
  * video decoders are NOT in this container, so frame sampling / resize
  * remain deterministic stubs. Everything around the decoders — schema,
  * partition sizing, batch iteration, feature layout — is the real
  * 100 TB design: binary payloads stream through `mapPartitions` so one
  * task holds one batch, never the whole column.
  */
object Multimodal {

  /** Output schema of the featurizer. */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("content_sha", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Attach a binary payload + media metadata to a text table — stands in
    * for reading real image bytes; byte content is the UTF-8 text so every
    * downstream hash/length is oracle-checkable.
    */
  def withBinaryPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("image/fake").as("media_type"))

  /** STUB — deterministic fake decode. A real deployment swaps this body
    * for an actual image decode (e.g. via a JNI/ImageIO call); signature,
    * batching and schema stay identical.
    */
  private def stubDecode(docId: Long, payload: Array[Byte]): (Int, Int, Array[Float]) = {
    // length widened BEFORE the multiply: an Int `length * 31` wraps
    // negative past ~69 MB and diverges from the BIGINT oracle mirror
    val w = 1 + (math.abs(payload.length.toLong * 31 + docId) % 64).toInt
    val h = 1 + (math.abs(payload.length.toLong * 17 + docId * 7) % 64).toInt
    // fake 8-dim "embedding": byte histogram moments, deterministic
    val feat = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      feat(i % 8) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    (w, h, feat)
  }

  /** Image magic numbers the JDK's ImageIO can decode without native
    * libraries: PNG, BMP, GIF, JPEG. Anything else skips straight to the
    * stub — no reader probing cost per arbitrary-byte row.
    */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 8 && (
      (b(0) == 0x89.toByte && b(1) == 'P'.toByte && b(2) == 'N'.toByte && b(3) == 'G'.toByte) ||
      (b(0) == 'B'.toByte && b(1) == 'M'.toByte) ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) ||
      (b(0) == 'G'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte))

  /** REAL image decode (pure JVM, `javax.imageio`): true width/height and
    * an 8-bin integer-luminance histogram (normalized by pixel count) as
    * the feature. Returns None for non-image or undecodable bytes — the
    * caller falls back to the deterministic stub, so one truncated file
    * can never abort a 100 TB featurize job.
    */
  private[operators] def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
    if (!looksLikeImage(payload)) None
    else try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val feat = new Array[Float](8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            // integer Rec.601 luma — engine-portable, no float rounding
            val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000
            feat(lum * 8 / 256) += 1f
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toFloat
        var i = 0
        while (i < 8) { feat(i) /= n; i += 1 }
        Some((w, h, feat))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic in-memory PNG (gradient fill keyed by `seed`) — the
    * planted payload for decode specs and the `q_image_decode` oracle
    * (dimensions are the contract; bytes are encoder-dependent).
    */
  def syntheticPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width >= 1 && height >= 1,
      s"syntheticPng: dimensions must be positive, got ${width}x$height")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = (x * 7 + y * 13 + seed).toInt & 0xFF
        img.setRGB(x, y, (v << 16) | (((x + y) & 0xFF) << 8) | (seed.toInt & 0xFF))
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** STUB resize — deterministic fake of an image resize: in a real
    * deployment the body decodes, scales, re-encodes; here the "resized"
    * payload is a deterministic byte slice so schema/partition behavior
    * is testable. Signature and batching are the real design.
    */
  def resizeStub(media: DataFrame, maxBytes: Int): DataFrame =
    media.withColumn("payload",
      expr(s"substring(payload, 1, $maxBytes)"))
      .withColumn("media_type", concat(col("media_type"), lit(";resized")))

  /** STUB frame sampling — deterministic fake of video frame extraction:
    * emits `frames` evenly-spaced byte windows per payload as child rows
    * (payload, frame_idx, frame_bytes). The explode-to-child-rows shape is
    * the real pipeline; the decoder is the fake.
    */
  def frameSampleStub(media: DataFrame, frames: Int, frameBytes: Int): DataFrame = {
    // sequence(0, frames-1) with frames <= 0 would FABRICATE descending
    // garbage frames ([0, -1] for zero) instead of emitting none
    require(frames > 0 && frameBytes > 0,
      s"frameSampleStub: frames and frameBytes must be positive, got $frames/$frameBytes")
    frameSampleBody(media, frames, frameBytes)
  }

  private def frameSampleBody(media: DataFrame, frames: Int, frameBytes: Int): DataFrame =
    media
      .withColumn("frame_idx", explode(sequence(lit(0), lit(frames - 1))))
      .withColumn("frame_bytes", expr(
        s"substring(payload, 1 + frame_idx * greatest((octet_length(payload) - $frameBytes) / greatest($frames - 1, 1), 0), $frameBytes)"))
      .select(col("doc_id"), col("media_type"), col("frame_idx"), col("frame_bytes"))

  /** Decode + featurize binary payloads per partition. The only non-codegen
    * hop in the library, by design: decoding is imperative. Partition size
    * is governed by spark.sql.files.maxPartitionBytes at read time, so each
    * task's resident batch stays bounded.
    */
  def featurize(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(FeatureSchema)
    // null id/payload rows (unparseable id cast, null text) are skipped,
    // not decoded: one bad row must never NPE-abort a 100 TB job — the
    // caller quarantines them upstream via `payload IS NULL`
    media.select(col("doc_id"), col("payload"))
      .filter(col("doc_id").isNotNull && col("payload").isNotNull)
      .mapPartitions { rows =>
        // no ImageIO disk cache on executors: decode stays in-memory,
        // no tmp-file churn per task
        javax.imageio.ImageIO.setUseCache(false)
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          // real decode for real images; deterministic stub for
          // everything else (including corrupt image files)
          val (w, h, feat) = decodeImage(bytes).getOrElse(stubDecode(id, bytes))
          val sha = digest.digest(bytes).map(b => f"$b%02x").mkString
          digest.reset()
          Row(id, bytes.length, sha, w, h, feat.toIndexedSeq)
        }
      }(enc)
  }
}
