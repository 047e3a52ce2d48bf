package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in bounded batches.
  *
  * The actual decoders (JPEG/PNG/audio frames) are NOT in this container —
  * `stubDecode` below is a clearly-marked deterministic fake. Everything
  * around it — schema, partition sizing, batch iteration, feature layout —
  * is the real 100 TB design: binary payloads stream through
  * `mapPartitions` so one task holds one batch, never the whole column.
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
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, feat) = stubDecode(id, bytes)
          val sha = digest.digest(bytes).map(b => f"$b%02x").mkString
          digest.reset()
          Row(id, bytes.length, sha, w, h, feat.toIndexedSeq)
        }
      }(enc)
  }
}
