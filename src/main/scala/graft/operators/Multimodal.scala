package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in bounded batches.
  *
  * IMAGE decode, RESIZE and (GIF) FRAME EXTRACTION are REAL: payloads
  * carrying an image magic number (PNG/BMP/GIF/JPEG) go through the
  * pure-JVM `javax.imageio` readers — no native libs needed — yielding
  * true width/height plus an 8-bin luminance histogram feature; [[resize]]
  * rescales through Graphics2D nearest-neighbor and re-encodes PNG;
  * [[frameSample]] walks an animated GIF's stored frames via
  * `ImageReader.read(i)`. Payloads that are not images (or fail to
  * decode) fall back to the clearly-marked deterministic stubs that keep
  * the pipeline hermetic for arbitrary bytes — video/audio CODECS are not
  * in this container, so non-GIF video stays on the stub path by design.
  * Everything around the decoders — schema,
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

  /** Normalized 8-bin integer-luminance histogram of a decoded image —
    * the shared feature kernel of [[decodeImage]] and [[frameSample]].
    * Integer Rec.601 luma, engine-portable (no float rounding in the
    * bin assignment).
    */
  private def lumFeature(img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val feat = new Array[Float](8)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
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
    feat
  }

  /** First index of the histogram maximum — a scalar "dominant luminance
    * bin" the oracle can predict arithmetically for planted constant-color
    * frames (arrays break the driver's pandas comparer).
    */
  private def argmaxBin(feat: Array[Float]): Int = {
    var best = 0
    var i = 1
    while (i < feat.length) { if (feat(i) > feat(best)) best = i; i += 1 }
    best
  }

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
      else Some((img.getWidth, img.getHeight, lumFeature(img)))
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

  /** Deterministic constant-color PNG (one gray level everywhere) — the
    * planted payload for the RESIZE oracle: any aspect-preserving rescale
    * of a constant image is the same constant, so post-resize dimensions
    * AND the dominant luminance bin are pure arithmetic in doc_id.
    */
  def constPng(width: Int, height: Int, gray: Int): Array[Byte] = {
    require(width >= 1 && height >= 1 && gray >= 0 && gray <= 255,
      s"constPng: bad args ${width}x$height gray=$gray")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Gray level of frame `f` of [[syntheticGif]] — exposed so specs and
    * the oracle share one formula.
    */
  def gifFrameGray(seed: Long, f: Int): Int = ((seed * 31 + f * 40) % 256).toInt

  /** Deterministic multi-frame animated GIF: frame `f` is a constant fill
    * at gray [[gifFrameGray]]`(seed, f)`. Frames are TYPE_BYTE_INDEXED over
    * an explicit 256-entry gray palette — GIF stores 8-bit indexed color
    * NATIVELY, so the planted gray levels survive encode→decode exactly
    * (an RGB frame would go through the writer's palette quantization and
    * break the arithmetic oracle).
    */
  def syntheticGif(width: Int, height: Int, frames: Int, seed: Long): Array[Byte] = {
    require(width >= 1 && height >= 1 && frames >= 1,
      s"syntheticGif: bad args ${width}x$height frames=$frames")
    val grays = (0 until 256).map(_.toByte).toArray
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        val v = gifFrameGray(seed, f)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) { img.getRaster.setSample(x, y, 0, v); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }

  /** Aspect-preserving fit of `w x h` into a `maxW x maxH` box, integer
    * arithmetic only (SQL-mirrorable): images already inside the box keep
    * their dims; otherwise the binding side pins to the box and the other
    * scales by the same rational factor, floored, min 1. Exposed so the
    * oracle and specs share the formula.
    */
  def fitDims(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
    require(maxW >= 1 && maxH >= 1, s"fitDims: box must be positive, got ${maxW}x$maxH")
    if (w <= maxW && h <= maxH) (w, h)
    else if (w.toLong * maxH >= h.toLong * maxW)
      (maxW, math.max(1, (h.toLong * maxW / w).toInt))
    else (math.max(1, (w.toLong * maxH / h).toInt), maxH)
  }

  /** Output schema of [[resize]]. */
  val ResizeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** REAL image resize (pure JVM): decode via `javax.imageio`, fit into
    * the `maxW x maxH` box with [[fitDims]], rescale with Graphics2D
    * NEAREST-NEIGHBOR (deterministic across JVMs; constant colors survive
    * exactly), re-encode as PNG. Images already inside the box pass
    * through byte-identical (no lossy re-encode of a no-op). Non-image /
    * corrupt payloads fall back to the deterministic stub slice —
    * media_type is tagged `;resized` vs `;resized-stub` so downstream can
    * tell. Same `mapPartitions` bounded-batch shape as [[featurize]].
    */
  def resize(spark: SparkSession, media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(ResizeSchema)
    Spread.compute(media.select(col("doc_id"), col("payload"), col("media_type")),
        col("doc_id"))
      .filter(col("doc_id").isNotNull && col("payload").isNotNull)
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val mt = r.getString(2)
          val realOut: Option[Row] =
            if (!looksLikeImage(bytes)) None
            else try {
              val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              if (img == null) None
              else {
                val (tw, th) = fitDims(img.getWidth, img.getHeight, maxW, maxH)
                if (tw == img.getWidth && th == img.getHeight)
                  Some(Row(id, bytes, mt + ";resized", tw, th))
                else {
                  val dst = new java.awt.image.BufferedImage(tw, th,
                    java.awt.image.BufferedImage.TYPE_INT_RGB)
                  val g = dst.createGraphics()
                  try {
                    g.setRenderingHint(
                      java.awt.RenderingHints.KEY_INTERPOLATION,
                      java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
                    g.drawImage(img, 0, 0, tw, th, null)
                  } finally g.dispose()
                  val baos = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(dst, "png", baos)
                  Some(Row(id, baos.toByteArray, mt + ";resized", tw, th))
                }
              }
            } catch { case scala.util.control.NonFatal(_) => None }
          realOut.getOrElse {
            // stub fallback: deterministic byte slice, stub dims fitted
            // into the same box so downstream size invariants still hold
            val (sw, sh, _) = stubDecode(id, bytes)
            val (tw, th) = fitDims(sw, sh, maxW, maxH)
            Row(id, bytes.take(maxW * maxH), mt + ";resized-stub", tw, th)
          }
        }
      }(enc)
  }

  /** Output schema of [[frameSample]]. */
  val FrameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = true),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("src_frame", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("frame_w", IntegerType, nullable = false),
    StructField("frame_h", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("lum_bin", IntegerType, nullable = false)))

  /** Evenly-spaced source-frame index for output slot `i` of `k` sampled
    * from `n` stored frames: all frames when `n <= k`, else the endpoints
    * plus interior anchors `i*(n-1)/(k-1)` (integer floor). Exposed for
    * the oracle mirror.
    */
  def sampleIndex(i: Int, k: Int, n: Int): Int =
    if (n <= k || k == 1) i else (i.toLong * (n - 1) / (k - 1)).toInt

  /** REAL frame extraction for animated GIFs (pure JVM): open an
    * `ImageReader`, count stored frames (`getNumImages(true)`), decode
    * `min(frames, n)` evenly-spaced frames and emit one child row each
    * with true dims + the luminance-histogram feature and its dominant
    * bin. Non-GIF / corrupt payloads fall back to the stub byte windows
    * featurized through [[stubDecode]] — one bad file never aborts the
    * job. The explode-to-child-rows shape matches [[frameSampleStub]].
    */
  def frameSample(spark: SparkSession, media: DataFrame, frames: Int): DataFrame = {
    require(frames > 0, s"frameSample: frames must be positive, got $frames")
    val enc = org.apache.spark.sql.Encoders.row(FrameSchema)
    Spread.compute(media.select(col("doc_id"), col("payload"), col("media_type")),
        col("doc_id"))
      .filter(col("doc_id").isNotNull && col("payload").isNotNull)
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val mt = r.getString(2)
          val isGif = bytes.length >= 3 &&
            bytes(0) == 'G'.toByte && bytes(1) == 'I'.toByte && bytes(2) == 'F'.toByte
          val real: Option[Seq[Row]] =
            if (!isGif) None
            else try {
              val iis = javax.imageio.ImageIO.createImageInputStream(
                new java.io.ByteArrayInputStream(bytes))
              val readers = javax.imageio.ImageIO.getImageReaders(iis)
              if (!readers.hasNext) { iis.close(); None }
              else {
                val reader = readers.next()
                try {
                  reader.setInput(iis, false, true)
                  val n = reader.getNumImages(true)
                  if (n < 1) None
                  else {
                    val k = math.min(frames, n)
                    Some((0 until k).map { i =>
                      val src = sampleIndex(i, frames, n)
                      val img = reader.read(src)
                      val feat = lumFeature(img)
                      Row(id, mt, i, src, n, img.getWidth, img.getHeight,
                        feat.toIndexedSeq, argmaxBin(feat))
                    })
                  }
                } finally { reader.dispose(); iis.close() }
              }
            } catch { case scala.util.control.NonFatal(_) => None }
          real.getOrElse {
            // stub fallback: evenly-spaced byte windows, stub-featurized
            val step = math.max((bytes.length - 64) / math.max(frames - 1, 1), 0)
            (0 until frames).map { i =>
              val from = math.min(i * step, math.max(bytes.length - 1, 0))
              val win = bytes.slice(from, math.min(from + 64, bytes.length))
              val (w, h, feat) = stubDecode(id, win)
              Row(id, mt, i, i, frames, w, h, feat.toIndexedSeq, argmaxBin(feat))
            }
          }
        }
      }(enc)
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

  /** Output schema of [[audioFeatures]]. Per-channel stats are scalars
    * for the first two channels (arrays break the driver's comparer;
    * stereo covers the real corpus) — `channels` still reports the true
    * count. `decoded = false` rows are the tagged fallback for corrupt
    * or non-audio payloads, with NULL features.
    */
  val AudioSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("rms0", DoubleType, nullable = true),
    StructField("peak0", DoubleType, nullable = true),
    StructField("rms1", DoubleType, nullable = true),
    StructField("peak1", DoubleType, nullable = true)))

  private def looksLikeWav(b: Array[Byte]): Boolean =
    b.length >= 44 &&
      b(0) == 'R'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte && b(3) == 'F'.toByte &&
      b(8) == 'W'.toByte && b(9) == 'A'.toByte && b(10) == 'V'.toByte && b(11) == 'E'.toByte

  /** Deterministic in-memory PCM-16 WAV keyed by `seed` — the planted
    * payload for audio specs and the `q_audio_features` oracle. Every
    * parameter is pure arithmetic in the seed so an engine mirror can
    * predict the decoded features exactly: channels `1 + seed % 2`,
    * sample rate 8000, duration `50 + (seed % 7) * 10` ms, and channel
    * `c` holds the CONSTANT amplitude `128 + 16 * ((seed * 31 + c) %
    * 900)` — so RMS and peak are both exactly that amplitude (constant
    * signals make sqrt(mean(x²)) exact in doubles).
    */
  def syntheticWav(seed: Long): Array[Byte] = {
    require(seed >= 0, s"syntheticWav: seed must be non-negative, got $seed")
    val channels = 1 + (seed % 2).toInt
    val sampleRate = 8000
    val durationMs = 50 + (seed % 7).toInt * 10
    val frames = sampleRate * durationMs / 1000
    val amp = Array.tabulate(channels)(c => (128 + 16 * ((seed * 31 + c) % 900)).toInt)
    val dataLen = frames * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var f = 0
    while (f < frames) {
      var c = 0
      while (c < channels) { bb.putShort(amp(c).toShort); c += 1 }
      f += 1
    }
    bb.array()
  }

  /** REAL audio decode (pure JVM, `javax.sound.sampled` — the one
    * audio path the JDK reaches without native codecs): parse the WAV
    * header through `AudioSystem`, stream the PCM frames once, and
    * emit duration, channel count, sample rate, and per-channel
    * RMS/peak (16-bit signed amplitude units). Non-WAV, compressed, or
    * corrupt payloads fall back to a tagged `decoded = false` row —
    * the same never-abort contract as the image kernel. Same
    * `mapPartitions` shape as [[featurize]]: one task holds one
    * bounded batch, the stream never materializes a whole column.
    */
  def audioFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(AudioSchema)
    Spread.compute(media.select(col("doc_id"), col("payload")), col("doc_id"))
      .filter(col("doc_id").isNotNull && col("payload").isNotNull)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          decodeWav(bytes) match {
            case Some((ch, rate, frames, rms, peak)) =>
              def at(a: Array[Double], i: Int): Any =
                if (i < a.length) a(i) else null
              Row(id, true, ch, rate, frames * 1000L / rate,
                at(rms, 0), at(peak, 0), at(rms, 1), at(peak, 1))
            case None => Row(id, false, null, null, null, null, null, null, null)
          }
        }
      }(enc)
  }

  /** `(channels, sampleRate, frames, rmsPerChannel, peakPerChannel)` or
    * None for anything `javax.sound` cannot parse as PCM-16 WAV.
    */
  private[operators] def decodeWav(payload: Array[Byte])
      : Option[(Int, Int, Long, Array[Double], Array[Double])] =
    if (!looksLikeWav(payload)) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val ch = fmt.getChannels
        val bits = fmt.getSampleSizeInBits
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            bits != 16 || ch < 1) None
        else {
          val rate = math.round(fmt.getSampleRate)
          val frameBytes = fmt.getFrameSize
          val sumSq = new Array[Double](ch)
          val peak = new Array[Double](ch)
          var frames = 0L
          val buf = new Array[Byte](frameBytes * 1024)
          var n = in.read(buf)
          while (n > 0) {
            var off = 0
            while (off + frameBytes <= n) {
              var c = 0
              while (c < ch) {
                val lo = buf(off + 2 * c) & 0xFF
                val hi = buf(off + 2 * c + 1).toInt
                val s0 = (hi << 8) | lo
                val s = if (fmt.isBigEndian) ((buf(off + 2 * c).toInt << 8) |
                  (buf(off + 2 * c + 1) & 0xFF)) else s0
                val v = s.toDouble
                sumSq(c) += v * v
                if (math.abs(v) > peak(c)) peak(c) = math.abs(v)
                c += 1
              }
              frames += 1
              off += frameBytes
            }
            n = in.read(buf)
          }
          if (frames == 0L) None
          else {
            val rms = sumSq.map(s => math.sqrt(s / frames))
            Some((ch, rate, frames, rms, peak))
          }
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

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
    Spread.compute(media.select(col("doc_id"), col("payload")), col("doc_id"))
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
