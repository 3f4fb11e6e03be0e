package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2.3 L12): media as opaque binary
  * columns + typed metadata, with decode / feature-extract / frame-sample
  * as partition-batched transforms.
  *
  * Decode is REAL wherever the JDK ships a codec: PNG/GIF/BMP/JPEG
  * images (javax.imageio), MJPEG-in-AVI video (RIFF container parse +
  * per-frame imageio), and WAV/AIFF/AU PCM audio (javax.sound.sampled).
  * Codecs the JDK cannot touch (H.264/mp4, mp3/aac)
  * fall back to a clearly-marked deterministic STUB — and everything
  * Spark-side is identical either way: the schema contract, the
  * mapPartitions batch shape (the per-partition closure is where a
  * native codec would hold its reusable decode buffers), the preserved
  * partitioning, and the output encoders. Swapping the stub for a
  * JNI/py kernel changes no plan shape.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))))

  val FeatureDim = 16

  /** STUB decode kernel: a real build would decode `bytes` with a codec.
    * Here: deterministic 16-bin byte histogram, L1-normalized — keeps the
    * full pipeline testable end-to-end. */
  private[operators] def decodeKernelStub(bytes: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](FeatureDim)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xFF) % FeatureDim) += 1.0
        i += 1
      }
      val total = bytes.length.max(1).toDouble
      var j = 0
      while (j < FeatureDim) { hist(j) /= total; j += 1 }
    }
    hist
  }

  /** 16-bin luminance histogram (Rec.601 weights) of a decoded image,
    * L1-normalized — shared by the image and video kernels. */
  private def lumHistogram(img: java.awt.image.BufferedImage): Array[Double] = {
    val w = img.getWidth
    val h = img.getHeight
    val hist = new Array[Double](FeatureDim)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
          0.114 * (rgb & 0xFF)).toInt
        hist(lum * FeatureDim / 256) += 1.0
        x += 1
      }
      y += 1
    }
    val total = (w.toLong * h).max(1L).toDouble
    var j = 0
    while (j < FeatureDim) { hist(j) /= total; j += 1 }
    hist
  }

  /** REAL decode kernel for image formats the JDK ships codecs for (PNG
    * / GIF / BMP / JPEG via javax.imageio — pure JVM, zero external
    * dependencies): full pixel decode, then a 16-bin luminance histogram
    * (Rec.601 weights), L1-normalized. Returns None for bytes no
    * installed reader claims (for MJPEG-in-AVI video see
    * [[decodeVideoKernel]]; other video/audio codecs remain stubbed —
    * the JDK ships none). */
  private[operators] def decodeImageKernel(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else Some((img.getWidth, img.getHeight, lumHistogram(img)))
    } catch { case _: java.io.IOException => None }
  }

  /** MJPEG-in-AVI frame extraction — a REAL pure-JVM container parse
    * (no stub): walks the RIFF chunk tree ('LIST' forms recursed, video
    * stream chunks '##dc'/'##db' collected in stream order, even-byte
    * chunk padding honored) and returns the raw per-frame JPEG payloads.
    * Truncated/corrupt structures stop the walk and yield whatever
    * complete frames precede the damage — no exception reaches the
    * caller. Anything that is not a RIFF-AVI returns no frames. */
  private[operators] def aviMjpegFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (bytes == null || bytes.length < 12) return Seq.empty
    def fourcc(off: Int) = new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def le32(off: Int): Long =
      (bytes(off) & 0xFFL) | ((bytes(off + 1) & 0xFFL) << 8) |
        ((bytes(off + 2) & 0xFFL) << 16) | ((bytes(off + 3) & 0xFFL) << 24)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def walk(start: Int, end: Int): Unit = {
      var p = start
      var ok = true
      while (ok && p + 8 <= end) {
        val id = fourcc(p)
        val sz = le32(p + 4).toInt
        val body = p + 8
        if (sz < 0) ok = false // corrupt size
        else if (id == "LIST" && sz >= 4 && body + 4 <= end) {
          // recurse into however much of the list survives truncation —
          // complete child chunks before the damage still decode
          walk(body + 4, math.min(body + sz, end))
          p = body + sz + (sz & 1)
        } else if (body + sz > end) ok = false // truncated leaf: stop
        else {
          if (sz > 0 && (id.endsWith("dc") || id.endsWith("db")))
            out += java.util.Arrays.copyOfRange(bytes, body, body + sz)
          p = body + sz + (sz & 1) // chunks pad to even offsets
        }
      }
    }
    walk(12, math.min(bytes.length.toLong, 8L + le32(4)).toInt)
    out.toSeq
  }

  /** REAL video decode kernel for MJPEG-in-AVI (the one container+codec
    * combination the JDK can fully decode: RIFF parse above, per-frame
    * JPEG via javax.imageio): returns (width, height, decodedFrames,
    * mean luminance histogram across decoded frames). None when the
    * bytes are not an AVI or no frame decodes — those formats (H.264,
    * mp4, audio) remain the documented stub. */
  private[operators] def decodeVideoKernel(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Double])] = {
    val frames = aviMjpegFrames(bytes)
    if (frames.isEmpty) return None
    var w = 0
    var h = 0
    var decoded = 0
    val acc = new Array[Double](FeatureDim)
    frames.foreach { f =>
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
        if (img != null) {
          if (decoded == 0) { w = img.getWidth; h = img.getHeight }
          val hist = lumHistogram(img)
          var j = 0
          while (j < FeatureDim) { acc(j) += hist(j); j += 1 }
          decoded += 1
        }
      } catch { case _: java.io.IOException => () }
    }
    if (decoded == 0) None
    else {
      var j = 0
      while (j < FeatureDim) { acc(j) /= decoded; j += 1 }
      Some((w, h, decoded, acc))
    }
  }

  /** Image decode over media rows: partition-batched, zero shuffle.
    * Output (media_id, decoded, width, height, feature): decodable images
    * get TRUE dimensions + luminance histogram from the real codec;
    * anything else (video, corrupt bytes) keeps the stub feature with
    * decoded=false — same batch contract either way, so swapping in
    * further codecs changes no plan shape. */
  def decodeImages(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("decoded", BooleanType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("feature", ArrayType(DoubleType))))
    val idIdx = media.schema.fieldIndex("media_id")
    val bytesIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(bytesIdx)) null else r.getAs[Array[Byte]](bytesIdx)
        decodeImageKernel(bytes) match {
          case Some((w, h, hist)) => Row(r.getLong(idIdx), true, w, h, hist.toSeq)
          case None => Row(r.getLong(idIdx), false, null, null, decodeKernelStub(bytes).toSeq)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** REAL audio decode kernel for the formats the JDK ships codecs for
    * (WAV/AIFF/AU PCM via javax.sound.sampled — pure JVM): parses the
    * container, decodes the PCM samples, and returns (sampleRateHz,
    * channels, frameCount, 16-bin histogram of absolute normalized
    * amplitude, L1-normalized). None for bytes no installed reader
    * claims (mp3/aac remain the documented stub). */
  /** Linear-PCM envelopes this suite decodes: 16-bit signed (either
    * endianness) and 8-bit signed (AIFF) or unsigned (WAV). Anything
    * else — mu-law/A-law AU, float PCM, exotic widths — gets NO claim:
    * interpreting a ULAW byte stream as linear PCM yields garbage
    * amplitudes while still reporting decoded=true (silent corruption
    * of every downstream energy/histogram consumer). */
  private def pcmDecodable(fmt: javax.sound.sampled.AudioFormat): Boolean = {
    val enc = fmt.getEncoding
    val bits = fmt.getSampleSizeInBits
    (bits == 16 && enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) ||
      (bits == 8 && (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
        enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED))
  }

  /** Normalized SIGNED amplitude of sample `i` — the single source for
    * the width/signedness/endianness decode (both audio kernels call
    * it; a divergent copy would mis-gate one of them). */
  private def pcmSample(
      data: Array[Byte], fmt: javax.sound.sampled.AudioFormat, i: Int): Double =
    if (fmt.getSampleSizeInBits == 8) {
      if (fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        data(i).toDouble / 128.0
      else ((data(i) & 0xFF) - 128) / 128.0
    } else {
      val off = i * 2
      val s =
        if (fmt.isBigEndian) ((data(off) << 8) | (data(off + 1) & 0xFF)).toShort
        else ((data(off + 1) << 8) | (data(off) & 0xFF)).toShort
      s.toDouble / 32768.0
    }

  private[operators] def decodeAudioKernel(bytes: Array[Byte]): Option[(Int, Int, Long, Array[Double])] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (!pcmDecodable(fmt)) return None
        val data = in.readAllBytes()
        val bytesPerSample = fmt.getSampleSizeInBits / 8
        val n = data.length / bytesPerSample
        val hist = new Array[Double](FeatureDim)
        var i = 0
        while (i < n) {
          val amp = math.abs(pcmSample(data, fmt, i))
          hist(math.min(FeatureDim - 1, (amp * FeatureDim).toInt)) += 1.0
          i += 1
        }
        if (n == 0) return None
        var j = 0
        while (j < FeatureDim) { hist(j) /= n; j += 1 }
        Some((fmt.getSampleRate.toInt, fmt.getChannels,
          n.toLong / math.max(1, fmt.getChannels), hist))
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }
  }

  /** Windowed RMS energy of one PCM clip: per `windowFrames` window the
    * root-mean-square of the CHANNEL-MIXED normalized amplitude — the
    * loudness contour a speech pipeline segments on (silence stripping,
    * voice-activity gating before an ASR stage). Returns (windows,
    * active windows at rms ≥ `activeRms`, peak rms, mean rms); the
    * trailing partial window counts with its own length. Same PCM
    * envelope as [[decodeAudioKernel]] (8/16-bit WAV/AIFF/AU), None for
    * codecs the JDK lacks. */
  private[operators] def audioEnergyKernel(
      bytes: Array[Byte], windowFrames: Int,
      activeRms: Double = 0.1): Option[(Long, Long, Double, Double)] = {
    if (bytes == null || bytes.length == 0 || windowFrames <= 0) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (!pcmDecodable(fmt)) return None
        val data = in.readAllBytes()
        val ch = math.max(1, fmt.getChannels)
        val bytesPerSample = fmt.getSampleSizeInBits / 8
        val nSamples = data.length / bytesPerSample
        val nFrames = nSamples / ch
        if (nFrames == 0) return None
        def sample(i: Int): Double = pcmSample(data, fmt, i)
        var windows = 0L; var active = 0L
        var peak = 0.0; var rmsSum = 0.0
        var f = 0
        while (f < nFrames) {
          val end = math.min(nFrames, f + windowFrames)
          var sumSq = 0.0
          var i = f
          while (i < end) {
            var mix = 0.0
            var c = 0
            while (c < ch) { mix += sample(i * ch + c); c += 1 }
            mix /= ch
            sumSq += mix * mix
            i += 1
          }
          val rms = math.sqrt(sumSq / (end - f))
          windows += 1
          if (rms >= activeRms) active += 1
          if (rms > peak) peak = rms
          rmsSum += rms
          f = end
        }
        Some((windows, active, peak, rmsSum / windows))
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }
  }

  /** Windowed-energy extraction over media rows: partition-batched,
    * zero shuffle (the decodeAudio contract). Output (media_id,
    * decoded, n_windows, active_windows, peak_rms, mean_rms). */
  def audioEnergy(spark: SparkSession, media: DataFrame,
      windowFrames: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("decoded", BooleanType, nullable = false),
      StructField("n_windows", LongType),
      StructField("active_windows", LongType),
      StructField("peak_rms", DoubleType),
      StructField("mean_rms", DoubleType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val bytesIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(bytesIdx)) null else r.getAs[Array[Byte]](bytesIdx)
        audioEnergyKernel(bytes, windowFrames) match {
          case Some((w, a, p, m)) => Row(r.getLong(idIdx), true, w, a, p, m)
          case None => Row(r.getLong(idIdx), false, null, null, null, null)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Audio decode over media rows: partition-batched, zero shuffle.
    * Output (media_id, decoded, sample_rate, channels, n_frames,
    * feature) — same batch contract as decodeImages/decodeVideos, stub
    * fallback for codecs the JDK lacks. */
  def decodeAudio(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("decoded", BooleanType, nullable = false),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_frames", LongType),
      StructField("feature", ArrayType(DoubleType))))
    val idIdx = media.schema.fieldIndex("media_id")
    val bytesIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(bytesIdx)) null else r.getAs[Array[Byte]](bytesIdx)
        decodeAudioKernel(bytes) match {
          case Some((sr, ch, n, hist)) => Row(r.getLong(idIdx), true, sr, ch, n, hist.toSeq)
          case None => Row(r.getLong(idIdx), false, null, null, null,
            decodeKernelStub(bytes).toSeq)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Video decode over media rows: partition-batched, zero shuffle.
    * Output (media_id, decoded, width, height, n_frames, feature):
    * MJPEG-in-AVI media gets TRUE per-frame decode (frame count, first
    * frame's dimensions, mean luminance histogram); any other container
    * or codec keeps the stub feature with decoded=false — same batch
    * contract as decodeImages, so adding codecs changes no plan shape. */
  def decodeVideos(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("decoded", BooleanType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("feature", ArrayType(DoubleType))))
    val idIdx = media.schema.fieldIndex("media_id")
    val bytesIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(bytesIdx)) null else r.getAs[Array[Byte]](bytesIdx)
        decodeVideoKernel(bytes) match {
          case Some((w, h, n, hist)) => Row(r.getLong(idIdx), true, w, h, n, hist.toSeq)
          case None => Row(r.getLong(idIdx), false, null, null, null,
            decodeKernelStub(bytes).toSeq)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Per-frame scene-change detection over one video's bytes: L1
    * distance between consecutive frame luminance histograms; a frame is
    * a KEYFRAME when it opens the video or jumps past `threshold`
    * (histograms are L1-normalized, so distances live in [0,2] — 2 =
    * disjoint luminance mass). Returns (frame_idx, dist, isKey) per
    * decodable frame. */
  private[operators] def keyframeKernel(
      bytes: Array[Byte], threshold: Double): Option[Seq[(Int, Double, Boolean)]] = {
    val frames = aviMjpegFrames(bytes)
    if (frames.isEmpty) return None
    var prev: Array[Double] = null
    val out = scala.collection.mutable.ArrayBuffer[(Int, Double, Boolean)]()
    var idx = 0
    frames.foreach { f =>
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
        if (img != null) {
          val hist = lumHistogram(img)
          if (prev == null) out += ((idx, 0.0, true))
          else {
            var d = 0.0
            var j = 0
            while (j < FeatureDim) { d += math.abs(hist(j) - prev(j)); j += 1 }
            out += ((idx, d, d > threshold))
          }
          prev = hist
          idx += 1
        }
      } catch { case _: java.io.IOException => () }
    }
    if (out.isEmpty) None else Some(out.toSeq)
  }

  /** Keyframe selection over media rows (the training-data shape: keep
    * one frame per scene instead of every frame — a 30 fps corpus is
    * ~30× oversampled for vision training). Partition-batched like every
    * decode here (per-row codec state; zero shuffle); output one row per
    * decodable frame (media_id, frame_idx, scene_dist, is_key) so the
    * downstream pipeline filters `is_key` or ranks by scene_dist. */
  def selectKeyframes(
      spark: SparkSession, media: DataFrame, threshold: Double = 0.5): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("scene_dist", DoubleType, nullable = false),
      StructField("is_key", BooleanType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val bytesIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(bytesIdx)) null else r.getAs[Array[Byte]](bytesIdx)
        keyframeKernel(bytes, threshold) match {
          case Some(fs) => fs.map { case (i, d, k) => Row(r.getLong(idIdx), i, d, k) }
          case None => Seq.empty[Row]
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Feature extraction over media rows: partition-batched, zero shuffle,
    * output schema (media_id, feature array). */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("feature", ArrayType(DoubleType))))
    val idIdx = media.schema.fieldIndex("media_id")
    val bytesIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(bytesIdx)) null else r.getAs[Array[Byte]](bytesIdx)
        Row(r.getLong(idIdx), decodeKernelStub(bytes).toSeq)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** REAL image resize kernel (JDK-native): decode, scale to (w, h)
    * with NEAREST-NEIGHBOR (deterministic pure-Java pixel mapping — no
    * native filter variance), re-encode PNG (lossless, so the spec can
    * assert exact pixels). None for undecodable bytes. */
  private[operators] def resizeKernel(
      bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      Some(bos.toByteArray)
    } catch { case _: java.io.IOException => None }
  }

  /** Image resize over media rows — the remaining member of the
    * decode / feature-extract / resize / frame-sample quartet.
    * Partition-batched, zero shuffle, one image in memory per row per
    * task (at 100 TB the binary column streams through; nothing
    * aggregates). Undecodable bytes pass through decoded=false with a
    * null payload — same batch contract as the decoders. */
  def resizeImages(spark: SparkSession, media: DataFrame, w: Int, h: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("decoded", BooleanType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("png", BinaryType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val bytesIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(bytesIdx)) null else r.getAs[Array[Byte]](bytesIdx)
        resizeKernel(bytes, w, h) match {
          case Some(png) => Row(r.getLong(idIdx), true, w, h, png)
          case None => Row(r.getLong(idIdx), false, null, null, null)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Frame sampling: split the binary into fixed-size "frames" and keep
    * every `stride`-th one (a real build would seek keyframes). Pure
    * column expressions — stays in codegen, no UDF. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      // empty/NULL media yields zero frames (sequence(0,0) would emit one
      // phantom frame otherwise). Input columns pass through so callers
      // can keep per-media attributes (byte length, meta) without a
      // corpus-keyed join-back.
      .withColumn("frames",
        when(length(col("bytes")) > 0,
          filter(
            transform(
              sequence(lit(0), ((length(col("bytes")) - 1) / frameBytes).cast("int")),
              i => col("bytes").substr((i * frameBytes + 1).cast("int"), lit(frameBytes))),
            (_, i) => i % stride === 0))
          .otherwise(array().cast("array<binary>")))
      .withColumn("n_sampled", size(col("frames")))

  /** Build a media table from documents (bytes = utf-8 text) — the
    * container has no real media, but the column shapes are identical. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("bytes"),
      struct(
        lit("raw/utf8").as("format"),
        length(col("text")).as("width"),
        lit(1).as("height"),
        (length(col("text")) / 64 + 1).cast("int").as("n_frames")).as("meta"))

  /** Deterministic PNG fixture `t` for the oracle-anchored decode query:
    * w×h image whose first `t+1` row-major pixels are BLACK and the rest
    * WHITE. Only pure black/white pixels appear, so the decoded
    * luminance histogram provably occupies bins {0, 15} regardless of
    * 1-ulp drift in the Rec.601 weights (lum 255±ε and 0 land in the
    * same bins), making (width, height, nblack, nwhite) embeddable as
    * literal VALUES in a static DuckDB oracle. */
  private[operators] def fixturePng(t: Int): Array[Byte] = {
    val w = 3 + t
    val h = 2 + (t % 4)
    val b = t + 1
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < w * h) {
      img.setRGB(i % w, i / w, if (i < b) 0x000000 else 0xFFFFFF)
      i += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  val defs: Seq[graft.QDef] = Seq(
    // L12: the multimodal pipeline's oracle anchor — two legs in one
    // result. (a) REAL image decode: 8 deterministic PNG fixtures run
    // through decodeImages (javax.imageio, true pixel dimensions +
    // luminance histogram); the oracle embeds the expected
    // (width, height, nblack, nwhite) as literal VALUES — the
    // static-superset pattern, valid at every SF because fixtures are
    // corpus-independent. (b) corpus plumbing: every document's bytes
    // through the binary column + frame-sampling geometry
    // (frameBytes=64, stride=2), aggregated to corpus totals DuckDB
    // derives independently from strlen arithmetic. Scale shape: leg
    // (a) is 8 rows; leg (b) is one map-side-combinable aggregate over
    // a single scan — no joins, no windows.
    graft.QDef(
      "q_multimodal",
      (s, d) => {
        import s.implicits._
        val fixtures = (0 until 8).map(t => (900L + t, fixturePng(t)))
          .toDF("media_id", "bytes")
        val fixLeg = decodeImages(s, fixtures).select(
          col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          round(element_at(col("feature"), 1) * col("width") * col("height"), 0)
            .cast("long").as("nblack"),
          round(element_at(col("feature"), 16) * col("width") * col("height"), 0)
            .cast("long").as("nwhite"),
          lit(-1L).as("blen_sum"),
          lit(-1L).as("sampled_sum"),
          lit(-1L).as("ndocs"))
        val media = mediaFromDocuments(s, graft.Tables.documents(s, d))
        val docLeg = sampleFrames(media, frameBytes = 64, stride = 2)
          .agg(
            sum(length(col("bytes"))).cast("long").as("blen_sum"),
            sum(col("n_sampled")).cast("long").as("sampled_sum"),
            count(lit(1)).as("ndocs"))
          .select(
            lit(-1L).as("media_id"), lit(-1L).as("width"), lit(-1L).as("height"),
            lit(-1L).as("nblack"), lit(-1L).as("nwhite"),
            col("blen_sum"), col("sampled_sum"), col("ndocs"))
        fixLeg.unionByName(docLeg).orderBy("media_id")
      },
      Some("""SELECT CAST(media_id AS BIGINT) AS media_id,
             |  CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
             |  CAST(nblack AS BIGINT) AS nblack, CAST(nwhite AS BIGINT) AS nwhite,
             |  CAST(-1 AS BIGINT) AS blen_sum, CAST(-1 AS BIGINT) AS sampled_sum,
             |  CAST(-1 AS BIGINT) AS ndocs
             |FROM (VALUES (900,3,2,1,5),(901,4,3,2,10),(902,5,4,3,17),
             |             (903,6,5,4,26),(904,7,2,5,9),(905,8,3,6,18),
             |             (906,9,4,7,29),(907,10,5,8,42))
             |  v(media_id, width, height, nblack, nwhite)
             |UNION ALL
             |SELECT -1, -1, -1, -1, -1,
             |  CAST(sum(strlen(text)) AS BIGINT) AS blen_sum,
             |  CAST(sum(CASE WHEN strlen(text) > 0
             |             THEN ((strlen(text) - 1) // 64) // 2 + 1 ELSE 0 END)
             |    AS BIGINT) AS sampled_sum,
             |  count(*) AS ndocs
             |FROM documents
             |ORDER BY media_id""".stripMargin))
  )
}
