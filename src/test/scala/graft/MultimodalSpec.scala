package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.3 L12 — binary media columns, stubbed decode, real plumbing. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val media =
    Multimodal.mediaFromDocuments(spark, Tables.documents(spark, dir))

  test("media table has the binary + typed-metadata contract") {
    assert(media.schema("bytes").dataType.typeName == "binary")
    val meta = media.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("format", "width", "height", "n_frames"))
    assert(media.count() == 500)
  }

  test("feature extraction: batched, deterministic, fixed-dim, no shuffle") {
    val feats = Multimodal.extractFeatures(spark, media)
    assert(feats.schema.fieldNames.toSeq == Seq("media_id", "feature"))
    val rows = feats.orderBy("media_id").limit(5).collect()
    assert(rows.forall(_.getSeq[Double](1).length == Multimodal.FeatureDim))
    // L1-normalized histogram sums to ~1
    assert(rows.forall(r => math.abs(r.getSeq[Double](1).sum - 1.0) < 1e-9))
    // deterministic across runs
    val again = Multimodal.extractFeatures(spark, media).orderBy("media_id").limit(5).collect()
    assert(rows.map(_.getSeq[Double](1)).toSeq == again.map(_.getSeq[Double](1)).toSeq)
    // no exchange in the plan — mapPartitions preserves partitioning
    assert(!feats.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("L12b: real MJPEG-in-AVI video decode — frame count, dimensions, " +
    "per-frame pixels; stub fallback for non-AVI bytes") {
    import spark.implicits._
    // build a real 2-frame MJPEG AVI: JPEG frames via imageio inside a
    // hand-assembled RIFF container (RIFF(AVI )→LIST(movi)→00dc chunks)
    def jpeg(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 6; x <- 0 until 8) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      bos.toByteArray
    }
    def le32(n: Int): Array[Byte] =
      Array((n & 0xFF).toByte, ((n >> 8) & 0xFF).toByte,
        ((n >> 16) & 0xFF).toByte, ((n >> 24) & 0xFF).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    val black = jpeg(0x000000)
    val white = jpeg(0xFFFFFF)
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      chunk("00dc", black) ++ chunk("00dc", white))
    val avi = "RIFF".getBytes("US-ASCII") ++ le32(4 + movi.length) ++
      "AVI ".getBytes("US-ASCII") ++ movi

    val rows = Seq(
      (1L, avi),                           // real MJPEG AVI
      (2L, "not a video".getBytes.toArray) // stub fallback
    ).toDF("media_id", "bytes")
    val out = Multimodal.decodeVideos(spark, rows).orderBy("media_id").collect()

    val v = out(0)
    assert(v.getBoolean(1), "AVI must decode")
    assert(v.getInt(2) == 8 && v.getInt(3) == 6, "true frame dimensions")
    assert(v.getInt(4) == 2, "both frames decoded")
    val hist = v.getSeq[Double](5)
    // mean of an all-black frame (all mass in bin 0) and an all-white
    // frame (all mass in the top bin) — JPEG is lossy but stays within
    // the extreme bins for uniform frames
    assert(math.abs(hist.head - 0.5) < 0.05, s"black half: ${hist.head}")
    assert(math.abs(hist.last - 0.5) < 0.05, s"white half: ${hist.last}")
    assert(math.abs(hist.sum - 1.0) < 1e-9)

    val s = out(1)
    assert(!s.getBoolean(1) && s.isNullAt(4), "non-AVI keeps the stub contract")
    assert(s.getSeq[Double](5).length == Multimodal.FeatureDim)

    // a truncated AVI (cut mid-frame) degrades to the complete frames
    val cut = java.util.Arrays.copyOfRange(avi, 0, avi.length - white.length / 2)
    val t = Multimodal.decodeVideos(spark, Seq((3L, cut)).toDF("media_id", "bytes")).first()
    assert(t.getBoolean(1) && t.getInt(4) == 1, "truncation keeps the first frame")
  }

  test("L12c: real WAV audio decode — sample rate, channels, frames, " +
    "amplitude histogram; stub fallback for non-audio bytes") {
    import spark.implicits._
    // 16-bit PCM mono WAV via the JDK's own writer: 400 Hz sine at 8 kHz
    val rate = 8000f
    val nFrames = 800
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val s = (math.sin(2 * math.Pi * 400 * i / rate) * 20000).toInt.toShort
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    val rows = Seq((1L, wav), (2L, "not audio".getBytes.toArray)).toDF("media_id", "bytes")
    val out = Multimodal.decodeAudio(spark, rows).orderBy("media_id").collect()
    val a = out(0)
    assert(a.getBoolean(1), "WAV must decode")
    assert(a.getInt(2) == 8000 && a.getInt(3) == 1, "true sample rate + channels")
    assert(a.getLong(4) == nFrames, "true frame count")
    val hist = a.getSeq[Double](5)
    assert(math.abs(hist.sum - 1.0) < 1e-9)
    // a sine of amplitude 20000/32768 ≈ 0.61 never exceeds bin 9 and
    // spends the most time near its peak (arcsine distribution)
    assert(hist.drop(10).sum < 1e-9, "no samples above the sine's peak amplitude")
    assert(hist(9) == hist.max, "arcsine density peaks at the amplitude cap")
    val s = out(1)
    assert(!s.getBoolean(1) && s.isNullAt(2), "non-audio keeps the stub contract")
    assert(s.getSeq[Double](5).length == Multimodal.FeatureDim)
  }

  test("L12g: windowed audio energy — exact RMS contour, channel mixdown, stub fallback") {
    import spark.implicits._
    def wavOf(pcm: Array[Byte], channels: Int, frames: Long): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, channels, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    def le16(pcm: Array[Byte], idx: Int, v: Short): Unit = {
      pcm(2 * idx) = (v & 0xFF).toByte; pcm(2 * idx + 1) = ((v >> 8) & 0xFF).toByte
    }
    // mono: 1600 silent frames then 1600 at constant +16384 (= 0.5):
    // windows of 800 → rms contour 0, 0, 0.5, 0.5 EXACTLY
    val mono = new Array[Byte](3200 * 2)
    for (i <- 1600 until 3200) le16(mono, i, 16384)
    // stereo: L=+16384, R=-16384 every frame — the channel mixdown
    // cancels, so the clip is energy-silent despite loud channels
    val stereo = new Array[Byte](800 * 2 * 2)
    for (i <- 0 until 800) { le16(stereo, 2 * i, 16384); le16(stereo, 2 * i + 1, -16384) }
    val rows = Seq(
      (1L, wavOf(mono, 1, 3200)),
      (2L, wavOf(stereo, 2, 800)),
      (3L, "not audio".getBytes.toArray)).toDF("media_id", "bytes")
    val out = Multimodal.audioEnergy(spark, rows, windowFrames = 800)
      .orderBy("media_id").collect()
    val m = out(0)
    assert(m.getBoolean(1))
    assert(m.getLong(2) == 4 && m.getLong(3) == 2, s"windows/active: $m")
    assert(m.getDouble(4) == 0.5 && m.getDouble(5) == 0.25, s"peak/mean exact: $m")
    val st = out(1)
    assert(st.getBoolean(1))
    assert(st.getLong(2) == 1 && st.getLong(3) == 0 && st.getDouble(4) == 0.0,
      s"stereo mixdown must cancel: $st")
    assert(!out(2).getBoolean(1) && out(2).isNullAt(2), "non-audio: decoded=false, null stats")
  }

  test("L12f: keyframe selection — scene changes flagged, steady frames not; non-video yields no rows") {
    import spark.implicits._
    def jpeg(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 6; x <- 0 until 8) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      bos.toByteArray
    }
    def le32(n: Int): Array[Byte] =
      Array((n & 0xFF).toByte, ((n >> 8) & 0xFF).toByte,
        ((n >> 16) & 0xFF).toByte, ((n >> 24) & 0xFF).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    // black, black (steady), white (scene cut), white (steady)
    val frames = Seq(jpeg(0x000000), jpeg(0x000000), jpeg(0xFFFFFF), jpeg(0xFFFFFF))
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      frames.map(chunk("00dc", _)).reduce(_ ++ _))
    val avi = "RIFF".getBytes("US-ASCII") ++ le32(4 + movi.length) ++
      "AVI ".getBytes("US-ASCII") ++ movi
    val rows = Seq((1L, avi), (2L, "not a video".getBytes.toArray))
      .toDF("media_id", "bytes")
    val out = Multimodal.selectKeyframes(spark, rows, threshold = 0.5)
      .orderBy("media_id", "frame_idx").collect()
    assert(out.forall(_.getLong(0) == 1L), "non-video must contribute no frame rows")
    assert(out.length == 4)
    assert(out.map(_.getBoolean(3)).toSeq == Seq(true, false, true, false))
    // scene distance: black→white moves ~all mass across the histogram
    assert(out(2).getDouble(2) > 1.5)
    assert(out(1).getDouble(2) < 0.2 && out(3).getDouble(2) < 0.2)
  }

  test("L12e: image resize — exact pixels under nearest-neighbor, lossless round-trip, stub fallback") {
    import java.awt.image.BufferedImage
    // 4×4 quadrant image: solid colors per 2×2 quadrant
    val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
    val cols = Array(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFFFF)
    for (y <- 0 until 4; x <- 0 until 4)
      img.setRGB(x, y, cols((y / 2) * 2 + (x / 2)))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    import spark.implicits._
    val df = Seq((1L, baos.toByteArray), (2L, "junk".getBytes("UTF-8")))
      .toDF("media_id", "bytes")
    val out = Multimodal.resizeImages(spark, df, 2, 2).orderBy("media_id").collect()
    val ok = out(0)
    assert(ok.getBoolean(1) && ok.getInt(2) == 2 && ok.getInt(3) == 2)
    val resized = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(ok.getAs[Array[Byte]](4)))
    assert(resized.getWidth == 2 && resized.getHeight == 2)
    // nearest-neighbor from a solid 2×2 quadrant can only pick that
    // quadrant's color — one pixel per quadrant, exactly
    val got = for (y <- 0 until 2; x <- 0 until 2)
      yield resized.getRGB(x, y) & 0xFFFFFF
    assert(got == Seq(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFFFF), s"pixels $got")
    // determinism: identical bytes on a second run (lossless PNG)
    val again = Multimodal.resizeImages(spark, df, 2, 2).orderBy("media_id").collect()
    assert(java.util.Arrays.equals(ok.getAs[Array[Byte]](4), again(0).getAs[Array[Byte]](4)))
    // undecodable input keeps the contract
    assert(!out(1).getBoolean(1) && out(1).isNullAt(2) && out(1).isNullAt(4))
  }

  test("L12: real PNG decode — true dimensions and pixel histogram, stub fallback") {
    import java.awt.image.BufferedImage
    // 8×4 PNG: left half black, right half white
    val img = new BufferedImage(8, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xFFFFFF)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val rows = Seq((1L, png), (2L, "not an image".getBytes("UTF-8")))
    import spark.implicits._
    val df = rows.toDF("media_id", "bytes")
    val out = Multimodal.decodeImages(spark, df).orderBy("media_id").collect()

    val ok = out(0)
    assert(ok.getBoolean(1), "PNG must decode with the real codec")
    assert(ok.getInt(2) == 8 && ok.getInt(3) == 4, "true pixel dimensions from the decoder")
    val hist = ok.getSeq[Double](4)
    // 16 black pixels → luminance bin 0; 16 white → bin 15; nothing else
    assert(math.abs(hist(0) - 0.5) < 1e-9 && math.abs(hist(15) - 0.5) < 1e-9,
      s"luminance histogram wrong: $hist")
    assert(math.abs(hist.sum - 1.0) < 1e-9 && hist.slice(1, 15).forall(_ == 0.0))

    val bad = out(1)
    assert(!bad.getBoolean(1) && bad.isNullAt(2) && bad.isNullAt(3),
      "non-image bytes fall back to the stub")
    assert(bad.getSeq[Double](4).length == Multimodal.FeatureDim)
    // the decode is partition-local — no shuffle in the plan
    val plan = Multimodal.decodeImages(spark, df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("frame sampling stays in column expressions (no UDF) and strides") {
    val sampled = Multimodal.sampleFrames(media, frameBytes = 64, stride = 2)
    val r = sampled.filter(col("media_id") === 0).collect()(0)
    val frames = r.getSeq[Array[Byte]](r.fieldIndex("frames"))
    assert(frames.nonEmpty)
    assert(r.getInt(r.fieldIndex("n_sampled")) == frames.length)
    assert(!sampled.queryExecution.executedPlan.toString.toLowerCase.contains("batchevalpython"))
  }
}
