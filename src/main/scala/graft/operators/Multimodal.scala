package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2.3 L12): media as opaque binary
  * columns + typed metadata, with decode / feature-extract / frame-sample
  * as partition-batched transforms.
  *
  * The actual codecs (image/audio libs) are NOT in this container, so the
  * decode kernel is a clearly-marked deterministic STUB — but everything
  * Spark-side is real: the schema contract, the mapPartitions batch
  * shape (the per-partition closure is where a real codec would hold its
  * reusable decode buffers; the stub itself allocates per row), the
  * preserved partitioning, and the output encoders. Swapping the stub for
  * a JNI/py kernel changes no plan shape.
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

  /** REAL decode kernel for image formats the JDK ships codecs for (PNG
    * / GIF / BMP / JPEG via javax.imageio — pure JVM, zero external
    * dependencies): full pixel decode, then a 16-bin luminance histogram
    * (Rec.601 weights), L1-normalized. Returns None for bytes no
    * installed reader claims (e.g. video — still stubbed: the JDK has no
    * video codec). */
  private[operators] def decodeImageKernel(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
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
        Some((w, h, hist))
      }
    } catch { case _: java.io.IOException => None }
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

  /** Frame sampling: split the binary into fixed-size "frames" and keep
    * every `stride`-th one (a real build would seek keyframes). Pure
    * column expressions — stays in codegen, no UDF. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.select(
      col("media_id"),
      col("meta"),
      // empty/NULL media yields zero frames (sequence(0,0) would emit one
      // phantom frame otherwise)
      when(length(col("bytes")) > 0,
        filter(
          transform(
            sequence(lit(0), ((length(col("bytes")) - 1) / frameBytes).cast("int")),
            i => col("bytes").substr((i * frameBytes + 1).cast("int"), lit(frameBytes))),
          (_, i) => i % stride === 0))
        .otherwise(array().cast("array<binary>")).as("frames"))
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
}
