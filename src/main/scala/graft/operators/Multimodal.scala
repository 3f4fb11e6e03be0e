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
