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
