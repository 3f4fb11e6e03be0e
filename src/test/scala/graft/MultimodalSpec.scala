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

  test("frame sampling stays in column expressions (no UDF) and strides") {
    val sampled = Multimodal.sampleFrames(media, frameBytes = 64, stride = 2)
    val r = sampled.filter(col("media_id") === 0).collect()(0)
    val frames = r.getSeq[Array[Byte]](r.fieldIndex("frames"))
    assert(frames.nonEmpty)
    assert(r.getInt(r.fieldIndex("n_sampled")) == frames.length)
    assert(!sampled.queryExecution.executedPlan.toString.toLowerCase.contains("batchevalpython"))
  }
}
