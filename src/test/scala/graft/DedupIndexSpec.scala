package graft

import graft.operators.DedupIndex
import graft.sources.GraftTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.3 L68 — persisted incrementally-maintained MinHash/LSH
  * dedup index: signatures live as a graft PK table, refresh signs only
  * the appended delta, pairs serve from the persisted bands.
  */
class DedupIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def docsDf(d: String) =
    Tables.documents(spark, d).select("doc_id", "text")

  test("L68a: refresh signs ONLY the appended delta") {
    val d = "/root/testdata/sf0.001"
    val src = GraftTable.create(spark, TestSpark.tmpDir("dixsrc"), docSchema)
    src.append(docsDf(d).filter(col("doc_id") % 2 === 0))
    val root = TestSpark.tmpDir("dixidx")
    DedupIndex.build(spark, src, root)
    val sigT = GraftTable.load(spark, s"$root/signatures")
    val snapBefore = sigT.latestSnapshotId.get
    val before = sigT.read().select("doc_id").as[Long].collect().toSet
    assert(before.nonEmpty && before.forall(_ % 2 == 0))

    src.append(docsDf(d).filter(col("doc_id") % 2 =!= 0))
    val signed = DedupIndex.refresh(spark, src, root)
    assert(signed > 0)
    // the refresh commit carries ONLY delta doc_ids — the even half was
    // never re-signed (re-signing would re-deliver their keys here)
    val sigT2 = GraftTable.load(spark, s"$root/signatures")
    val delta = sigT2.readIncrement(snapBefore, sigT2.latestSnapshotId.get)
      .select("doc_id").as[Long].collect().toSet
    assert(delta.nonEmpty && delta.forall(_ % 2 == 1),
      s"refresh re-signed already-indexed docs: ${delta.filter(_ % 2 == 0).take(5)}")
    assert(delta.size.toLong == signed)
  }

  test("L68b: refresh with a current watermark is a no-op") {
    val d = "/root/testdata/sf0.001"
    val src = GraftTable.create(spark, TestSpark.tmpDir("dixsrc2"), docSchema)
    src.append(docsDf(d).limit(50))
    val root = TestSpark.tmpDir("dixidx2")
    DedupIndex.build(spark, src, root)
    val sigT = GraftTable.load(spark, s"$root/signatures")
    val snap = sigT.latestSnapshotId
    assert(DedupIndex.refresh(spark, src, root) == 0L)
    assert(GraftTable.load(spark, s"$root/signatures").latestSnapshotId == snap,
      "a no-op refresh must not commit")
  }

  test("L68c: pairs from a refreshed index equal pairs from a fresh full build") {
    val d = "/root/testdata/sf0.001"
    val src = GraftTable.create(spark, TestSpark.tmpDir("dixsrc3"), docSchema)
    src.append(docsDf(d).filter(col("doc_id") % 2 === 0))
    val rootInc = TestSpark.tmpDir("dixinc")
    DedupIndex.build(spark, src, rootInc)
    src.append(docsDf(d).filter(col("doc_id") % 2 =!= 0))
    DedupIndex.refresh(spark, src, rootInc)
    val rootFull = TestSpark.tmpDir("dixfull")
    DedupIndex.build(spark, src, rootFull)
    def pairSet(root: String) =
      DedupIndex.pairs(spark, src, root)
        .select("d1", "d2").as[(Long, Long)].collect().toSet
    val inc = pairSet(rootInc)
    val full = pairSet(rootFull)
    assert(inc == full, s"diff: ${inc.diff(full).take(3)} / ${full.diff(inc).take(3)}")
    assert(inc.nonEmpty, "sf0.001 documents contain known near-dups")
  }
}
