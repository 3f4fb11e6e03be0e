package graft

import graft.functions.{HashExpr, ShingleExpr, Text}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.3 L2–L4: near-dup operators vs brute-force ground truth at
  * sf0.001. */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, dir)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** brute-force all-pairs 3-gram Jaccard ≥ 0.8 — O(n²), test-only. */
  private lazy val truth: Set[(Long, Long)] = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .select(col("doc_id"), ShingleExpr.shingles3(col("w")).as("sh"))
    val a = docs.select(col("doc_id").as("d1"), col("sh").as("sh1"))
    val b = docs.select(col("doc_id").as("d2"), col("sh").as("sh2"))
    a.crossJoin(b).filter(col("d1") < col("d2"))
      .withColumn("j",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))).cast("double"))
      .filter(col("j") >= 0.8)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("L2: rare-shingle Jaccard finds exactly the ground-truth pairs") {
    assert(pairs("q_dedup_jaccard") == truth)
    assert(truth.nonEmpty) // the corpus has planted near-dups
  }

  test("L3: minhash+LSH candidates verify to a subset with high recall") {
    val mh = pairs("q_dedup_minhash")
    assert(mh.subsetOf(truth)) // verification step guarantees precision 1.0
    assert(mh.size >= (truth.size * 0.85).toInt) // banding recall
  }

  test("L4: simhash hamming pairs match brute-force hamming at the same radius") {
    val got = SparkEntry.queries("q_dedup_simhash")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sims = Tables.documents(spark, dir).select(col("doc_id"),
      HashExpr.simHash(transform(Text.words(col("text")), w => HashExpr.tokenHash64(w))).as("s"))
    val a = sims.select(col("doc_id").as("d1"), col("s").as("s1"))
    val b = sims.select(col("doc_id").as("d2"), col("s").as("s2"))
    val brute = a.crossJoin(b).filter(col("d1") < col("d2"))
      .withColumn("hd", bit_count(col("s1").bitwiseXOR(col("s2"))).cast("long"))
      .filter(col("hd") <= 3)
      .select("d1", "d2", "hd")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // with hd<=3 and 4 chunks, pigeonhole guarantees some chunk is
    // untouched ⇒ candidate generation is complete and sets are equal.
    assert(got == brute)
  }
}
