package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.3 L16 — token-aware sequence packing invariants. */
class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("L16: packs respect the budget, cover every doc once, and are greedy-maximal") {
    val packed = Packing.packDocuments(spark, dir).cache()
    val docs = Tables.documents(spark, dir)
    // every doc exactly once
    assert(packed.count() == docs.count())
    assert(packed.select("doc_id").distinct().count() == docs.count())
    // budget respected except single oversized docs in their own pack
    val packs = packed.groupBy("pack_id")
      .agg(sum("tokens").as("t"), count(lit(1)).as("n"))
      .select("t", "n").collect()
    assert(packs.forall(r => r.getLong(0) <= Packing.TokenBudget || r.getLong(1) == 1))
    // greedy maximality: within a block, consecutive packs can't merge
    val rows = packed.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byPack = rows.groupBy(_._4).map { case (p, rs) => p -> rs.map(_._2).sum }
    for (Array((p1, _), (p2, _)) <- rows.map(r => (r._4, r._3)).distinct.sliding(2).map(_.toArray)
         if p1 / Packing.PackStride == p2 / Packing.PackStride) {
      val firstOfNext = rows.filter(_._4 == p2).minBy(_._1)._2
      assert(byPack(p1) + firstOfNext > Packing.TokenBudget,
        s"pack $p1 could have absorbed the first doc of $p2")
    }
    // determinism
    val again = Packing.packDocuments(spark, dir).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(rows.map(r => (r._1, r._4)).toSeq == again.toSeq)
    packed.unpersist()
  }
}
