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

  test("L36: chunk windows cover every token, overlap exactly W-S, and are deterministic") {
    val W = 32L
    val S = 24L
    val out = SparkEntry.queries("q_chunk_docs")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))
    assert(out.nonEmpty)
    val byDoc = out.groupBy(_._1)
    byDoc.foreach { case (doc, chunks) =>
      val sorted = chunks.sortBy(_._4)
      val nw = sorted.head._2
      val nChunks = sorted.head._3
      // declared chunk count matches the emitted rows and the formula
      assert(sorted.map(_._4).toSeq == (0L until nChunks).toSeq, s"doc $doc chunk ids")
      val expected = if (nw <= W) 1L else (nw - W + S - 1) / S + 1
      assert(nChunks == expected, s"doc $doc n_chunks")
      sorted.foreach { case (_, _, _, i, start, nTok, _) =>
        assert(start == i * S + 1)
        assert(nTok == math.min(W, nw - i * S), s"doc $doc chunk $i token count")
        assert(nTok > 0, s"doc $doc emitted an empty chunk")
      }
      // coverage: last chunk reaches the final token; neighbors overlap W-S
      val last = sorted.last
      assert(last._5 + last._6 - 1 == nw, s"doc $doc tail coverage")
      if (nChunks > 1)
        sorted.sliding(2).foreach { case Array(a, b) =>
          val overlap = (a._5 + a._6) - b._5 // prev end+1 - next start
          assert(overlap == W - S,
            s"doc $doc overlap between ${a._4} and ${b._4}")
        }
    }
    // determinism: identical md5 stream on a second run
    val again = SparkEntry.queries("q_chunk_docs")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getString(6)))
    assert(out.map(r => (r._1, r._4, r._7)).toSeq == again.toSeq)
  }
}
