package graft

import graft.operators.KMeansOp
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.3 L26: distributed Lloyd's k-means. */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def blob(center: Array[Double], n: Int, seed: Int): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(center.map(_ + rnd.nextGaussian() * 0.05))
  }

  test("L26a: recovers well-separated clusters exactly and deterministically") {
    import spark.implicits._
    val centers = Seq(
      Array(10.0, 0.0, 0.0), Array(0.0, 10.0, 0.0), Array(0.0, 0.0, 10.0))
    val rows = centers.zipWithIndex.flatMap { case (c, i) =>
      blob(c, 200, seed = i + 1).zipWithIndex.map { case (v, j) =>
        (i * 1000L + j, v.toSeq, i)
      }
    }
    val df = rows.toDF("vec_id", "embedding", "truth").repartition(8)
    val (cent, iters) = KMeansOp.fit(df, "vec_id", "embedding", k = 3, maxIters = 10)
    assert(iters <= 10 && cent.length == 3)
    // every learned centroid sits on one true center (blob radius ≪ sep)
    val matched = cent.map(c => centers.indexWhere(t =>
      t.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum < 1.0))
    assert(matched.toSet == Set(0, 1, 2), s"centroids did not match centers: ${matched.toSeq}")
    // assignments recover the ground-truth partition exactly
    val got = KMeansOp.transformDf(df, "vec_id", "embedding", cent)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    rows.foreach { case (id, _, truth) =>
      assert(got(id) == matched.indexOf(truth), s"vec $id assigned ${got(id)}")
    }
    // determinism: same input, same partitioning discipline → same result
    val (cent2, _) = KMeansOp.fit(df, "vec_id", "embedding", k = 3, maxIters = 10)
    val got2 = KMeansOp.transformDf(df, "vec_id", "embedding", cent2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got2 == got)
  }

  test("L26b: an empty cluster keeps its previous centroid (no NaN, k rows out)") {
    import spark.implicits._
    // only TWO distinct points, k=3: farthest-first duplicates a seed,
    // the first-minimum tie-break starves the duplicate (zero members),
    // and empty-cluster handling must keep it inert — no NaN centroid
    val rows = (Seq.fill(50)(Array(5.0, 5.0)).map((_, 0)) ++
      Seq.fill(50)(Array(-5.0, -5.0)).map((_, 1)))
      .zipWithIndex.map { case ((v, t), i) => (i.toLong, v.toSeq, t) }
    val df = rows.toDF("vec_id", "embedding", "truth")
    val (cent, _) = KMeansOp.fit(df, "vec_id", "embedding", k = 3, maxIters = 8)
    assert(cent.length == 3 && cent.forall(_.forall(x => !x.isNaN)))
    val byCluster = KMeansOp.transformDf(df, "vec_id", "embedding", cent)
      .groupBy("cluster_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // both real locations recovered exactly; the starved cluster is empty
    assert(byCluster.values.sum == 100)
    assert(byCluster.values.toSeq.sorted == Seq(50L, 50L))
  }

  test("L26c: q_kmeans over the embeddings table yields k populated rows") {
    val out = SparkEntry.queries("q_kmeans")(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 8)
    assert(out.map(_.getLong(1)).sum > 0)
  }
}
