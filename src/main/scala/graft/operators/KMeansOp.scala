package graft.operators

import graft.{QDef, Tables => T}
import graft.functions.VectorExpr
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column (SURVEY §2.3
  * L26) — the trainer for the IVF coarse quantizer (L19, whose scaladoc
  * promises "swapping in trained k-means centroids changes only the
  * `cent` frame"), and the vector-clustering primitive a curation
  * pipeline uses for topic balancing / semantic dedup binning.
  *
  * Scale shape:
  *  - centroids live on the DRIVER as k × dims doubles (bounded
  *    metadata, like Percentiles' run table); each round broadcasts
  *    them into the plan as literals, so the per-round frame derives
  *    FRESH from the input — no growing lineage, no checkpoint needed
  *    (contrast connectedComponents, whose labels are data-sized and
  *    must flow through localCheckpoint).
  *  - assignment is one codegen-friendly pass: squared L2 via the
  *    expansion |v|² − 2·v·c + |c|² with the native sequential-fold dot
  *    (VectorExpr.dot — NOT a higher-order function; HOFs are
  *    interpreted and 17-30× slower on per-element hot paths), argmin
  *    as array_position(array_min) — first minimum wins, deterministic.
  *  - the update step aggregates per-(cluster, dimension) sums — scalar
  *    rows, map-side combinable, k × dims values to the driver per
  *    round. No per-group vector state anywhere.
  *
  * Init is deterministic (the k smallest-id vectors); empty clusters
  * keep their previous centroid. Cross-row float sums make centroid
  * bits partitioning-dependent at the ulp level, so the q entry is
  * rows-only (assignment COUNTS are stable — KMeansSpec asserts exact
  * recovery of well-separated clusters and run-to-run determinism).
  */
object KMeansOp {

  /** Squared L2 distance from vector column `v` (with precomputed
    * |v|² column `vn2`) to a literal centroid. */
  private def dist2(v: Column, vn2: Column, c: Array[Double]): Column =
    vn2 - lit(2.0) * VectorExpr.dot(v, typedlit(c.toSeq)) +
      lit(c.map(x => x * x).sum)

  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Deterministic sampled farthest-first init: ONE pass takes a
    * hash-ordered sample (top-k sort, no full collect), then a
    * driver-local greedy picks k maximally-spread sample points (strict
    * > keeps ties deterministic: first in hash order wins). Naive
    * smallest-k-ids seeding puts every seed in one region of an
    * id-ordered corpus and Lloyd's sticks in that local optimum
    * (observed: 3 seeds in one blob left a 3-blob dataset unrecovered);
    * farthest-first is the standard deterministic fix. If the corpus has
    * fewer than k distinct points the surplus seeds DUPLICATE an
    * existing one — the first-minimum assignment tie-break then starves
    * the duplicate and empty-cluster handling keeps it inert. */
  private def initCentroids(base: DataFrame, k: Int): Array[Array[Double]] = {
    val sampleN = math.max(k * 32, 512)
    val sample = base
      .orderBy(xxhash64(col("__id")), col("__id"))
      .limit(sampleN)
      .select("__v").collect().map(_.getSeq[Double](0).toArray)
    require(sample.length >= k, s"corpus has fewer than $k vectors")
    val chosen = scala.collection.mutable.ArrayBuffer(sample.head)
    while (chosen.size < k) {
      var best = 0
      var bestD = -1.0
      var i = 0
      while (i < sample.length) {
        val dmin = chosen.iterator.map(c => l2sq(sample(i), c)).min
        if (dmin > bestD) { bestD = dmin; best = i }
        i += 1
      }
      chosen += sample(best)
    }
    chosen.toArray
  }

  /** Train k centroids; returns (centroids, iterations run). */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
      maxIters: Int = 10, tol: Double = 1e-9): (Array[Array[Double]], Int) = {
    require(k >= 1 && maxIters >= 1)
    val base = df
      .select(col(idCol).as("__id"),
        transform(col(vecCol), x => x.cast("double")).as("__v"))
      .filter(col("__v").isNotNull)
      .withColumn("__vn2", VectorExpr.dot(col("__v"), col("__v")))
    var centroids: Array[Array[Double]] = initCentroids(base, k)
    val dims = centroids.head.length
    var iter = 0
    var moved = Double.MaxValue
    while (iter < maxIters && moved > tol) {
      val assigned = assign(base, "__v", "__vn2", centroids)
      // per-(cluster, dim) sums: scalar rows, map-side combinable;
      // k × dims scalars reach the driver
      val sums = assigned
        .select(col("__c"), posexplode(col("__v")).as(Seq("__p", "__x")))
        .groupBy("__c", "__p")
        .agg(sum("__x").as("s"), count(lit(1)).as("n"))
        .collect()
      val acc = Array.fill(k)(new Array[Double](dims))
      val cnt = new Array[Long](k)
      sums.foreach { r =>
        val c = r.getInt(0); val p = r.getInt(1)
        acc(c)(p) = r.getDouble(2)
        cnt(c) = r.getLong(3)
      }
      val next = Array.tabulate(k) { c =>
        if (cnt(c) == 0) centroids(c) // empty cluster: keep previous
        else acc(c).map(_ / cnt(c))
      }
      moved = centroids.zip(next).map { case (a, b) =>
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      }.max
      centroids = next
      iter += 1
    }
    (centroids, iter)
  }

  /** Adds `__c` (0-based cluster id, first-minimum tie-break). */
  private def assign(df: DataFrame, vecCol: String, vn2Col: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val ds = array(centroids.map(c => dist2(col(vecCol), col(vn2Col), c)): _*)
    // array_position needs the needle as a COLUMN: the functions-API
    // overload would treat array_min's Column as a literal
    df.withColumn("__ds", ds)
      .withColumn("__c",
        (expr("array_position(__ds, array_min(__ds))") - 1).cast("int"))
      .drop("__ds")
  }

  /** Assign every vector of `df` to its nearest trained centroid. */
  def transformDf(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val base = df
      .select(col(idCol).as("__id"),
        transform(col(vecCol), x => x.cast("double")).as("__v"))
      .filter(col("__v").isNotNull)
      .withColumn("__vn2", VectorExpr.dot(col("__v"), col("__v")))
    assign(base, "__v", "__vn2", centroids)
      .select(col("__id").as(idCol), col("__c").as("cluster_id"))
  }

  val defs: Seq[QDef] = Seq(
    // L26: k-means over the embeddings corpus — rows-only check (k rows,
    // one per cluster; cross-row float sums make centroid bits
    // partitioning-dependent, so no SQL oracle — see scaladoc).
    QDef(
      "q_kmeans",
      (s, d) => {
        val emb = T.embeddings(s, d)
        val (cent, _) = fit(emb, "vec_id", "embedding", k = 8, maxIters = 5)
        transformDf(emb, "vec_id", "embedding", cent)
          .groupBy("cluster_id")
          .agg(count(lit(1)).as("n"), min("vec_id").as("min_id"))
          .orderBy("cluster_id")
      },
      None)
  )
}
