package graft.tools

import org.apache.spark.sql.SparkSession

/** Skew probe for the L3 BandCap (r17): drives q_dedup_minhash over
  * three equal-volume corpora — uniform (no families), an EXACT
  * boilerplate mega-cluster (the FormatScaleProbe zipfian shape: every
  * band bucket of the cluster holds all its copies), and a sub-threshold
  * FAMILY corpus (docs sharing ~40% boilerplate vocabulary, J ≈ 0.2 —
  * below Tau, the shape that made the pre-cap sf10 bench quadratic).
  * Pre-cap, the mega shapes explode candidate generation quadratically;
  * post-cap all three must run within a small factor of uniform.
  *
  *   runMain graft.tools.SkewMinhashProbe [nDocs=20000]
  */
object SkewMinhashProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 20000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("skewmh").toString

    val wordsPerDoc = 40
    // splitmix64 finalizer: an UNMIXED affine h(i,j) has a constant
    // cross-doc delta per slot, which manufactures accidental full-doc
    // near-dup families (measured: 30k phantom pairs in the "uniform"
    // corpus) — mix so distinct docs share words only at chance rate
    def word(i: Long, j: Int): String = {
      var h = i * 0x9E3779B97F4A7C15L + j * 0xBF58476D1CE4E5B9L
      h ^= h >>> 30; h *= 0xBF58476D1CE4E5B9L
      h ^= h >>> 27; h *= 0x94D049BB133111EBL
      h ^= h >>> 31
      s"w${(h & 0x7fffffffL) % 50000}"
    }
    // family: even word slots come from a SHARED boilerplate vocabulary
    // (identical across the family), odd slots are per-doc — pairwise
    // J ≈ 0.2 via shingle overlap, never past Tau
    def mk(path: String, kind: String): String = {
      val boiler = (0 until wordsPerDoc).map(j => s"boiler$j")
      val rows = (0 until nDocs).map { i =>
        val text = kind match {
          case "uniform" => (0 until wordsPerDoc).map(word(i, _)).mkString(" ")
          case "mega" =>
            if (i < nDocs / 2) boiler.mkString(" ")
            else (0 until wordsPerDoc).map(word(i, _)).mkString(" ")
          case "family" =>
            if (i < nDocs / 2)
              (0 until wordsPerDoc)
                .map(j => if (j % 2 == 0) boiler(j) else word(i, j)).mkString(" ")
            else (0 until wordsPerDoc).map(word(i, _)).mkString(" ")
        }
        (i.toLong, text, s"l${i % 5}", "web", text.length.toLong)
      }
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .repartition(16).write.parquet(s"$path/documents.parquet")
      path
    }
    for (kind <- Seq("uniform", "mega", "family")) {
      val d = mk(s"$base/$kind", kind)
      val t0 = System.nanoTime()
      val pairs = graft.SparkEntry.queries("q_dedup_minhash")(spark, d)
      val n = pairs.queryExecution.toRdd.count()
      println(f"[skewmh] $kind%-8s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n pairs)")
      if (kind == "mega") {
        // CORRECTNESS, not just timing (ADVICE r17): the nDocs/2 exact
        // copies form one duplicate cluster whose every band bucket is
        // over-cap — the star rule must keep ALL of them reachable in the
        // verified pair graph (each copy pairs with the representative at
        // J = 1), so cluster recall is total despite the cap.
        import org.apache.spark.sql.functions.{col, explode, array, countDistinct}
        val covered = pairs
          .select(explode(array(col("d1"), col("d2"))).as("d"))
          .filter(col("d") < nDocs / 2)
          .agg(countDistinct(col("d"))).head.getLong(0)
        assert(covered == nDocs / 2,
          s"mega-cluster recall broken: $covered of ${nDocs / 2} copies in the pair graph")
        println(s"[skewmh] mega recall OK: all ${nDocs / 2} copies connected")
      }
    }
    spark.stop()
  }
}
