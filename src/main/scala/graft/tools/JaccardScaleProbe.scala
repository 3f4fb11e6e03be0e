package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage scale probe for the PPJoin Jaccard cascade — counts
  * each intermediate so the disk-hungry stage at very large SFs is
  * attributable (the end-to-end run only reports the final failure).
  *
  *   runMain graft.tools.JaccardScaleProbe <sfDir>
  */
object JaccardScaleProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[jprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }
    val docs = graft.operators.Dedup.docsWithShingles(spark, d)
    timed("docs")(docs.count())
    timed("exploded shingles")(
      docs.select(explode(col("sh"))).count())
    val cand = graft.operators.Dedup.jaccardCandidates(docs)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    timed("candidates")(cand.count())
    timed("verified pairs")(
      graft.operators.Dedup.verifyJaccard(cand, docs).count())
    spark.stop()
  }
}
