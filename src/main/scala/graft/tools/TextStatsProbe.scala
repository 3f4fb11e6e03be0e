package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** noop-isolated comparison (guide §1.4) of the fused TextStats pass vs
  * the composed split/regexp_replace trio it replaced.
  *   runMain graft.tools.TextStatsProbe <sfDir>
  */
object TextStatsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[tsprobe] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("lang", "doc_id", "text")
    timed("bare scan (warmup)")(noop(docs))
    timed("bare scan")(noop(docs))
    def composed = {
      val len = length(col("text")).cast("long")
      val alnum = length(regexp_replace(col("text"), "[^A-Za-z0-9]", "")).cast("long")
      docs.select(col("lang"), col("doc_id"),
        size(graft.functions.Text.words(col("text"))).cast("long").as("ntok"),
        when(len > 0, floor(lit(1000.0) * (alnum.cast("double") / len.cast("double"))))
          .otherwise(lit(0L)).cast("long").as("b"))
    }
    def fused = {
      val st = graft.functions.TextStatsExpr.textStats(col("text"))
      val len = st.getField("len")
      val alnum = st.getField("alnum")
      docs.select(col("lang"), col("doc_id"),
        st.getField("ntok").as("ntok"),
        when(len > 0, floor(lit(1000.0) * (alnum.cast("double") / len.cast("double"))))
          .otherwise(lit(0L)).cast("long").as("b"))
    }
    for (_ <- 0 until 3) {
      timed("composed split+regexp trio")(noop(composed))
      timed("fused text_stats")(noop(fused))
    }
    spark.stop()
  }
}
