package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Force FULL plan execution: a bare df.count() lets Catalyst prune
    // the computed columns and drop sorts, benchmarking a hollowed-out
    // plan. toRdd materializes every InternalRow of the real plan.
    def run(name: String): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // untimed warmup: JIT + classloading + parquet footer caches, so the
    // first timed query isn't charged ~5s of JVM startup
    run(if (SparkEntry.queries.contains("q1_agg")) "q1_agg"
        else SparkEntry.queries.keys.head)
    // Optional args = subset of query names (local profiling); driver
    // invokes with no args → full sweep.
    val names =
      if (args.nonEmpty) SparkEntry.queries.keys.toSeq.sorted.filter(args.contains)
      else SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { name =>
      val (sec, ok) = run(name)
      (name, if (ok) sec else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // stop FIRST so Spark's shutdown chatter can't interleave after the
    // result: the JSON must be the final bare stdout line or the
    // driver's parser records "parsed": null (seen in r10)
    spark.stop()
    System.out.println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    System.out.flush()
  }
}
