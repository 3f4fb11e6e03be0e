package graft.tools

import org.apache.spark.sql.SparkSession

/** Run named SparkEntry queries against a data dir and print per-query
  * seconds (same timing discipline as Bench: `toRdd.count()` so Catalyst
  * cannot prune the measured work). For plan/scale spot-checks:
  *   runMain graft.tools.RunQ <dir> <query> [query...] [-explain]
  */
object RunQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val explain = args.contains("-explain")
    val names = args.drop(1).filterNot(_.startsWith("-"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val rows = df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[runq] $n%-24s $sec%8.2f s  ($rows rows)")
      if (explain) println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
