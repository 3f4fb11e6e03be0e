package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named SparkEntry queries to files —
  * the optimization-round evidence trail (plans/r19/<q>_before.txt /
  * _after.txt). Plan-only: builds each query's DataFrame and prints the
  * formatted plan without executing it (side-effecting lifecycle queries
  * still run their setup writes at build time, as in Verify).
  *   runMain graft.tools.ExplainQ <dataDir> <outDir> <suffix> <query>...
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val txt =
        try fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
      val w = new java.io.PrintWriter(s"$outDir/${n}_$suffix.txt")
      try w.println(txt) finally w.close()
      println(s"[explainq] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
