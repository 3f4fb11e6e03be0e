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
    // co-tenancy sentinel: a fixed reference measurement (median of 3×
    // q_string — a pure scan+agg whose cost never changes round-over-
    // round) stamped into the JSON, so cross-round totals are
    // NORMALIZABLE: r17's driver-recorded 223.8 s vs judge-measured
    // 151.9 s was host co-tenancy (uniform ~1.5× inflation), and without
    // a sentinel that artifact reads as a regression. Compare totals as
    // total/sentinel across rounds.
    val sentinelQ =
      if (SparkEntry.queries.contains("q_string")) "q_string"
      else SparkEntry.queries.keys.toSeq.sorted.head
    val sentinel = Seq.fill(3)(run(sentinelQ)._1).sorted.apply(1)
    // Optional args = subset of query names (local profiling); driver
    // invokes with no args → full sweep.
    val names =
      if (args.nonEmpty) SparkEntry.queries.keys.toSeq.sorted.filter(args.contains)
      else SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { name =>
      val (sec, ok) = run(name)
      // stream per-query progress to stderr: a long big-SF sweep that is
      // killed (wall-clock cap, OOM later in the alphabet) still yields
      // every completed measurement — BENCH_FULL.json only lands at exit
      System.err.println(String.format(java.util.Locale.ROOT,
        "[bench] done %s %.3f s ok=%b", name, Double.box(sec), Boolean.box(ok)))
      (name, if (ok) sec else -1.0)
    }
    // Locale.ROOT: the f-interpolator honors the JVM default locale, and
    // a comma-decimal locale would render invalid JSON
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    def qjson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val ok = results.filter(_._2 >= 0)
    val total = ok.map(_._2).sum
    val mean = if (ok.nonEmpty) total / ok.size else 0.0
    // The driver captures only the LAST 2000 chars of stdout (seen in
    // every BENCH_r*.json: "tail" is exactly 2000 chars and the full
    // per-query map for 140+ queries is ~4.5 KB, so the final JSON line
    // arrived front-truncated and "parsed" stayed null through r11).
    // Emit a compact line that provably fits: slowest-40 subset at 3dp
    // (~1.2 KB) + totals; the FULL map goes to BENCH_FULL.json in cwd.
    val slowest = ok.sortBy(-_._2).take(40).sortBy(_._1)
    val full =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","nq":${results.size},"mean":${fmt(mean)},"sentinel":${fmt(sentinel)},"queries":${qjson(results)},"failed":$failed,"sf":"$sfDir"}"""
    try {
      val w = new java.io.PrintWriter("BENCH_FULL.json")
      try w.println(full) finally w.close()
    } catch { case e: Exception => System.err.println(s"[bench] full dump failed: $e") }
    // stop FIRST so Spark's shutdown chatter can't interleave after the
    // result: the JSON must be the final bare stdout line or the
    // driver's parser records "parsed": null (seen in r10)
    spark.stop()
    System.out.println(
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","nq":${results.size},"mean":${fmt(mean)},"sentinel":${fmt(sentinel)},"queries":${qjson(slowest)},"failed":$failed,"sf":"$sfDir"}""")
    System.out.flush()
  }
}
