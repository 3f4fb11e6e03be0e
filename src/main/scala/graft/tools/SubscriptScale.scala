package graft.tools

import graft.sources.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** 10× scale validation for subscript file pruning (SURVEY §6, r8):
  * builds a graft table with `files` single-file commits of map data —
  * disjoint per-file ranges for key "a", a globally-overlapping key "b",
  * and key "c" present ONLY in file 0 — then measures, for an equality
  * predicate (bloom entry hashes), a range predicate (per-entry min/max
  * stats) and a key-absence range predicate, with the toggle off and on:
  * files read, wall time, and result equality. Also reports total/mean
  * `.bfidx` sidecar bytes.
  *
  * The scale claim under test: files-read with pruning is CONSTANT in
  * corpus size (the predicate selects the same 1 file at any F), while
  * toggle-off scans all F files — so the pruned/unpruned gap widens
  * linearly and planning stays driver-side metadata work.
  *
  * Usage: runMain graft.tools.SubscriptScale [files=30] [rowsPerFile=2000]
  * Writes to /tmp/graft-subscale-<files> (outside /root/testdata).
  */
object SubscriptScale {
  def main(args: Array[String]): Unit = {
    val files = if (args.length > 0) args(0).toInt else 30
    val rows = if (args.length > 1) args(1).toInt else 2000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val key = "spark.graft.subscriptFilters.enabled"
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.SubscriptFilterRule(() =>
        spark.conf.get(key, "false").toBoolean)

    val dir = s"/tmp/graft-subscale-$files"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val t = GraftTable.create(spark, dir,
      StructType(Seq(StructField("i1", IntegerType),
        StructField("props", MapType(StringType, IntegerType)),
        StructField("arr", ArrayType(IntegerType)))),
      options = Map("file-index.bloom-filter.columns" -> "props,arr"))
    val t0 = System.nanoTime()
    (0 until files).foreach { f =>
      val av = (lit(f * 1000) + pmod(col("id"), lit(500))).cast("int")
      val bv = pmod(col("id"), lit(100)).cast("int")
      val props =
        if (f == 0) map(lit("a"), av, lit("b"), bv, lit("c"), col("id").cast("int"))
        else map(lit("a"), av, lit("b"), bv)
      // arr[1] carries the same per-file-disjoint range as props['a']
      val arr = array(av, bv)
      t.append(spark.range(rows).select(
        (lit(f.toLong * rows) + col("id")).cast("int").as("i1"),
        props.as("props"), arr.as("arr"))
        .coalesce(1))
    }
    val writeSec = (System.nanoTime() - t0) / 1e9

    val sidecars = fs.globStatus(new org.apache.hadoop.fs.Path(s"$dir/data/*.bfidx"))
    val scBytes = sidecars.map(_.getLen).sum

    def run(cond: org.apache.spark.sql.Column): (Long, Seq[Int], Int) = {
      val s0 = System.nanoTime()
      val df = spark.read.format("graft").load(dir).filter(cond)
      val got = df.collect().map(_.getInt(0)).toSeq.sorted
      val ms = (System.nanoTime() - s0) / 1000000
      val read = "files=(\\d+)/".r.findFirstMatchIn(
        df.queryExecution.executedPlan.toString).map(_.group(1).toInt).getOrElse(-1)
      (ms, got, read)
    }
    val top = (files - 1) * 1000
    val cases = Seq(
      "eq" -> (element_at(col("props"), "a") === (top + 7)),
      "range" -> (element_at(col("props"), "a") > (top + 100)),
      "absent_range" -> (element_at(col("props"), "c") <= 5),
      // array subscripts claim only for failOnError=false shapes
      // (try_element_at): ANSI element_at throws on out-of-bounds and
      // pruning could suppress the error
      "arr_eq" -> (try_element_at(col("arr"), lit(1)) === (top + 7)),
      "arr_range" -> (try_element_at(col("arr"), lit(1)) > (top + 100)))
    val out = cases.map { case (name, cond) =>
      spark.conf.set(key, "false")
      val (offMs, offRows, offRead) = run(cond)
      spark.conf.set(key, "true")
      val (onMs, onRows, onRead) = run(cond)
      require(offRows == onRows, s"$name: toggle changed results!")
      s""""$name":{"rows":${onRows.size},"files_off":$offRead,"files_on":$onRead,"ms_off":$offMs,"ms_on":$onMs}"""
    }
    println(s"""{"files":$files,"rowsPerFile":$rows,"writeSec":${math.round(writeSec * 10) / 10.0},""" +
      s""""sidecarTotalBytes":$scBytes,"sidecarMeanBytes":${scBytes / math.max(1, sidecars.length)},""" +
      out.mkString(",") + "}")
    spark.stop()
  }
}
