package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolate the fixed costs of the lifecycle write path (guide §1):
  * parquet file open/close count vs plan execution vs commit latency.
  *   runMain graft.tools.WriteCostProbe <sfDir>
  */
object WriteCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[wprobe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val base = java.nio.file.Files.createTempDirectory("wprobe").toString
    val c = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    c.count() // warm the scan

    // plain Spark parquet writes: per-file fixed cost
    timed("warmup write 1 file")(c.coalesce(1).write.parquet(s"$base/w0"))
    timed("write 1 file")(c.coalesce(1).write.parquet(s"$base/a"))
    timed("write 4 files")(c.repartition(4).write.parquet(s"$base/b"))
    timed("write 59 files")(c.repartition(59).write.parquet(s"$base/c"))
    timed("write 59 files again")(c.repartition(59).write.parquet(s"$base/c2"))

    // graft dynamic-bucket lifecycle, phase by phase
    import graft.sources.GraftTable
    val t = timed("create table")(GraftTable.create(spark, s"$base/dyn", c.schema,
      primaryKeys = Seq("c_custkey"),
      options = Map("bucket" -> "-1", "dynamic-bucket.target-row-num" -> "256")))
    timed("upsert 1 (all new keys, 59 buckets)")(t.upsert(c))
    timed("upsert 2 (1/7 keys updated)")(
      t.upsert(c.filter(col("c_custkey") % 7 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + lit(1000.0))))
    timed("MOR read")(t.read().queryExecution.toRdd.count())
    timed("compact")(t.compact())
    timed("ro read")(t.readOptimized().queryExecution.toRdd.count())
    spark.stop()
  }
}
