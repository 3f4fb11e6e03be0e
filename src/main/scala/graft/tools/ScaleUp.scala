package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-data scale-up generator (sf0.1 → sf1): replicates the driver's
  * parquet tables `factor`× with key remapping so uniqueness and join
  * integrity survive, and deterministic content mutation so the dedup /
  * ANN operators see realistic (not degenerate) duplicate structure:
  *
  *  - fact keys (orderkey / event_id / doc_id / vec_id) offset per
  *    replica; dimension tables copy as-is so FK joins still resolve;
  *  - document text gets a replica-tagged token interleaved every 5
  *    words: copies of one doc across replicas are NOT near-dups
  *    (J ≈ 0.2), while the near-dup pairs WITHIN a replica survive —
  *    pair counts scale linearly, as in a real corpus;
  *  - embeddings get a small deterministic per-(id, dim) perturbation so
  *    distances don't collapse into exact ties.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> [factor=10]
  * Output is OUTSIDE /root/testdata (e.g. /tmp/graft-sf1) — the driver
  * data stays untouched.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t: ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }
    def replicate(t: String)(tf: (DataFrame, Int) => DataFrame): Unit = {
      val base = read(t)
      write((0 until factor).map(i => tf(base, i)).reduce(_ unionByName _), t)
    }

    // dimensions: copy — joins from scaled facts still resolve
    Seq("region", "nation", "customer", "supplier", "part").foreach(t => write(read(t), t))

    val Step = 100000000L // > any sf0.1 key range
    replicate("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * Step))
    }
    replicate("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * Step))
    }
    replicate("events") { (df, i) =>
      // ts has shipped as BOTH nanos-as-long (reads BIGINT under
      // nanosAsLong) and µs TIMESTAMP_NTZ (the r9+ vintage) — shift
      // replicas by i*7s under whichever type arrived so sessions stay
      // distinct (the same dual-vintage rule as Tables.normalizeTs)
      val shifted = df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", col("ts") + lit(i * 7000000000L))
        case _ =>
          df.withColumn("ts", col("ts") + expr(s"INTERVAL ${i * 7} SECOND"))
      }
      shifted.withColumn("event_id", col("event_id") + lit(i * Step))
    }
    replicate("documents") { (df, i) =>
      val mutated =
        if (i == 0) df
        else df.withColumn("text",
          array_join(
            flatten(transform(split(col("text"), " "),
              (w, j) => when(j % 5 === 0,
                array(concat_ws("", lit("r"), lit(i), lit("x"), j.cast("string")), w))
                .otherwise(array(w)))),
            " "))
      mutated
        .withColumn("doc_id", col("doc_id") + lit(i * Step))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    replicate("embeddings") { (df, i) =>
      if (i == 0) df
      else df
        .withColumn("vec_id", col("vec_id") + lit(i * Step))
        .withColumn("embedding",
          transform(col("embedding"),
            (x, j) => x + ((pmod(col("vec_id") * 31 + j + lit(i * 131), lit(997)))
              .cast("float") - 498.5f) / 49850.0f))
    }
    spark.stop()
  }
}
