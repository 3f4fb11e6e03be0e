package graft.tools

import graft.{Tables => T}
import graft.functions.{ShingleExpr, Text}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the Jaccard dedup pipeline stages (not shipped
  * in any query path; run via `runMain graft.tools.ProfileDedup`). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // warmup
    T.documents(spark, d).count()

    val docs = time("shingles") {
      val x = T.documents(spark, d)
        .select(col("doc_id"), Text.words(col("text")).as("w"))
        .select(col("doc_id"), ShingleExpr.shingles3(col("w")).as("sh"))
        .persist()
      x.count(); x
    }
    val ex = docs.select(col("doc_id"), explode(col("sh")).as("g"))
    val prefix = time("prefix") {
      val freq = ex.groupBy("g").agg(count(lit(1)).as("c"))
      val sizes = docs.select(col("doc_id"), size(col("sh")).as("sz"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("c", "g")
      val p = ex.join(freq, "g").join(sizes, "doc_id")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= col("sz") - expr("(sz*4+4) div 5") + 1)
        .select("doc_id", "g", "sz").persist()
      println("  prefix rows = " + p.count()); p
    }
    val cand = time("cand-selfjoin") {
      val c = prefix.as("a")
        .join(prefix.as("b"),
          col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id") &&
            greatest(col("a.sz"), col("b.sz")) * 4 <= least(col("a.sz"), col("b.sz")) * 5)
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2")).distinct().persist()
      println("  cand pairs = " + c.count()); c
    }
    time("verify") {
      val sizes = docs.select(col("doc_id"), size(col("sh")).as("sz"))
      val inter = cand
        .join(ex.select(col("doc_id").as("d1"), col("g")), "d1")
        .join(ex.select(col("doc_id").as("d2"), col("g")), Seq("d2", "g"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
      val out = inter
        .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), "d1")
        .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), "d2")
        .withColumn("jr", col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")))
        .filter(col("jr") >= 0.8)
      println("  verified pairs = " + out.count())
    }
    time("apply-anti-join") {
      val drop = cand.select(col("d2").as("doc_id")).distinct()
      println("  kept = " + T.documents(spark, d)
        .join(drop, Seq("doc_id"), "left_anti").count())
    }
    spark.stop()
  }
}
