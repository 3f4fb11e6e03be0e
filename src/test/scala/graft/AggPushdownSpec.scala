package graft

import graft.sources.GraftTable
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Manifest-only aggregate pushdown: COUNT(*)/MIN/MAX answered from the
  * snapshot manifest's row counts + file stats — the plan is a
  * LocalTableScan (zero tasks, zero file reads), the lakehouse
  * "metadata-only query". */
class AggPushdownSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def isLocalScan(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("LocalTableScan") && !plan.contains("BatchScan")
  }

  test("A1: COUNT(*), MIN, MAX come from the manifest with no file scan") {
    val path = TestSpark.tmpDir("agg1")
    Seq((1, 10L), (5, 50L)).toDF("k", "y").write.format("graft").save(path)
    Seq((3, 30L)).toDF("k", "y").write.format("graft").mode(SaveMode.Append).save(path)
    val df = spark.read.format("graft").load(path)
      .agg(count(lit(1)).as("n"), min("k").as("mn"), max("y").as("mx"))
    val r = df.first()
    assert((r.getLong(0), r.getInt(1), r.getLong(2)) == (3L, 1, 50L))
    assert(isLocalScan(df), df.queryExecution.executedPlan.toString)
  }

  test("A2: GROUP BY partition column also answers from the manifest") {
    val path = TestSpark.tmpDir("agg2")
    Seq(("a", 1), ("a", 2), ("b", 3)).toDF("pt", "x")
      .write.format("graft").option("partitionKeys", "pt").save(path)
    val df = spark.read.format("graft").load(path)
      .groupBy("pt").agg(count(lit(1)).as("n"), max("x").as("mx"))
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    assert(rows.toSeq == Seq(("a", 2L, 2), ("b", 1L, 3)))
    assert(isLocalScan(df), df.queryExecution.executedPlan.toString)
  }

  test("A3: a WHERE clause disables pushdown and still answers correctly") {
    val path = TestSpark.tmpDir("agg3")
    Seq((1, "x"), (2, "y"), (3, "x")).toDF("k", "v").write.format("graft").save(path)
    val df = spark.read.format("graft").load(path).filter(col("v") === "x")
      .agg(count(lit(1)).as("n"))
    assert(df.first().getLong(0) == 2L)
    assert(!isLocalScan(df))
  }

  test("A4: PK tables never push aggregates (merge-on-read hides versions)") {
    val path = TestSpark.tmpDir("agg4")
    val t = GraftTable.create(spark, path,
      new org.apache.spark.sql.types.StructType().add("k", "int").add("v", "string"),
      primaryKeys = Seq("k"))
    t.upsert(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    t.upsert(Seq((1, "a2")).toDF("k", "v")) // superseded version would inflate counts
    val df = spark.read.format("graft").load(path).agg(count(lit(1)).as("n"))
    assert(df.first().getLong(0) == 2L)
    assert(!isLocalScan(df))
  }

  test("A5: time travel counts the pinned snapshot") {
    val path = TestSpark.tmpDir("agg5")
    Seq(1, 2).toDF("k").write.format("graft").save(path)
    Seq(3).toDF("k").write.format("graft").mode(SaveMode.Append).save(path)
    val df = spark.read.format("graft").option("snapshotId", "1").load(path)
      .agg(count(lit(1)).as("n"))
    assert(df.first().getLong(0) == 2L)
    assert(isLocalScan(df))
  }

  test("A6: float/string MIN/MAX are NOT answered from stats (inexact domains)") {
    val path = TestSpark.tmpDir("agg6")
    Seq((1.5f, "aa"), (2.5f, "bb")).toDF("f", "s").write.format("graft").save(path)
    val df = spark.read.format("graft").load(path).agg(min("f").as("mn"), max("s").as("mx"))
    assert(df.first().getFloat(0) == 1.5f)
    assert(!isLocalScan(df))
  }

  test("A7: count on an empty table is 0, from metadata") {
    val path = TestSpark.tmpDir("agg7")
    GraftTable.create(spark, path,
      new org.apache.spark.sql.types.StructType().add("k", "int"))
    val df = spark.read.format("graft").load(path).agg(count(lit(1)).as("n"))
    assert(df.first().getLong(0) == 0L)
    assert(isLocalScan(df))
  }
}
