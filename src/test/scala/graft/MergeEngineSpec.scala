package graft

import graft.sources.GraftTable
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.1 S26: Paimon merge engines beyond deduplicate —
  * first-row, partial-update, aggregation — resolved identically by the
  * window formulation (GraftTable.mergeVersions) and the V2 in-scan fold
  * (GraftMorReaderFactory), with -D resetting folded keys.
  * (ref: Paimon CoreOptions MERGE_ENGINE; the reference connector reads
  * tables produced under all of these engines.)
  */
class MergeEngineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Both read paths must agree: read() routes PK tables through the V2
    * scan (in-scan fold); read(dataFilters=...) takes the library window
    * path. Returns the V2-path rows after asserting parity. */
  private def readBoth(t: GraftTable): Seq[Row] = {
    val v2 = t.read().orderBy("k").collect().toSeq
    val window = t.read(dataFilters =
      Seq(org.apache.spark.sql.sources.IsNotNull("k"))).orderBy("k").collect().toSeq
    assert(v2 == window, s"V2 fold and window merge disagree:\n  v2=$v2\n  win=$window")
    v2
  }

  test("first-row: earliest version per key wins") {
    val schema = StructType(Seq(
      StructField("k", IntegerType), StructField("v", StringType)))
    val t = GraftTable.create(spark, TestSpark.tmpDir("me-first"), schema,
      primaryKeys = Seq("k"), options = Map("merge-engine" -> "first-row"))
    t.append(Seq((1, "first"), (2, "b")).toDF("k", "v"))
    t.append(Seq((1, "second"), (3, "c")).toDF("k", "v"))
    val rows = readBoth(t).map(r => (r.getInt(0), r.getString(1)))
    assert(rows == Seq((1, "first"), (2, "b"), (3, "c")))
  }

  test("partial-update: latest non-null wins per column; nulls never overwrite") {
    val schema = StructType(Seq(
      StructField("k", IntegerType),
      StructField("a", StringType),
      StructField("b", StringType)))
    val t = GraftTable.create(spark, TestSpark.tmpDir("me-pu"), schema,
      primaryKeys = Seq("k"), options = Map("merge-engine" -> "partial-update"))
    t.append(Seq((1, Some("a1"), None: Option[String])).toDF("k", "a", "b"))
    t.append(Seq((1, None: Option[String], Some("b2"))).toDF("k", "a", "b"))
    t.append(Seq((1, None: Option[String], None: Option[String])).toDF("k", "a", "b"))
    val rows = readBoth(t).map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(rows == Seq((1, "a1", "b2")))
  }

  test("partial-update: a delete resets the key (remove-record-on-delete)") {
    val schema = StructType(Seq(
      StructField("k", IntegerType),
      StructField("a", StringType),
      StructField("b", StringType)))
    val t = GraftTable.create(spark, TestSpark.tmpDir("me-pud"), schema,
      primaryKeys = Seq("k"), options = Map("merge-engine" -> "partial-update"))
    t.append(Seq((1, Some("a1"), Some("b1"))).toDF("k", "a", "b"))
    t.delete(Seq((1, Some("a1"), Some("b1"))).toDF("k", "a", "b"))
    assert(readBoth(t).isEmpty) // delete wins
    t.append(Seq((1, None: Option[String], Some("b3"))).toDF("k", "a", "b"))
    // pre-delete a1 must NOT resurrect: fold restarts after the -D
    val rows = readBoth(t).map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(rows == Seq((1, null, "b3")))
  }

  test("aggregation: per-column functions fold all versions; declared types kept") {
    val schema = StructType(Seq(
      StructField("k", IntegerType),
      StructField("total", IntegerType), // sum must come back as INT
      StructField("hi", LongType),
      StructField("tags", StringType),
      StructField("any_err", BooleanType),
      StructField("last_v", StringType)))
    val t = GraftTable.create(spark, TestSpark.tmpDir("me-agg"), schema,
      primaryKeys = Seq("k"),
      options = Map(
        "merge-engine" -> "aggregation",
        "fields.total.aggregate-function" -> "sum",
        "fields.hi.aggregate-function" -> "max",
        "fields.tags.aggregate-function" -> "listagg",
        "fields.any_err.aggregate-function" -> "bool_or"))
    t.append(Seq((1, 10, 5L, "x", false, "v1"), (2, 1, 9L, "m", true, "w1"))
      .toDF("k", "total", "hi", "tags", "any_err", "last_v"))
    t.append(Seq((1, 7, 3L, "y", true, "v2")).toDF("k", "total", "hi", "tags", "any_err", "last_v"))
    t.append(Seq((1, 5, 8L, "z", false, "v3")).toDF("k", "total", "hi", "tags", "any_err", "last_v"))
    val rows = readBoth(t).map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getString(3), r.getBoolean(4), r.getString(5)))
    assert(rows == Seq(
      (1, 22, 8L, "x,y,z", true, "v3"), // sum, max, listagg in commit order, bool_or, last
      (2, 1, 9L, "m", true, "w1")))
    assert(t.read().schema("total").dataType == IntegerType)
  }

  test("aggregation: sum skips nulls and a delete resets the running fold") {
    val schema = StructType(Seq(
      StructField("k", IntegerType), StructField("total", LongType)))
    val t = GraftTable.create(spark, TestSpark.tmpDir("me-aggd"), schema,
      primaryKeys = Seq("k"),
      options = Map("merge-engine" -> "aggregation",
        "fields.total.aggregate-function" -> "sum"))
    t.append(Seq((1, Some(10L))).toDF("k", "total"))
    t.append(Seq((1, None: Option[Long])).toDF("k", "total"))
    t.append(Seq((1, Some(4L))).toDF("k", "total"))
    assert(readBoth(t).map(r => (r.getInt(0), r.getLong(1))) == Seq((1, 14L)))
    t.delete(Seq((1, Some(0L))).toDF("k", "total"))
    t.append(Seq((1, Some(3L))).toDF("k", "total"))
    assert(readBoth(t).map(r => (r.getInt(0), r.getLong(1))) == Seq((1, 3L)))
  }

  test("merge engines survive SQL reads and compaction") {
    val schema = StructType(Seq(
      StructField("k", IntegerType), StructField("total", LongType)))
    val t = GraftTable.create(spark, TestSpark.tmpDir("me-sql"), schema,
      primaryKeys = Seq("k"),
      options = Map("merge-engine" -> "aggregation",
        "fields.total.aggregate-function" -> "sum"))
    t.append(Seq((1, 2L), (2, 5L)).toDF("k", "total"))
    t.append(Seq((1, 3L)).toDF("k", "total"))
    // SQL path = V2 scan fold
    val sql = spark.read.format("graft").load(t.root)
      .orderBy("k").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(sql.toSeq == Seq((1, 5L), (2, 5L)))
    // compaction materializes the folded state; reads keep answering,
    // and post-compact appends fold on top of the compacted base
    t.compact()
    t.append(Seq((1, 1L)).toDF("k", "total"))
    assert(readBoth(t).map(r => (r.getInt(0), r.getLong(1))) == Seq((1, 6L), (2, 5L)))
  }

  test("changelog-producer=lookup rejects non-deduplicate engines") {
    val schema = StructType(Seq(
      StructField("k", IntegerType), StructField("v", StringType)))
    val t = GraftTable.create(spark, TestSpark.tmpDir("me-cl"), schema,
      primaryKeys = Seq("k"),
      options = Map("merge-engine" -> "partial-update", "changelog-producer" -> "lookup"))
    intercept[IllegalArgumentException] {
      t.append(Seq((1, "a")).toDF("k", "v"))
    }
  }
}
