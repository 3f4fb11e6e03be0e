package graft

import graft.sources.GraftTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.1 S60: read-optimized `$ro` system table (ref: Paimon's
  * ReadOptimizedTable / `table$ro`) — serve a PK table merge-free from
  * its live COMPACTED files: each group's state as of its last fold,
  * groups never folded contribute nothing (the documented freshness
  * trade). */
class ReadOptimizedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", IntegerType), StructField("v", StringType)))

  test("S60a: $ro serves the last-compaction state; the merging read stays exact") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("ro-basic"), schema,
      primaryKeys = Seq("k"))
    t.upsert(Seq((1, "a1"), (2, "b1")).toDF("k", "v"))
    // never compacted: $ro is EMPTY, not the merged state
    assert(t.system("ro").count() == 0)
    t.compact()
    assert(t.system("ro").collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq ==
      Seq((1, "a1"), (2, "b1")))
    // post-compaction updates: $ro stays at the fold, read() advances
    t.upsert(Seq((1, "a2"), (3, "c1")).toDF("k", "v"))
    assert(t.system("ro").collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq ==
      Seq((1, "a1"), (2, "b1")))
    assert(t.read().collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq ==
      Seq((1, "a2"), (2, "b1"), (3, "c1")))
    // the next fold catches $ro up, including delete resolution
    t.delete(Seq((2, "x")).toDF("k", "v"))
    t.compact()
    assert(t.system("ro").collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq ==
      Seq((1, "a2"), (3, "c1")))
  }

  test("S60b: targeted compactBuckets folds only its groups into $ro") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("ro-targeted"), schema,
      primaryKeys = Seq("k"), options = Map("bucket" -> "2", "bucket-key" -> "k"))
    // key 1 and 2 land in different buckets (checked below); write 3
    // versions of key 1's bucket so only IT reaches the trigger
    t.upsert(Seq((1, "a1"), (2, "b1")).toDF("k", "v"))
    t.upsert(Seq((1, "a2")).toDF("k", "v"))
    t.upsert(Seq((1, "a3")).toDF("k", "v"))
    val buckets = t.system("files").select("bucket").as[Int].collect().distinct
    assert(buckets.length == 2, "test premise: keys 1 and 2 hash to different buckets")
    assert(t.compactBuckets(trigger = 3).isDefined)
    // only key 1's bucket folded: $ro serves it, key 2's bucket is absent
    assert(t.system("ro").collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a3")))
    // $files reports the fold outputs
    val compacted = t.system("files").filter(col("compacted")).count()
    assert(compacted == 1L)
  }

  test("S60c: non-PK tables are already merge-free — $ro equals the read") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("ro-append"), schema)
    t.append(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    assert(t.system("ro").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }

  test("S60d: a CoW rewrite re-opens its groups — they leave $ro until the next fold") {
    val wh = TestSpark.tmpDir("ro-cow-wh")
    spark.conf.set("spark.sql.catalog.roc", "graft.sources.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.roc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS roc.db")
    spark.sql("CREATE TABLE roc.db.t (k INT, v STRING) TBLPROPERTIES ('primary-key' = 'k')")
    spark.sql("INSERT INTO roc.db.t VALUES (1, 'a1'), (2, 'b1')")
    val t = GraftTable.load(spark, s"$wh/db.db/t")
    t.compact()
    assert(t.system("ro").count() == 2)
    // UPDATE rewrites the (single) group copy-on-write: its files are no
    // longer fold outputs, so $ro empties rather than serve a state that
    // never existed
    spark.sql("UPDATE roc.db.t SET v = 'a2' WHERE k = 1")
    assert(t.system("ro").count() == 0)
    t.compact()
    assert(t.system("ro").collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq ==
      Seq((1, "a2"), (2, "b1")))
  }
}
