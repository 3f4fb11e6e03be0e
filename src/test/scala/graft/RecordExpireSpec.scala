package graft

import graft.sources.GraftTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.1 S56 — record-level expire (Paimon's
  * record-level.expire-time + record-level.time-field): aged rows leave
  * the table when a compaction rewrites their files — lazy, piggybacked
  * on maintenance I/O, never a dedicated delete scan. The clock is
  * pinned via record-level.expire.now-millis so every assertion is
  * deterministic.
  */
class RecordExpireSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Now = 1_000_000_000_000L // pinned epoch millis
  private val Hour = 3_600_000L

  private def opts(extra: (String, String)*): Map[String, String] =
    Map(
      "record-level.expire-time" -> "1h",
      "record-level.time-field" -> "ts",
      "record-level.expire.now-millis" -> Now.toString) ++ extra

  test("S56a: expiry is compaction-lazy; BIGINT millis; nulls never expire") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("rexp-a"),
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType),
        StructField("ts", LongType))),
      primaryKeys = Seq("k"), options = opts())
    t.upsert(Seq(
      (1, "old", Now - 2 * Hour),
      (2, "fresh", Now - 60_000L)).toDF("k", "v", "ts"))
    t.upsert(Seq((3, "never")).toDF("k", "v")
      .withColumn("ts", lit(null).cast(LongType))
      .select("k", "v", "ts"))
    // reads do NOT filter — expiry waits for maintenance (Paimon semantics)
    assert(t.read().count() == 3)
    t.compact()
    val after = t.read().select("k").as[Int].collect().sorted
    assert(after.toSeq == Seq(2, 3), "expired row dropped; null ts retained")
    // physically gone from the rewritten files, not just masked (older
    // snapshots keep the pre-compaction files for time travel — expire
    // them before inspecting the raw directory)
    t.expireSnapshots(1)
    t.removeOrphanFiles(0L)
    val raw = spark.read.parquet(s"${t.root}/data")
    assert(raw.filter(col("k") === 1).isEmpty)
  }

  test("S56b: INT epoch-seconds encoding on an append table") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("rexp-b"),
      StructType(Seq(StructField("k", IntegerType), StructField("ts", IntegerType))),
      options = opts())
    val nowSec = (Now / 1000L).toInt
    t.append(Seq((1, nowSec - 7200), (2, nowSec - 60)).toDF("k", "ts"))
    assert(t.read().count() == 2)
    t.compact()
    assert(t.read().select("k").as[Int].collect().toSeq == Seq(2))
  }

  test("S56c: TIMESTAMP field through targeted compactBuckets") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("rexp-c"),
      StructType(Seq(StructField("k", IntegerType), StructField("ts", TimestampType))),
      primaryKeys = Seq("k"), options = opts())
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    t.upsert(Seq((1, ts(Now - 2 * Hour))).toDF("k", "ts"))
    t.upsert(Seq((2, ts(Now - 60_000L))).toDF("k", "ts"))
    t.upsert(Seq((3, ts(Now - 3 * Hour))).toDF("k", "ts"))
    assert(t.compactBuckets(trigger = 2).isDefined)
    assert(t.read().select("k").as[Int].collect().sorted.toSeq == Seq(2))
  }

  test("S56d: full-compaction changelog reports the expiry as -D") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("rexp-d"),
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType),
        StructField("ts", LongType))),
      primaryKeys = Seq("k"),
      options = opts("changelog-producer" -> "full-compaction"))
    t.upsert(Seq((1, "a", Now - 60_000L)).toDF("k", "v", "ts"))
    val c1 = t.compact()
    // the row AGES via an update that back-dates its ts past the TTL;
    // the next compaction expires it and the diff against c1 must
    // surface the disappearance as a delete, not silence
    t.upsert(Seq((1, "a", Now - 2 * Hour)).toDF("k", "v", "ts"))
    val c2 = t.compact()
    val diffs = t.readIncrement(c1, c2, changelog = true)
      .select("rowkind", "k").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(diffs == Seq(("-D", 1)), s"expected a -D for the expired key, got $diffs")
    assert(t.read().isEmpty)
  }

  test("S56e: unsupported time-field type fails loudly at compaction") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("rexp-e"),
      StructType(Seq(StructField("k", IntegerType), StructField("ts", StringType))),
      options = opts())
    t.append(Seq((1, "not-a-time")).toDF("k", "ts"))
    val e = intercept[IllegalArgumentException](t.compact())
    assert(e.getMessage.contains("record-level.time-field"))
  }
}
