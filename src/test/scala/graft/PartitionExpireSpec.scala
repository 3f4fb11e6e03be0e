package graft

import graft.sources.GraftTable
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.1 S63: automatic partition expiration (ref: Paimon
  * partition.expiration-time / partition.timestamp-formatter) — aged
  * partitions leave as a side effect of writing, in one follow-up
  * metadata OVERWRITE commit. */
class PartitionExpireSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("dt", StringType), StructField("v", IntegerType)))

  private val Day = 86400000L
  private def dayMs(d: String): Long = java.time.LocalDate.parse(d)
    .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli

  test("S63a: aged partitions drop on the next commit; time travel keeps them") {
    val now = dayMs("2026-08-14")
    val t = GraftTable.create(spark, TestSpark.tmpDir("pexp-basic"), schema,
      partitionKeys = Seq("dt"),
      options = Map(
        "partition.expiration-time" -> (3 * Day).toString,
        "partition.expiration.now-millis" -> now.toString))
    val s1 = t.append(Seq(
      ("2026-08-01", 1), ("2026-08-12", 2), ("2026-08-13", 3)).toDF("dt", "v"))
    // the append published, THEN the expiry swept 08-01 (> 3 days old)
    val latest = t.latestSnapshotId.get
    assert(latest == s1 + 1, "expiry lands as one follow-up commit")
    assert(t.read().collect().map(_.getString(0)).sorted.toSeq ==
      Seq("2026-08-12", "2026-08-13"))
    // the swept state is still time-travelable (no purge)
    assert(t.read(snapshotId = Some(s1)).count() == 3)
    // nothing aged left: the next commit publishes exactly one snapshot
    t.append(Seq(("2026-08-14", 4)).toDF("dt", "v"))
    assert(t.latestSnapshotId.get == latest + 1)
  }

  test("S63b: unparseable partition values are retained, never dropped") {
    val now = dayMs("2026-08-14")
    val t = GraftTable.create(spark, TestSpark.tmpDir("pexp-mixed"), schema,
      partitionKeys = Seq("dt"),
      options = Map(
        "partition.expiration-time" -> Day.toString,
        "partition.expiration.now-millis" -> now.toString))
    t.append(Seq(("2026-01-01", 1), ("legacy-backfill", 2), ("2026-08-14", 3))
      .toDF("dt", "v"))
    assert(t.read().collect().map(_.getString(0)).sorted.toSeq ==
      Seq("2026-08-14", "legacy-backfill"))
  }

  test("S63c: misconfiguration fails the commit loudly, before publish") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("pexp-bad"), schema,
      partitionKeys = Seq("dt"), primaryKeys = Seq("v"),
      options = Map("partition.expiration-time" -> Day.toString))
    // partition key dt is NOT in the primary key — the S46 soundness rule
    intercept[IllegalArgumentException] {
      t.append(Seq(("2026-08-14", 1)).toDF("dt", "v"))
    }
    assert(t.snapshots.isEmpty)
  }

  test("S63d: datetime formatter + expiration-key selection") {
    val now = dayMs("2026-08-14")
    val sch = StructType(Seq(
      StructField("region", StringType), StructField("hr", StringType),
      StructField("v", IntegerType)))
    val t = GraftTable.create(spark, TestSpark.tmpDir("pexp-hr"), sch,
      partitionKeys = Seq("region", "hr"),
      options = Map(
        "partition.expiration-time" -> (6 * 3600000L).toString,
        "partition.expiration-key" -> "hr",
        "partition.timestamp-formatter" -> "yyyy-MM-dd-HH",
        "partition.expiration.now-millis" -> (now + 12 * 3600000L).toString))
    t.append(Seq(
      ("eu", "2026-08-14-01", 1), // 11h old: aged
      ("eu", "2026-08-14-09", 2), // 3h old: kept
      ("us", "2026-08-14-01", 3)) // aged in the other region too
      .toDF("region", "hr", "v"))
    assert(t.read().collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq ==
      Seq(("eu", "2026-08-14-09")))
  }
}
