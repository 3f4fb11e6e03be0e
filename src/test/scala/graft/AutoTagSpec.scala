package graft

import graft.sources.GraftTable
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.1 S59: snapshot watermarks + automatic tag creation (ref:
  * Paimon Snapshot.watermark; CoreOptions tag.automatic-creation /
  * tag.creation-period / tag.creation-delay / tag.num-retained-max).
  * A periodic tag names the UTC period that just completed and pins the
  * first snapshot committed after its end. */
class AutoTagSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", IntegerType), StructField("v", StringType)))

  private val Day = 86400000L
  private val Hour = 3600000L

  test("S59a: watermark is stored and carries forward monotonically") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("wm-mono"), schema)
    def wmOf(id: Long): Option[Long] =
      t.snapshots.find(_.id == id).flatMap(s => Option(s.watermark)).map(_.longValue)

    val s1 = t.append(Seq((1, "a")).toDF("k", "v"), watermark = Some(1000L))
    assert(wmOf(s1) == Some(1000L))
    // watermark-less commit inherits
    val s2 = t.append(Seq((2, "b")).toDF("k", "v"))
    assert(wmOf(s2) == Some(1000L))
    // a REGRESSING watermark is folded away (monotonic max)
    val s3 = t.append(Seq((3, "c")).toDF("k", "v"), watermark = Some(500L))
    assert(wmOf(s3) == Some(1000L))
    // an advancing one lands
    val s4 = t.append(Seq((4, "d")).toDF("k", "v"), watermark = Some(2000L))
    assert(wmOf(s4) == Some(2000L))
    // maintenance rewrites (rebase commit) never reset it
    val s5 = t.compact()
    assert(wmOf(s5) == Some(2000L))
  }

  test("S59b: process-time daily tags — one per completed period, idempotent") {
    val day = java.time.LocalDate.of(2026, 8, 14)
    val dayMs = day.atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    val t = GraftTable.create(spark, TestSpark.tmpDir("autotag-pt"), schema,
      options = Map(
        "tag.automatic-creation" -> "process-time",
        "tag.creation-period" -> "daily",
        "tag.automatic-creation.now-millis" -> (dayMs + Hour).toString))
    val s1 = t.append(Seq((1, "a")).toDF("k", "v"))
    // the period that just completed is YESTERDAY, pinned to this commit
    assert(t.tags.map(tg => (tg.name, tg.snapshotId)) == Seq(("2026-08-13", s1)))
    // same period: no second tag, pin unchanged
    t.append(Seq((2, "b")).toDF("k", "v"))
    assert(t.tags.map(tg => (tg.name, tg.snapshotId)) == Seq(("2026-08-13", s1)))
    // clock crosses midnight: the NEXT commit tags the day that ended
    t.setOptions(Map("tag.automatic-creation.now-millis" -> (dayMs + Day + Hour).toString))
    val s3 = t.append(Seq((3, "c")).toDF("k", "v"))
    assert(t.tags.map(tg => (tg.name, tg.snapshotId)) ==
      Seq(("2026-08-13", s1), ("2026-08-14", s3)))
  }

  test("S59c: watermark-driven tags ignore the wall clock; no watermark = no tag") {
    val day = java.time.LocalDate.of(2001, 1, 2)
    val dayMs = day.atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    val t = GraftTable.create(spark, TestSpark.tmpDir("autotag-wm"), schema,
      options = Map("tag.automatic-creation" -> "watermark"))
    t.append(Seq((1, "a")).toDF("k", "v")) // no watermark ever stamped
    assert(t.tags.isEmpty)
    val s2 = t.append(Seq((2, "b")).toDF("k", "v"), watermark = Some(dayMs + 1))
    assert(t.tags.map(tg => (tg.name, tg.snapshotId)) == Seq(("2001-01-01", s2)))
    // inherited watermark on a later commit must not re-tag or advance
    t.append(Seq((3, "c")).toDF("k", "v"))
    assert(t.tags.map(_.name) == Seq("2001-01-01"))
  }

  test("S59d: hourly period with creation delay") {
    val base = java.time.LocalDate.of(2026, 3, 1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    val t = GraftTable.create(spark, TestSpark.tmpDir("autotag-hr"), schema,
      options = Map(
        "tag.automatic-creation" -> "watermark",
        "tag.creation-period" -> "hourly",
        "tag.creation-delay" -> (10 * 60 * 1000L).toString))
    // 05:05 watermark, 10 min delay: hour 04 is NOT yet taggable
    t.append(Seq((1, "a")).toDF("k", "v"), watermark = Some(base + 5 * Hour + 5 * 60 * 1000L))
    assert(t.tags.map(_.name) == Seq("2026-03-01-03"))
    // 05:15 crosses the delay: hour 04 tags
    val s2 = t.append(Seq((2, "b")).toDF("k", "v"),
      watermark = Some(base + 5 * Hour + 15 * 60 * 1000L))
    assert(t.tags.map(tg => (tg.name, tg.snapshotId)).toSet
      .contains(("2026-03-01-04", s2)))
  }

  test("S59e: tag.num-retained-max reaps oldest AUTO tags, never manual ones") {
    val base = java.time.LocalDate.of(2026, 6, 1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    val t = GraftTable.create(spark, TestSpark.tmpDir("autotag-ret"), schema,
      options = Map(
        "tag.automatic-creation" -> "watermark",
        "tag.num-retained-max" -> "2"))
    t.append(Seq((0, "m")).toDF("k", "v"))
    t.createTag("manual-pin") // a user tag that must survive retention
    (1 to 4).foreach { d =>
      t.append(Seq((d, s"v$d")).toDF("k", "v"), watermark = Some(base + d * Day + 1))
    }
    val names = t.tags.map(_.name)
    assert(names.contains("manual-pin"))
    // 4 auto tags were created (jun 1-4); only the newest 2 remain
    assert(names.filterNot(_ == "manual-pin") == Seq("2026-06-03", "2026-06-04"))
  }

  test("S59f: commit.watermark write option + expiry respects auto-tag pins") {
    val base = java.time.LocalDate.of(2026, 7, 1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    val dir = TestSpark.tmpDir("autotag-v1")
    val t0 = GraftTable.create(spark, dir, schema,
      options = Map("tag.automatic-creation" -> "watermark"))
    Seq((1, "a")).toDF("k", "v").write.format("graft").mode("append")
      .option("commit.watermark", (base + Day + 1).toString).save(dir)
    val t = GraftTable.load(spark, dir)
    assert(t.tags.map(_.name) == Seq("2026-07-01"))
    // the per-write option must NOT have persisted as a table property
    assert(!t.options.contains("commit.watermark"))
    val pinned = t.snapshotForTag("2026-07-01")
    (2 to 5).foreach(i => t0.append(Seq((i, s"v$i")).toDF("k", "v")))
    val expired = t.expireSnapshots(retainLast = 1)
    assert(!expired.contains(pinned), "auto-tagged snapshot must not expire")
    assert(t.read(snapshotId = Some(pinned)).count() == 1)
  }

  test("S59h/T25: streamed micro-batch commits drive automatic tag creation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val day = java.time.LocalDate.of(2026, 2, 10)
    val dayMs = day.atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    val path = TestSpark.tmpDir("autotag-stream")
    val ckpt = TestSpark.tmpDir("autotag-stream-ckpt")
    val t = GraftTable.create(spark, path, schema,
      options = Map(
        "tag.automatic-creation" -> "process-time",
        "tag.automatic-creation.now-millis" -> (dayMs + Hour).toString))
    val mem = MemoryStream[(Int, String)]
    val q = mem.toDF().toDF("k", "v").writeStream
      .format("graft").outputMode("append")
      .option("checkpointLocation", ckpt)
      .start(path)
    try {
      mem.addData((1, "a")); q.processAllAvailable()
      // second batch within the same period: still one tag
      mem.addData((2, "b")); q.processAllAvailable()
    } finally q.stop()
    assert(t.tags.map(_.name) == Seq("2026-02-09"))
    // the pinned tag serves exactly the first batch's state
    assert(t.read(snapshotId = Some(t.snapshotForTag("2026-02-09"))).count() == 1)
  }

  test("S59g: misconfiguration fails the commit loudly, before publish") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("autotag-bad"), schema,
      options = Map("tag.automatic-creation" -> "watermark",
        "tag.creation-period" -> "weekly"))
    intercept[IllegalArgumentException] {
      t.append(Seq((1, "a")).toDF("k", "v"), watermark = Some(1L))
    }
    assert(t.snapshots.isEmpty, "nothing may publish under bad tag config")
  }
}
