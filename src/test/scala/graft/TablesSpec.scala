package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The driver's events.parquet has shipped in two timestamp vintages:
  * TIMESTAMP(NANOS) (read as LongType under nanosAsLong) and
  * TIMESTAMP(MICROS) isAdjustedToUTC=false (read as TimestampNTZType).
  * `Tables.events` must normalize BOTH to TimestampType with identical
  * epoch-micros — the data vintage changed under us once (round 9 →
  * q_sessionize analysis failure); this spec pins both paths.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val epochUs = 1700000000123456L // 2023-11-14 22:13:20.123456 UTC

  test("events with TIMESTAMP_NTZ ts loads as TimestampType, value-identical") {
    val dir = TestSpark.tmpDir("tables-ntz")
    import spark.implicits._
    Seq((1L, 10L, "click"))
      .toDF("event_id", "user_id", "etype")
      .withColumn("ts", timestamp_micros(lit(epochUs)).cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got === epochUs)
  }

  test("events with long-nanos ts loads as TimestampType, truncated to micros") {
    val dir = TestSpark.tmpDir("tables-nanos")
    import spark.implicits._
    // A physical INT64 TIMESTAMP(NANOS) column surfaces as LongType nanos
    // under spark.sql.legacy.parquet.nanosAsLong; a plain LongType column
    // exercises the identical normalizeTs branch.
    Seq((1L, 10L, "click", epochUs * 1000L + 789L))
      .toDF("event_id", "user_id", "etype", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got === epochUs) // sub-µs nanos truncated, matching DuckDB ns→µs
  }

  test("driver testdata events loads to TimestampType at sf0.001") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.limit(1).count() === 1L)
  }
}
