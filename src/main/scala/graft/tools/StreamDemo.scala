package graft.tools

import graft.sources.GraftTable
import graft.streaming.GraftStreaming
import graft.operators.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Example/driver: stream the events table into a PK GraftTable in 3
  * rate-limited micro-batches, then read back the merged state, the
  * changelog, and a multimodal feature extraction. Run:
  *   sbt "runMain graft.tools.StreamDemo /root/testdata/sf0.001"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = graft.Tables.events(spark, sfDir)
      .select("user_id", "event_id", "event_type", "value", "ts")
    val root = java.nio.file.Files.createTempDirectory("graft-streamdemo").toString
    val t = GraftTable.create(spark, s"$root/events_pk", ev.schema,
      primaryKeys = Seq("user_id"),
      options = Map("sequence.field" -> "ts,event_id"))

    // micro-batches via a file-backed stream: re-write events as 3 chunks
    val chunks = s"$root/chunks"
    ev.withColumn("part", pmod(col("event_id"), lit(3)))
      .write.partitionBy("part").parquet(chunks)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$chunks/part=0")
    val q = GraftStreaming.upsertStream(stream, t).start()
    q.processAllAvailable(); q.stop()
    // then batch-upsert the rest
    t.upsert(spark.read.parquet(s"$chunks/part=1").select(ev.columns.map(col).toSeq: _*))
    t.upsert(spark.read.parquet(s"$chunks/part=2").select(ev.columns.map(col).toSeq: _*))

    println(s"snapshots committed: ${t.snapshots.map(s => s"${s.id}:${s.commitKind}").mkString(", ")}")
    println(s"merged rows (latest per user): ${t.read().count()}")
    println(s"changelog rows after snapshot 1: ${GraftStreaming.changelog(t, 1L).count()}")
    t.system("snapshots").show(5, truncate = false)

    // streaming READ back out of the table (V1 Source over the snapshot log)
    val sq = spark.readStream.format("graft").option("readChangelog", "true")
      .load(s"$root/events_pk")
      .writeStream.outputMode("append").format("memory").queryName("cdc_out").start()
    sq.processAllAvailable()
    t.upsert(spark.read.parquet(s"$chunks/part=2").select(ev.columns.map(col).toSeq: _*))
    sq.processAllAvailable(); sq.stop()
    println(s"cdc stream rows: ${spark.sql("SELECT count(*) FROM cdc_out").first().getLong(0)}" +
      s" across ${spark.sql("SELECT count(DISTINCT commit_seq) FROM cdc_out").first().getLong(0)} commits")

    val media = Multimodal.mediaFromDocuments(spark, graft.Tables.documents(spark, sfDir))
    val feats = Multimodal.extractFeatures(spark, media)
    println(s"media features: ${feats.count()} rows, dim=${feats.selectExpr("size(feature)").first().getInt(0)}")
    Multimodal.sampleFrames(media, 64, 2).select("media_id", "n_sampled").show(3)
    spark.stop()
  }
}
