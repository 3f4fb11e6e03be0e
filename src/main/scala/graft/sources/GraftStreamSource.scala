package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** V1 streaming Source over the GraftTable snapshot log: each micro-batch
  * is the file-diff between two snapshots — the Spark-native form of the
  * reference format's streaming read (Paimon tables are consumed as
  * snapshot-incremental streams; the Presto connector reads the same
  * snapshots batch-wise via scan_version).
  *
  * Offsets are snapshot ids, so restarts resume exactly at the last
  * committed snapshot — the snapshot log IS the write-ahead log.
  *
  * Usage: spark.readStream.format("graft")
  *   [.option("readChangelog", "true")]  // PK tables: rowkind/commit_seq
  *   [.option("branch", "b")]            // stream a branch ref's commits
  *   .load(path)
  */
class GraftStreamSource(
    spark: SparkSession,
    path: String,
    parameters: Map[String, String]) extends Source {

  // `branch` option (S36): offsets walk the BRANCH ref's snapshot log —
  // main commits are invisible to the stream, exactly like batch reads
  // through forBranch (Paimon streams from branches the same way)
  private val table = {
    val t = GraftTable.load(spark, path)
    parameters.get("branch").map(t.forBranch).getOrElse(t)
  }
  private val changelog = parameters.get("readChangelog").exists(_.toBoolean)

  override def schema: StructType =
    if (changelog && table.primaryKeys.nonEmpty) table.changelogSchema
    else table.schema

  override def getOffset: Option[Offset] =
    table.latestSnapshotId.map(id => LongOffset(id))

  private def toSnapshotId(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong // SerializedOffset after restart
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(toSnapshotId).getOrElse(0L)
    val to = toSnapshotId(end)
    val batch = table.readIncrement(from, to, changelog)
    org.apache.spark.sql.graft.Bridge.asStreaming(batch)
  }

  /** `consumer-id` option (S38): after the engine finalizes a batch,
    * record that every snapshot up to `end` is consumed — expiry then
    * keeps end+1 and later readable for this stream (Paimon consumer-id;
    * the engine's checkpoint remains the source of truth for restarts,
    * the consumer file is the RETENTION signal). */
  override def commit(end: Offset): Unit =
    parameters.get("consumer-id").foreach { id =>
      table.commitConsumer(id, toSnapshotId(end) + 1)
    }

  override def stop(): Unit = ()
}
