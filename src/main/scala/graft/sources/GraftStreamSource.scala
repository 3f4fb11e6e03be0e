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
    parameters: Map[String, String])
  extends Source
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

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

  // T16: admission control — `maxSnapshotsPerTrigger` caps how many
  // snapshots one micro-batch may drain. The 100 TB shape: a stream
  // started against a table with months of history must NOT plan its
  // entire backlog as micro-batch 0 (one giant batch = one giant
  // shuffle + no progress checkpoints); with the cap, the backlog
  // drains as a sequence of bounded, individually-checkpointed batches.
  // Implemented the FileStreamSource way: a V1 Source that ALSO
  // implements SupportsAdmissionControl — the engine then negotiates
  // each batch end through latestOffset(start, limit) (so the start is
  // always the checkpointed end, restarts included — no offset
  // regression by construction) — and SupportsTriggerAvailableNow, so
  // Trigger.AvailableNow drains the whole available-at-prepare backlog
  // in capped batches instead of falling back to one giant batch.
  private val maxSnapshots: Option[Long] =
    parameters.get("maxSnapshotsPerTrigger").map(_.toLong).filter(_ > 0)

  /** Set by prepareForTriggerAvailableNow: AvailableNow must consume
    * exactly what existed at query start and then terminate — commits
    * racing in DURING the drain stay for the next run. */
  private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(table.latestSnapshotId.getOrElse(0L))

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val latest0 = table.latestSnapshotId.getOrElse(0L)
    val latest = availableNowTarget.fold(latest0)(math.min(latest0, _))
    val base = Option(start).map(snapId).getOrElse(0L)
    val end = maxSnapshots.fold(latest)(k => math.min(latest, base + k))
    if (end > base) LongOffset(end) else null
  }

  // the legacy getOffset path is still consulted when the engine treats
  // this as a plain V1 source (it prefers the admission-control path);
  // it reports the uncapped tip
  override def getOffset: Option[Offset] =
    table.latestSnapshotId.map(id => LongOffset(id))

  private def snapId(o: org.apache.spark.sql.connector.read.streaming.Offset): Long =
    o match {
      case LongOffset(v) => v
      case other => other.json.trim.toLong // SerializedOffset after restart
    }

  private def toSnapshotId(o: Offset): Long = snapId(o)

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

/** T18: V1 streaming Sink — `writeStream.format("graft").start(path)`
  * commits each micro-batch as ONE snapshot, stamped with the batch id.
  *
  * Exactly-once at the table level: the engine's checkpoint can replay
  * the last batch after a crash between the offset-log write and the
  * commit-log write; a replayed batch's id already appears as a
  * snapshot `(commitUser = sinkId, commitIdentifier = batchId)`, so
  * addBatch skips it — the idempotent-writer half of the Paimon
  * contract (commit identifiers exist for exactly this). Batch ids are
  * scoped to a CHECKPOINT, so the default sinkId derives from the
  * query's checkpointLocation (stable across restarts of the same
  * query, distinct across queries — a static default would let query
  * B's batch 0 alias query A's and drop data); `sinkId` overrides it.
  * PK tables additionally absorb replays by key; the `branch` option
  * routes commits onto a branch ref (S36).
  */
class GraftSink(
    spark: SparkSession,
    path: String,
    parameters: Map[String, String],
    outputMode: org.apache.spark.sql.streaming.OutputMode,
    partitionColumns: Seq[String] = Seq.empty)
  extends org.apache.spark.sql.execution.streaming.Sink {

  require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append() ||
    outputMode == org.apache.spark.sql.streaming.OutputMode.Update(),
    s"graft sink supports Append/Update output modes (got $outputMode) — " +
      "Complete mode would rewrite the table every batch")

  private val sinkId = parameters.get("sinkId")
    .orElse(parameters.get("checkpointLocation")
      // String.hashCode is specified and stable across JVMs
      .map(p => "sink-" + java.lang.Integer.toHexString(p.hashCode)))
    .getOrElse("stream-sink")

  /** Table handle cached for the sink's lifetime: reloading per batch
    * would re-parse the whole snapshot log every micro-batch (the
    * instance's snapshot cache amortizes the replay check instead). */
  private var cached: Option[GraftTable] = None
  /** Highest batch id committed by THIS instance — batch ids are
    * monotonic within a run, so only the first addBatch after a
    * (re)start can be a replay and needs the log scan. */
  private var lastBatch: Option[Long] = None

  private def table: GraftTable = cached.getOrElse {
    require(GraftTable.exists(spark, path),
      s"graft sink requires an existing table at $path (create it first — " +
        "a sink must not guess partitioning/keys from the first batch)")
    val t0 = GraftTable.load(spark, path)
    val t = parameters.get("branch").map(t0.forBranch).getOrElse(t0)
    require(partitionColumns.isEmpty || partitionColumns == t.partitionKeys,
      s"partitionBy(${partitionColumns.mkString(",")}) does not match the " +
        s"table's partition keys (${t.partitionKeys.mkString(",")}) — the sink " +
        "writes under the table's own layout and must not silently ignore a spec")
    cached = Some(t)
    t
  }

  override def addBatch(batchId: Long, data: org.apache.spark.sql.DataFrame): Unit = {
    val t = table
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append() ||
      t.primaryKeys.nonEmpty,
      "Update output mode needs a primary-key table (append would accumulate " +
        "stale per-key emissions instead of folding them)")
    val replayed = !lastBatch.exists(batchId > _) &&
      t.snapshots.exists(s => s.commitUser == sinkId && s.commitIdentifier == batchId)
    if (!replayed) {
      val batch = org.apache.spark.sql.graft.Bridge.asBatch(data)
      t.append(batch, commitUser = sinkId, commitIdentifier = Some(batchId))
    }
    lastBatch = Some(lastBatch.fold(batchId)(math.max(_, batchId)))
    ()
  }
}
