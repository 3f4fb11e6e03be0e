package graft.streaming

import graft.sources.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Structured-Streaming integration for GraftTable (SURVEY §2.4).
  *
  * The reference format is a streaming lakehouse: Flink writes Paimon
  * commits, Presto reads snapshots (ref: paimon-presto README — "Paimon
  * is a streaming data lake platform"). Spark-first re-expression:
  * `writeStream.foreachBatch` → one GraftTable snapshot per micro-batch,
  * so readers get the same commit-isolation the reference's snapshots
  * give, and `auditLog` is the CDC stream equivalent.
  */
object GraftStreaming {

  /** Append every micro-batch as one atomic snapshot commit. Exactly-once
    * at the table level comes from the snapshot rename: a replayed batch
    * would produce a new snapshot, and dedup-by-PK absorbs replays for PK
    * tables (the same at-least-once + idempotent-merge contract Paimon
    * gives its writers). */
  def appendStream(stream: DataFrame, table: GraftTable): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) { table.append(batch); () }
      }

  /** T28: streamed quality-classifier training — each labeled micro-batch
    * ((text, label)) reduces to per-slot hashed-BoW weight DELTAS and
    * upserts them into an aggregation-merge-engine weights table
    * (`fields.weight.aggregate-function = sum`): the MOR fold IS the
    * incremental trainer, because the L74 label-difference weights are
    * plain sums and sums merge exactly under any batch split — no
    * read-modify-write, no driver state, O(batch) work per trigger.
    * Score with [[graft.functions.HashExpr.hashedScoreWeights]] over the
    * table read back (absent slots weigh 0). */
  def classifierStream(
      labeled: DataFrame, weights: GraftTable, buckets: Int = 64): DataStreamWriter[Row] =
    labeled.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val delta = batch
            .select(explode(graft.functions.Text.words(col("text"))).as("__w"),
              when(col("label"), 1L).otherwise(-1L).as("__y"))
            .select(pmod(graft.functions.HashExpr.polyHash(col("__w")),
              lit(buckets.toLong)).as("slot"), col("__y"))
            .groupBy("slot").agg(sum("__y").as("weight"))
          weights.upsert(delta)
          ()
        }
      }

  /** Upsert variant: micro-batches merge by primary key. */
  def upsertStream(stream: DataFrame, table: GraftTable): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) { table.upsert(batch); () }
      }

  /** Watermarked tumbling-window aggregation over an event stream —
    * the standard streaming-OLAP shape the reference's tables feed. */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      watermark: String,
      windowLen: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"), col("n"), col("v"))

  /** Streaming gap-sessionization (T14): the streaming face of the batch
    * sessionize operator (R25) via Spark's native session_window — state
    * per key is ONE open session (merged as events arrive, emitted once
    * the watermark passes the gap), not the key's event history; the
    * window-merge machinery is the engine's, not reimplemented. */
  def sessionCounts(
      events: DataFrame, keyCol: String, tsCol: String,
      watermark: String, gap: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol),
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("n"))

  /** Stream-stream interval join (T13): correlate two live streams on a
    * key within an event-time window — the attribution shape (impression
    * joined to the click that followed it within `withinSeconds`).
    * Spark-first: the built-in watermarked stream-stream join keeps each
    * side's rows in the state store ONLY until the watermark passes the
    * interval bound, so state is bounded by (rate × (delay + within)),
    * never by stream length — the 100 TB-day ingestion contract. Both
    * sides MUST carry distinct column names apart from `key` (the join
    * output concatenates them). Inner-join semantics: a match emits as
    * soon as both rows have arrived; no-match rows simply never emit
    * (left-outer would additionally wait for watermark expiry). */
  def intervalJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      delay: String, withinSeconds: Long): DataFrame = {
    val l = left.withWatermark(leftTs, delay).alias("l")
    val r = right.withWatermark(rightTs, delay).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $withinSeconds seconds"))
      .drop(col(s"r.$key"))
  }

  /** Stream-stream LEFT OUTER interval join (T29): the attribution shape
    * that also reports the NON-converting impressions — every left row
    * either matches a right row inside the interval or emits once with
    * NULL right columns after the watermark proves no match can still
    * arrive (left state for a row is releasable at
    * `leftTs + withinSeconds + delay`; the engine emits the null-padded
    * row when it evicts — correct AND state-bounded, same
    * (rate × horizon) contract as the inner form). Unmatched RIGHT rows
    * drop (left-outer), so the output keys are exactly the left stream's.
    * Same column-name contract as intervalJoin. */
  def intervalJoinOuter(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      delay: String, withinSeconds: Long): DataFrame = {
    val l = left.withWatermark(leftTs, delay).alias("l")
    val r = right.withWatermark(rightTs, delay).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $withinSeconds seconds"),
      "leftOuter")
      .drop(col(s"r.$key"))
  }

  /** Incremental changelog read between two snapshots: every row version
    * committed after `fromSnapshot`, with rowkind — batch-incremental CDC
    * (the `$audit_log` + snapshot-diff pattern). */
  def changelog(table: GraftTable, fromSnapshot: Long): DataFrame = {
    val log = table.auditLog()
    log.filter(col("commit_seq") > fromSnapshot)
  }

  /** Changelog-driven incremental aggregate maintenance (T19): keep an
    * exact per-group SUM + live-row COUNT from a `readChangelog`
    * stream — the materialized-view upkeep shape (a downstream
    * aggregate table stays correct under UPDATEs and DELETEs without
    * reprocessing the base table). Retract-stream algebra: +I/+U
    * contribute +value, their -U pre-images and -D deletes contribute
    * −value, so the running signed sums ARE the aggregate of the
    * table's current state after every batch. Spark-first: a plain
    * streaming groupBy carries the per-group sums in the state store
    * (incremental, checkpointed); state is group-cardinality-bounded —
    * the aggregate table's own size, the minimum any view needs. */
  def aggregateChangelog(
      changelog: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val sgn = when(col("rowkind").isin("+I", "+U"), 1L).otherwise(-1L)
    changelog
      .withColumn("__sgn", sgn)
      .groupBy(col(groupCol))
      .agg(
        sum(col(valCol) * col("__sgn")).as("total"),
        sum(col("__sgn")).as("live_rows"))
  }

  /** Streaming exact dedup of a document stream by fingerprint — the
    * ingestion-time half of the batch dedup suite (L1): a document whose
    * key appeared in ANY earlier micro-batch is dropped before it ever
    * lands in the table. Spark-first: the built-in streaming
    * dropDuplicates carries the seen-key set in the state store
    * (incremental across micro-batches, checkpointed, exactly-once when
    * composed with the graft sink's idempotent batch commits). State
    * grows with distinct keys — use the watermarked variant at scale. */
  def dedupStream(docs: DataFrame, keyCols: Seq[String]): DataFrame =
    docs.dropDuplicates(keyCols)

  /** Watermarked variant: duplicate keys are only suppressed within the
    * event-time watermark horizon, which lets the state store EVICT keys
    * older than `delay` — bounded state, the 100 TB ingestion shape
    * (near-dup re-crawls arrive close in time; a year-old repeat is
    * cheaper to drop in the batch dedup pass). */
  def dedupStreamWatermarked(
      docs: DataFrame, keyCols: Seq[String], tsCol: String, delay: String): DataFrame =
    docs.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keyCols)

  /** CDC replication: apply a `readChangelog` stream onto a second PK
    * table — the changelog-consumer half of the lakehouse CDC contract
    * (Paimon's CDC sinks replay +I/+U as upserts and -D as deletes;
    * -U pre-images are informational and skipped). A micro-batch can
    * span several SOURCE commits whose effects do not commute (upsert
    * then delete of one key vs delete then upsert), so the batch is
    * applied per commit_seq in order — one replica snapshot per source
    * commit, preserving per-commit atomicity on the replica. The
    * commit_seq list per batch is bounded by commits-per-batch (driver
    * scalars, never data). Replays after restart are absorbed by the
    * PK merge (idempotent upserts, sequence field = source commit). */
  /** T23: CDC RELAY — land a changelog stream VERBATIM into a
    * `changelog-producer=input` table through writeCdc, one target
    * commit per source commit (ordering and per-commit atomicity
    * preserved, commit_seq recorded as the commitIdentifier). Unlike
    * replicateStream (which MATERIALIZES the changelog into table
    * state), the relay keeps the rowkinds first-class: a downstream
    * changelog reader of the target sees the SAME +I/-U/+U/-D stream
    * the source emitted — the multi-hop CDC pipeline shape. Commit ids
    * per batch are bounded by commits-per-batch (driver scalars). */
  def relayCdcStream(changelog: DataFrame, target: GraftTable): DataStreamWriter[Row] =
    changelog.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try {
          val commits = batch.select("commit_seq").distinct()
            .collect().map(_.getLong(0)).sorted
          commits.foreach { cs =>
            target.writeCdc(
              batch.filter(col("commit_seq") === cs).drop("commit_seq"),
              commitIdentifier = Some(cs))
          }
        } finally batch.unpersist()
      }

  def replicateStream(changelog: DataFrame, target: GraftTable): DataStreamWriter[Row] =
    changelog.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // persist: every action below (isEmpty probes, the commit_seq
        // collect, each per-commit upsert/delete) would otherwise
        // re-execute the incremental read and re-scan the source parquet
        // — ~2+4C scans for a batch spanning C commits
        batch.persist()
        try {
          if (!batch.isEmpty) {
            // Within one commit_seq, upserts are applied before deletes —
            // correct ONLY while a single source commit never carries
            // both an upsert and a delete of the SAME key (true today:
            // each commit is one upsert() or delete() call, and those
            // dedupe per key). If that invariant ever broke, a
            // delete-then-reinsert commit would replicate as deleted —
            // so assert it loudly instead of relying on it silently.
            // One aggregate over the (persisted) batch, grouped on
            // (commit_seq, pk): a key with BOTH kind classes in one
            // commit is a contract violation.
            val keyCols = col("commit_seq") +: target.primaryKeys.map(col)
            val kindClass = when(col("rowkind") === "-D", lit("D")).otherwise(lit("U"))
            val conflicted = batch.filter(col("rowkind").isin("+I", "+U", "-D"))
              .groupBy(keyCols: _*)
              .agg(countDistinct(kindClass).as("kinds"))
              .filter(col("kinds") > 1)
              .count()
            require(conflicted == 0,
              s"replicateStream: $conflicted key(s) carry both an upsert and a " +
                "delete within one source commit — per-commit kind-ordered " +
                "application cannot represent that; the changelog producer " +
                "broke the one-change-per-key-per-commit contract")
            val seqs = batch.select("commit_seq").distinct()
              .collect().map(_.getLong(0)).sorted
            seqs.foreach { sq =>
              val commit = batch.filter(col("commit_seq") === sq)
              val ups = commit.filter(col("rowkind").isin("+I", "+U"))
                .drop("rowkind", "commit_seq")
              val dels = commit.filter(col("rowkind") === "-D")
                .drop("rowkind", "commit_seq")
              if (!ups.isEmpty) { target.upsert(ups); () }
              if (!dels.isEmpty) { target.delete(dels); () }
            }
          }
        } finally { batch.unpersist(); () }
      }

  /** T30: continuous replication-validation checksums — the STREAMING
    * face of the R67 order-independent checksum. A changelog stream
    * maintains a LIVE per-group content checksum in an
    * aggregation-merge-engine table (PK = group; `cksum` folds with
    * `bit_xor`, `n` with `sum`), so "does the replica still equal the
    * source?" is a bounded read of the checksum table instead of a
    * 100 TB sort-and-compare. The algebra that makes deletes work with
    * INSERT rows alone: XOR is self-inverse, so re-applying a row's
    * hash RETRACTS it — +I/+U contribute (hash, +1), -U/-D contribute
    * (hash, -1), and unlike replicateStream the -U pre-image is
    * ESSENTIAL (it retracts the pre-update rendering that +U's
    * post-image replaces). Each micro-batch pre-folds to ONE delta row
    * per touched group (bit_xor of hashes, sum of signs) before the
    * upsert — shuffled state is group-bounded, never batch-row-bounded,
    * and the merge engine folds deltas across batches associatively. A
    * group whose rows are all deleted converges to (cksum=0, n=0) — the
    * reader face filters n != 0. Validation = compare the table against
    * [[rowChecksum]] re-aggregated over the current source/replica
    * state; equality is an equality WITNESS under any partitioning and
    * any arrival order (the R67 argument, live). */
  def checksumStream(
      changelog: DataFrame,
      target: GraftTable,
      grpCol: String,
      renderCols: Seq[String]): DataStreamWriter[Row] =
    changelog.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sign = when(col("rowkind").isin("+I", "+U"), lit(1L)).otherwise(lit(-1L))
        // persisted: the empty-probe (which must NOT mint an empty
        // snapshot per idle micro-batch) and the upsert share one
        // computation of the hash+fold pipeline instead of two — the
        // same multi-action discipline as replicateStream above
        val delta = batch
          .filter(col("rowkind").isin("+I", "+U", "-U", "-D"))
          .select(col(grpCol), rowChecksum(renderCols).as("cksum"), sign.as("n"))
          .groupBy(grpCol)
          .agg(expr("bit_xor(cksum)").as("cksum"), sum("n").as("n"))
          .persist()
        try { if (!delta.isEmpty) { target.upsert(delta); () } }
        finally { delta.unpersist(); () }
      }

  /** The canonical row hash both the maintenance stream and the
    * validation recompute share: '|'-joined rendered columns → md5 →
    * first 15 hex digits (60 bits, inside BIGINT) — the R67 rendering,
    * so a batch recompute with DuckDB's md5 is bit-identical too.
    *
    * CONTRACT (render columns): the rendering is injective only for
    * NON-NULL values with no '|' in their string form. `concat_ws`
    * SKIPS null columns — ('a', NULL) and (NULL, 'a') render
    * identically — and an embedded separator makes ('a|b') collide with
    * ('a','b'). Callers with nullable or free-text render columns must
    * pre-render each through `coalesce(c, sentinel)` and escape the
    * separator; the library keeps the raw rendering because it is the
    * one DuckDB's `md5(concat_ws(...))` reproduces bit-identically. */
  def rowChecksum(renderCols: Seq[String]): org.apache.spark.sql.Column =
    // r19: fused md5→60-bit expression — identical value to the previous
    // CAST(conv(substr(md5(...),1,15),16,10) AS BIGINT) form, one digest
    // pass per row (no 32-char hex render, no base-16 string parse)
    graft.functions.BitsExpr.md5Bits60(
      expr(s"concat_ws('|', ${renderCols.mkString(", ")})"))

  /** Streaming grouped approx-distinct: the KMV sketch as
    * mapGroupsWithState STATE — the mergeable-summary property (SURVEY
    * L15) is exactly what makes unbounded-stream aggregation bounded:
    * per group the state store holds ≤ k longs FOREVER, regardless of
    * stream length or key cardinality, where exact streaming
    * COUNT(DISTINCT) state grows with distinct keys. Emits the updated
    * (group, estimate) per group per micro-batch (update mode). Input:
    * a group column and a pre-hashed 64-bit value column (xxhash64
    * upstream, like the batch aggregate). */
  def approxDistinctStream(
      events: DataFrame, groupCol: String, hashCol: String, k: Int = 256): org.apache.spark.sql.Dataset[(String, Long)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events
      .select(col(groupCol).cast("string"), col(hashCol).cast("long"))
      // a null hash would fail the non-nullable tuple encoder and
      // crash-loop the query from its checkpoint; the batch KMV
      // aggregate skips nulls — match it
      .filter(col(groupCol).isNotNull && col(hashCol).isNotNull)
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Long], (String, Long)](GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Long)], state: org.apache.spark.sql.streaming.GroupState[Array[Long]]) =>
          val buf = new graft.functions.KmvBuffer(k)
          state.getOption.foreach(_.foreach(buf.add))
          rows.foreach(r => buf.add(r._2))
          val mins = new Array[Long](buf.set.size)
          val it = buf.set.iterator()
          var i = 0
          while (it.hasNext) { mins(i) = it.next(); i += 1 }
          state.update(mins)
          (g, buf.estimate)
      }
  }

  /** Streaming grouped frequent items (T10): the Misra–Gries sketch
    * (SURVEY L23) as mapGroupsWithState STATE — the heavy-hitters
    * sibling of T9's KMV state. Per group the state store holds ≤ 2k
    * (item, count) pairs FOREVER regardless of stream length or item
    * cardinality (exact streaming top-N state grows with distinct
    * items); the MG survival/undercount bounds hold across micro-batch
    * merges because batch-increments are just more adds. Emits the
    * current top-N per group per micro-batch (update mode) rendered as
    * a "item:cnt,…" string. */
  def freqItemsStream(
      events: DataFrame, groupCol: String, itemCol: String,
      k: Int = 64, topN: Int = 5): org.apache.spark.sql.Dataset[(String, String)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events
      .select(col(groupCol).cast("string"), col(itemCol).cast("string"))
      // nulls would fail the non-nullable tuple encoder (see T9); the
      // batch aggregate skips null items — match it
      .filter(col(groupCol).isNotNull && col(itemCol).isNotNull)
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Byte], (String, String)](GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, String)],
         state: org.apache.spark.sql.streaming.GroupState[Array[Byte]]) =>
          val buf = state.getOption
            .map(graft.functions.FreqBuffer.deserialize)
            .getOrElse(new graft.functions.FreqBuffer(k))
          rows.foreach(r => buf.add(r._2))
          state.update(buf.serializeBytes())
          (g, buf.top(topN).map { case (i, c) => s"$i:$c" }.mkString(","))
      }
  }

  /** Streaming grouped quantiles (T11): the KLL sketch (SURVEY L22) as
    * mapGroupsWithState STATE — completes the streaming mergeable-
    * sketch trio (T9 KMV distinct, T10 MG heavy hitters). Per group the
    * state store holds O(k log(n/k)) doubles regardless of stream
    * length (exact streaming percentile state grows with every value);
    * micro-batch increments are just more adds, so the deterministic-
    * compaction error bound carries across batches. Emits (group, p50,
    * p95, count) per group per micro-batch (update mode). */
  def quantileStream(
      events: DataFrame, groupCol: String, valCol: String,
      k: Int = 256): org.apache.spark.sql.Dataset[(String, Double, Double, Long)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events
      .select(col(groupCol).cast("string"), col(valCol).cast("double"))
      .filter(col(groupCol).isNotNull && col(valCol).isNotNull)
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Byte], (String, Double, Double, Long)](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Double)],
         state: org.apache.spark.sql.streaming.GroupState[Array[Byte]]) =>
          val buf = state.getOption
            .map(graft.functions.QuantileBuffer.deserialize)
            .getOrElse(new graft.functions.QuantileBuffer(k))
          rows.foreach(r => buf.add(r._2))
          state.update(buf.serializeBytes())
          (g, buf.quantile(0.5), buf.quantile(0.95), buf.count)
      }
  }

  /** Streaming per-key quota / bounded top-N selection (T12): the
    * MinNSummary buffer (SURVEY L28) as mapGroupsWithState STATE — the
    * SELECTION member of the bounded-state family (T9 KMV distinct, T10
    * MG frequent items, T11 KLL quantiles). Per group the state store
    * holds ≤ n (ord, id) pairs FOREVER regardless of stream length: the
    * n smallest (ord, id) seen so far, which selection-by-total-order
    * makes EXACT under any batch arrival order (each batch's adds are
    * just more merge steps — the same argument that makes the batch
    * aggregate partitioning-independent). A streaming row_number over
    * the whole history would need every row of every key in state.
    * Emits (group, kept_count, kept ids rendered "id,id,…" in ord
    * order) per group per micro-batch (update mode). */
  def minNStream(
      events: DataFrame, groupCol: String, ordCol: String, idCol: String,
      n: Int = 5): org.apache.spark.sql.Dataset[(String, Long, String)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events
      .select(col(groupCol).cast("string"), col(ordCol).cast("long"), col(idCol).cast("long"))
      // nulls cannot be ranked and would fail the non-nullable tuple
      // encoder (see T9); the batch aggregate skips them — match it
      .filter(col(groupCol).isNotNull && col(ordCol).isNotNull && col(idCol).isNotNull)
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Byte], (String, Long, String)](GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[Array[Byte]]) =>
          val buf = state.getOption
            .map(graft.functions.MinNBuffer.deserialize)
            .getOrElse(new graft.functions.MinNBuffer(n))
          rows.foreach(r => buf.add(r._2, r._3, 0L))
          state.update(buf.serializeBytes())
          val ids = new Array[Long](buf.size)
          var j = 0
          while (j < buf.size) { ids(j) = buf.id(j); j += 1 }
          (g, buf.size.toLong, ids.mkString(","))
      }
  }

  /** Custom-state streaming: per-user session tracking with
    * flatMapGroupsWithState. Emits one row per CLOSED session (gap >
    * `gapSeconds`, or the processing-time state timeout for users that go
    * silent — which also evicts their state). Late events (older than the
    * open session's last timestamp) are folded in by widening the session
    * bounds, never by moving them backwards. Open sessions live in the
    * state store, so the operator is incremental across micro-batches —
    * the stateful-processing shape the built-in windowed aggregates can't
    * express (sessions have data-dependent, unaligned boundaries). */
  def sessionTracker(
      events: org.apache.spark.sql.Dataset[UserEvent],
      gapSeconds: Long,
      // None disables the idle timeout. Production should set it (evicts
      // state for silent users); note that with a timeout the engine
      // schedules no-data micro-batches to fire timers, so test harnesses
      // relying on processAllAvailable quiescence must pass None.
      idleTimeout: Option[String] = Some("30 minutes")): org.apache.spark.sql.Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, timeoutConf) {
        (user: Long, batch: Iterator[UserEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // user went silent: close and evict their open session
            val cur = state.get
            state.remove()
            Iterator.single(ClosedSession(user, cur.start_us, cur.last_us, cur.n))
          } else {
            var cur = state.getOption.orNull
            val closed = scala.collection.mutable.ArrayBuffer[ClosedSession]()
            batch.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
              if (cur == null) cur = SessionState(e.ts_us, e.ts_us, 1)
              else if (e.ts_us - cur.last_us > gapSeconds * 1000000L) {
                closed += ClosedSession(user, cur.start_us, cur.last_us, cur.n)
                cur = SessionState(e.ts_us, e.ts_us, 1)
              } else cur = cur.copy(
                start_us = math.min(cur.start_us, e.ts_us),
                last_us = math.max(cur.last_us, e.ts_us),
                n = cur.n + 1)
            }
            if (cur != null) {
              state.update(cur)
              idleTimeout.foreach(state.setTimeoutDuration)
            }
            closed.iterator
          }
      }
  }
}

final case class UserEvent(user_id: Long, ts_us: Long, event_id: Long)
final case class SessionState(start_us: Long, last_us: Long, n: Int)
final case class ClosedSession(user_id: Long, start_us: Long, end_us: Long, n_events: Int)
