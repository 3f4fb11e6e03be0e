package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.StandardCharsets

/** Mergeable frequent-items summary (Misra–Gries with batched
  * compaction) — the heavy-hitters member of the mergeable-sketch
  * family next to KMV (distinct, L15) and KLL (quantiles, L22): k
  * counters per group cross the shuffle instead of one row per distinct
  * item, which is the 100 TB answer to "top shipmodes / domains / MIME
  * types per group" when the item domain is unbounded.
  *
  * Guarantees (mergeable-summaries MG bound, Agarwal et al. PODS'12):
  * any item with true frequency > n/(k+1) survives; a surviving
  * counter undercounts its true frequency by at most `err`, the
  * cumulative subtracted threshold, itself ≤ n/(k+1) — and both hold
  * under arbitrary merge trees.
  *
  * The map is allowed to grow to 2k entries between compactions: a miss
  * inserts freely, and when 2k is reached ONE O(size) pass subtracts
  * the (k+1)-th largest count and drops non-positive counters (at most
  * k survive, by definition of that threshold) — classic MG's
  * decrement-all-per-miss would be O(k) per row on high-cardinality
  * streams; batching amortizes it to O(1) per add (the KLL level-0
  * trick applied to MG).
  *
  * Exact regime: ≤ 2k distinct items per group never compacts, so
  * counts are exact under ANY merge order/partitioning — the
  * oracle-checkable configuration (q_sketch_topk), like KLL's
  * no-compaction regime and KMV's under-k regime.
  */
final class FreqBuffer(val k: Int) {
  private[functions] val counts = scala.collection.mutable.HashMap.empty[String, Long]
  /** total items added (including through merges) */
  var n: Long = 0L
  /** cumulative subtracted threshold — upper bound on any counter's undercount */
  var err: Long = 0L

  def add(item: String): Unit = { n += 1; inc(item, 1L) }

  private def inc(item: String, w: Long): Unit = {
    counts.updateWith(item) {
      case Some(c) => Some(c + w)
      case None => Some(w)
    }
    if (counts.size > 2 * k) compact()
  }

  /** Subtract the (k+1)-th largest count from every counter and drop
    * the non-positive — deterministic given the counts (no iteration-
    * order dependence: the threshold is order statistics, the subtract
    * is uniform). */
  private def compact(): Unit = {
    val cs = counts.values.toArray
    java.util.Arrays.sort(cs)
    val t = cs(cs.length - (k + 1))
    err += t
    counts.filterInPlace((_, c) => c > t)
    counts.mapValuesInPlace((_, c) => c - t)
  }

  def mergeIn(o: FreqBuffer): Unit = {
    // bulk-add without per-entry compaction (size ≤ 4k transiently),
    // then one compaction if needed
    o.counts.foreach { case (i, c) =>
      counts.updateWith(i) { case Some(x) => Some(x + c); case None => Some(c) }
    }
    n += o.n
    err += o.err
    if (counts.size > 2 * k) compact()
  }

  /** Top-m surviving counters by (count desc, item asc) — the same
    * deterministic tie-break a SQL row_number() oracle uses. */
  def top(m: Int): Seq[(String, Long)] =
    counts.toSeq.sortBy { case (i, c) => (-c, i) }.take(m)

  def serializeBytes(): Array[Byte] = {
    val entries = counts.toArray
    val itemBytes = entries.map(_._1.getBytes(StandardCharsets.UTF_8))
    val sz = 8 + 8 + 4 + 4 + itemBytes.map(b => 4 + b.length + 8).sum
    val bb = java.nio.ByteBuffer.allocate(sz)
    bb.putLong(n); bb.putLong(err); bb.putInt(k); bb.putInt(entries.length)
    var i = 0
    while (i < entries.length) {
      bb.putInt(itemBytes(i).length)
      bb.put(itemBytes(i))
      bb.putLong(entries(i)._2)
      i += 1
    }
    bb.array()
  }
}

object FreqBuffer {
  def deserialize(bytes: Array[Byte]): FreqBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong; val err = bb.getLong
    val buf = new FreqBuffer(bb.getInt)
    val sz = bb.getInt
    var i = 0
    while (i < sz) {
      val bl = bb.getInt
      val ib = new Array[Byte](bl)
      bb.get(ib)
      buf.counts.put(new String(ib, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf.n = n; buf.err = err
    buf
  }
}

/** Grouped frequent items: `freq_items(item, k, topN)` →
  * array<struct<item string, cnt bigint>> of the topN estimated-count
  * items, (count desc, item asc)-ordered. Map-side combinable; ≤ 2k
  * (item, count) pairs per group cross the shuffle. */
case class FreqItems(
    child: Expression,
    k: Int,
    topN: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqBuffer] {

  require(k >= 4, "sketch size k must be at least 4")
  require(topN >= 1, "topN must be at least 1")

  override def children: Seq[Expression] = Seq(child)
  // strict StringType: update() renders the child with toString, which
  // for a date/timestamp child would bucket on INTERNAL representations
  // (epoch-day ints, micros) — require the caller to cast so uncast uses
  // fail analysis instead of silently mis-rendering
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_items requires a STRING item column, got ${child.dataType.sql} — " +
        "cast explicitly so date/timestamp values are rendered, not raw internals")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "freq_items"

  override def createAggregationBuffer(): FreqBuffer = new FreqBuffer(k)

  override def update(buf: FreqBuffer, input: InternalRow): FreqBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString)
    buf
  }

  override def merge(buf: FreqBuffer, other: FreqBuffer): FreqBuffer = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: FreqBuffer): Any =
    new GenericArrayData(buf.top(topN).map { case (item, cnt) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), cnt))
    }.toArray[Any])

  override def serialize(buf: FreqBuffer): Array[Byte] = buf.serializeBytes()

  override def deserialize(bytes: Array[Byte]): FreqBuffer =
    FreqBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItems =
    copy(child = newChildren.head)
}
