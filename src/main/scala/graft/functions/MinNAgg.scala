package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Bounded "n smallest by (ord, id)" summary — the two-stage answer to
  * per-key top-N selection on HOT keys (SURVEY L28): a sort-based
  * row_number window must co-locate and sort every row of a key in one
  * task, while this aggregate is map-side combinable with ≤ n entries
  * per key per partition crossing the shuffle — the same bounded-state
  * idiom as KMV/KLL/MG. Keeps (ord, id, payload) triples of the n
  * smallest (ord, id); emits struct(kept, payload_sum).
  *
  * Exactness: selection by a TOTAL order (ord, id) is merge-order
  * independent — any merge tree of per-partition n-smallest sets
  * contains the global n smallest — so results are bit-identical to the
  * window formulation under any partitioning (MinNSpec proves both).
  */
final class MinNBuffer(val n: Int) {
  var size = 0
  val ord = new Array[Long](n)
  val id = new Array[Long](n)
  val pay = new Array[Long](n)

  @inline private def less(o1: Long, i1: Long, o2: Long, i2: Long): Boolean =
    o1 < o2 || (o1 == o2 && i1 < i2)

  def add(o: Long, i: Long, p: Long): Unit = {
    if (size == n && !less(o, i, ord(size - 1), id(size - 1))) return
    var lo = 0; var hi = size
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (less(ord(m), id(m), o, i)) lo = m + 1 else hi = m
    }
    val pos = lo
    var j = math.min(size, n - 1)
    while (j > pos) { ord(j) = ord(j - 1); id(j) = id(j - 1); pay(j) = pay(j - 1); j -= 1 }
    ord(pos) = o; id(pos) = i; pay(pos) = p
    if (size < n) size += 1
  }

  def mergeIn(other: MinNBuffer): Unit = {
    var j = 0
    while (j < other.size) { add(other.ord(j), other.id(j), other.pay(j)); j += 1 }
  }

  def paySum: Long = { var s = 0L; var j = 0; while (j < size) { s += pay(j); j += 1 }; s }

  def serializeBytes(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 24 * size)
    bb.putInt(n); bb.putInt(size)
    var j = 0
    while (j < size) { bb.putLong(ord(j)); bb.putLong(id(j)); bb.putLong(pay(j)); j += 1 }
    bb.array()
  }
}

object MinNBuffer {
  def deserialize(bytes: Array[Byte]): MinNBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new MinNBuffer(bb.getInt)
    val sz = bb.getInt
    var j = 0
    // entries arrive in sorted order; add() keeps the invariant
    while (j < sz) { buf.add(bb.getLong, bb.getLong, bb.getLong); j += 1 }
    buf
  }
}

/** `min_n_summary(ord, id, payload, n)` → struct<kept bigint,
  * payload_sum bigint> over the n smallest (ord, id). Null in any input
  * column skips the row (a null id cannot be ranked). */
case class MinNSummary(
    ordExpr: Expression,
    idExpr: Expression,
    payExpr: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinNBuffer] {

  require(n >= 1, "n must be at least 1")

  override def children: Seq[Expression] = Seq(ordExpr, idExpr, payExpr)
  override def nullable: Boolean = false
  // strict BIGINT on all three children: update() casts the evaluated
  // values to Long, so an INT column would throw ClassCastException
  // mid-task — fail analysis instead (callers cast)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    children.find(_.dataType != LongType) match {
      case None =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case Some(bad) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"min_n_summary requires BIGINT (ord, id, payload), got ${bad.dataType.sql} — cast explicitly")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("kept", LongType, nullable = false),
    StructField("payload_sum", LongType, nullable = false)))
  override def prettyName: String = "min_n_summary"

  override def createAggregationBuffer(): MinNBuffer = new MinNBuffer(n)

  override def update(buf: MinNBuffer, input: InternalRow): MinNBuffer = {
    val o = ordExpr.eval(input); val i = idExpr.eval(input); val p = payExpr.eval(input)
    if (o != null && i != null && p != null)
      buf.add(o.asInstanceOf[Long], i.asInstanceOf[Long], p.asInstanceOf[Long])
    buf
  }

  override def merge(buf: MinNBuffer, other: MinNBuffer): MinNBuffer = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: MinNBuffer): Any =
    new GenericInternalRow(Array[Any](buf.size.toLong, buf.paySum))

  override def serialize(buf: MinNBuffer): Array[Byte] = buf.serializeBytes()
  override def deserialize(bytes: Array[Byte]): MinNBuffer = MinNBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MinNSummary =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinNSummary =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinNSummary =
    copy(ordExpr = newChildren(0), idExpr = newChildren(1), payExpr = newChildren(2))
}

object MinNAgg {
  import org.apache.spark.sql.graft.Bridge.{column, expression}

  /** Aggregate column: bounded n-smallest-by-(ord, id) summary. */
  def minNSummary(ord: Column, id: Column, payload: Column, n: Int): Column =
    column(MinNSummary(expression(ord), expression(id), expression(payload), n)
      .toAggregateExpression())
}
