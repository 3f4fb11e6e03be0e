package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

import java.nio.ByteBuffer

/** KMV (k-minimum-values) distinct-count sketch buffer: the k smallest
  * 64-bit hashes seen, compared unsigned. Mergeable (union of mins) and
  * tiny (k longs) — the property that makes it a ONE-shuffle distributed
  * distinct estimate at 100 TB, vs an exact COUNT(DISTINCT)'s full
  * shuffle of the keys. */
final class KmvBuffer(val k: Int) {
  // TreeSet ordered by unsigned comparison; last = largest of the k mins
  val set = new java.util.TreeSet[java.lang.Long](
    (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b))

  def add(h: Long): Unit = {
    set.add(h)
    if (set.size > k) set.pollLast()
  }

  def mergeIn(other: KmvBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) add(it.next())
  }

  /** Estimate: if fewer than k values seen the count is exact; otherwise
    * (k-1) / fraction-of-hash-space covered by the k-th minimum. */
  def estimate: Long = {
    if (set.size < k) set.size.toLong
    else {
      val kth = set.last() // largest of the k smallest, unsigned
      val frac = (kth.doubleValue() / 1.8446744073709552e19) + // 2^64
        (if (kth < 0) 1.0 else 0.0) // unsigned correction for the sign bit
      math.round((k - 1) / frac)
    }
  }
}

/** Distinct-count sketch aggregate over pre-hashed 64-bit values
  * (`xxhash64(col)` upstream). A TypedImperativeAggregate: partial
  * buffers combine map-side, only k longs per group cross the shuffle.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: KmvBuffer): Any = buf.estimate

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.set.size * 8)
    bb.putInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvDistinct =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvDistinct =
    copy(child = c.head)
}

object KmvSketch {
  import org.apache.spark.sql.graft.Bridge.{column, expression}

  /** Approximate COUNT(DISTINCT col) with a k-minimum-values sketch.
    * Hash upstream with xxhash64 so any input type works. */
  def kmvDistinct(hashed: Column, k: Int = 256): Column =
    column(KmvDistinct(expression(hashed), k).toAggregateExpression())
}
