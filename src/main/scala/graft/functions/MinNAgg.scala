package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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

/** Bounded "n first rows by a typed lexicographic order" buffer — the
  * generalization of [[MinNBuffer]] to composite orderings (Long /
  * Double / String keys, each asc or desc) carrying opaque payload
  * fields. Kept sorted ascending under the flagged order; capacity n.
  */
final class MinNRowsBuffer(
    val n: Int,
    val ordWidth: Int,
    val width: Int,
    val desc: Array[Boolean],
    val types: Array[Int]) { // 0 = Long, 1 = Double, 2 = String (UTF8String)
  import MinNRowsBuffer._

  val rows = new scala.collection.mutable.ArrayBuffer[Array[Any]](math.min(n, 64))

  /** Lexicographic compare over the ord prefix, honoring desc flags.
    * Callers MUST make the ord keys a total order (append a unique
    * tie-break column) — equal-ord rows are kept arbitrarily otherwise
    * and the result becomes partitioning-dependent. */
  def compare(a: Array[Any], b: Array[Any]): Int = {
    var i = 0
    while (i < ordWidth) {
      val c = types(i) match {
        case TLong => java.lang.Long.compare(a(i).asInstanceOf[Long], b(i).asInstanceOf[Long])
        case TDouble =>
          java.lang.Double.compare(a(i).asInstanceOf[Double], b(i).asInstanceOf[Double])
        case _ =>
          a(i).asInstanceOf[UTF8String].compareTo(b(i).asInstanceOf[UTF8String])
      }
      if (c != 0) return if (desc(i)) -c else c
      i += 1
    }
    0
  }

  def add(row: Array[Any]): Unit = {
    if (rows.size == n && compare(row, rows.last) >= 0) return
    var lo = 0; var hi = rows.size
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (compare(rows(m), row) <= 0) lo = m + 1 else hi = m
    }
    rows.insert(lo, row)
    if (rows.size > n) rows.remove(rows.size - 1)
  }

  def mergeIn(other: MinNRowsBuffer): Unit = other.rows.foreach(add)

  def serializeBytes(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(rows.size)
    rows.foreach { r =>
      var i = 0
      while (i < width) {
        val v = r(i)
        if (i >= ordWidth) out.writeBoolean(v != null) // ord fields are never null
        if (i < ordWidth || v != null) types(i) match {
          case TLong => out.writeLong(v.asInstanceOf[Long])
          case TDouble => out.writeDouble(v.asInstanceOf[Double])
          case _ =>
            val b = v.asInstanceOf[UTF8String].getBytes
            out.writeInt(b.length); out.write(b)
        }
        i += 1
      }
    }
    out.flush()
    bos.toByteArray
  }
}

object MinNRowsBuffer {
  final val TLong = 0
  final val TDouble = 1
  final val TString = 2

  def typeCode(dt: DataType): Int = dt match {
    case LongType => TLong
    case DoubleType => TDouble
    case StringType => TString
    case other => throw new IllegalArgumentException(s"unsupported min_n_rows type: $other")
  }

  def deserialize(
      bytes: Array[Byte], n: Int, ordWidth: Int, width: Int,
      desc: Array[Boolean], types: Array[Int]): MinNRowsBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new MinNRowsBuffer(n, ordWidth, width, desc, types)
    val sz = in.readInt()
    var j = 0
    while (j < sz) {
      val row = new Array[Any](width)
      var i = 0
      while (i < width) {
        val present = i < ordWidth || in.readBoolean()
        if (present) row(i) = types(i) match {
          case TLong => java.lang.Long.valueOf(in.readLong())
          case TDouble => java.lang.Double.valueOf(in.readDouble())
          case _ =>
            val b = new Array[Byte](in.readInt()); in.readFully(b); UTF8String.fromBytes(b)
        }
        i += 1
      }
      buf.add(row) // arrives sorted; add() keeps the invariant
      j += 1
    }
    buf
  }
}

/** `min_n_rows` — keep the n FIRST rows under a composite (Long / Double
  * / String, asc-or-desc per key) lexicographic ordering, emitting them
  * as a SORTED array<struct<ordFields..., payloadFields...>>.
  *
  * This is the bounded, map-side-combinable replacement for the
  * `row_number().over(Window.partitionBy(key).orderBy(...)) <= n` idiom
  * when the kept ROWS (not just a count) are needed: a window sorts every
  * row of a key in one task (the hot-key wall, CLAUDE.md rule), while
  * this aggregate ships ≤ n rows per key per partition across the
  * shuffle. Selection by a TOTAL order is merge-order independent, so
  * results are bit-identical to the window form under any partitioning
  * (MinNSpec proves it) — PROVIDED the ord keys are unique per group
  * (append a unique tie-break key; callers' contract).
  *
  * Rows with a null ord key are skipped (unrankable, as MinNSummary).
  * Array order = the flagged ordering, so posexplode's pos + 1 is the
  * row_number the window form would have produced.
  */
case class MinNRows(
    ordExprs: Seq[Expression],
    descFlags: Seq[Boolean],
    payExprs: Seq[Expression],
    fieldNames: Seq[String],
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinNRowsBuffer] {

  require(n >= 1, "n must be at least 1")
  require(ordExprs.nonEmpty, "at least one ordering key required")
  require(descFlags.length == ordExprs.length, "one desc flag per ordering key")
  require(fieldNames.length == ordExprs.length + payExprs.length,
    "one field name per ord + payload column")

  override def children: Seq[Expression] = ordExprs ++ payExprs
  override def nullable: Boolean = false
  override def prettyName: String = "min_n_rows"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    children.find(c => !Seq(LongType, DoubleType, StringType).contains(c.dataType)) match {
      case None =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case Some(bad) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"min_n_rows requires BIGINT/DOUBLE/STRING columns, got ${bad.dataType.sql} — cast explicitly")
    }

  /** With a single ord column and no payload, emit array<ordType>
    * directly (no struct wrapper) — the caller can then cast/join it
    * without a per-element lambda (HOFs are interpreted; banned on the
    * declared surface by PlanAuditSpec). */
  private def singleField: Boolean = children.length == 1

  override def dataType: DataType =
    if (singleField) ArrayType(children.head.dataType, containsNull = false)
    else ArrayType(
      StructType(fieldNames.zip(children).map { case (nm, c) =>
        StructField(nm, c.dataType, nullable = c.nullable)
      }),
      containsNull = false)

  private lazy val typeCodes = children.map(c => MinNRowsBuffer.typeCode(c.dataType)).toArray
  private lazy val descArr = descFlags.toArray
  private def ordWidth = ordExprs.length
  private def width = children.length

  override def createAggregationBuffer(): MinNRowsBuffer =
    new MinNRowsBuffer(n, ordWidth, width, descArr, typeCodes)

  override def update(buf: MinNRowsBuffer, input: InternalRow): MinNRowsBuffer = {
    val row = new Array[Any](width)
    var i = 0
    while (i < width) {
      var v = children(i).eval(input)
      if (v == null && i < ordWidth) return buf // unrankable — skip the row
      // UTF8String from eval may be backed by a reused buffer — copy
      v match { case u: UTF8String => v = u.clone(); case _ => }
      row(i) = v
      i += 1
    }
    buf.add(row)
    buf
  }

  override def merge(buf: MinNRowsBuffer, other: MinNRowsBuffer): MinNRowsBuffer = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: MinNRowsBuffer): Any =
    if (singleField)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        buf.rows.map(_(0)).toArray[Any])
    else
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        buf.rows.map(r => new GenericInternalRow(r.asInstanceOf[Array[Any]])).toArray[Any])

  override def serialize(buf: MinNRowsBuffer): Array[Byte] = buf.serializeBytes()
  override def deserialize(bytes: Array[Byte]): MinNRowsBuffer =
    MinNRowsBuffer.deserialize(bytes, n, ordWidth, width, descArr, typeCodes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MinNRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinNRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinNRows =
    copy(ordExprs = newChildren.take(ordExprs.length),
      payExprs = newChildren.drop(ordExprs.length))
}

object MinNAgg {
  import org.apache.spark.sql.graft.Bridge.{column, expression}

  /** Aggregate column: bounded n-smallest-by-(ord, id) summary. */
  def minNSummary(ord: Column, id: Column, payload: Column, n: Int): Column =
    column(MinNSummary(expression(ord), expression(id), expression(payload), n)
      .toAggregateExpression())

  /** Aggregate column: the n first rows under `keys` (each `(name, col,
    * desc)`), emitted as a sorted array<struct> of keys ++ payload.
    * Keys must form a total order within each group (unique tie-break). */
  def minNRows(n: Int, keys: Seq[(String, Column, Boolean)],
      payload: Seq[(String, Column)] = Nil): Column =
    column(MinNRows(
      keys.map(k => expression(k._2)),
      keys.map(_._3),
      payload.map(p => expression(p._2)),
      keys.map(_._1) ++ payload.map(_._1),
      n).toAggregateExpression())
}
