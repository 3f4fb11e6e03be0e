package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer

/** L63: PERSISTABLE sketch columns — the rollup-table pattern.
  *
  * The reference exercises Presto's `approx_set(x)` → HyperLogLog column
  * → `merge(hll)` → `cardinality(...)` flow (ref: paimon-presto
  * TestPrestoSqlITCase testApproxSet / testMergeHyperLogLog): a sketch
  * is a first-class VALUE that can be stored in a table and re-merged
  * later, so a 100 TB corpus is summarized once and every subsequent
  * rollup works on sketch bytes instead of raw rows.
  *
  * Graft's mergeable aggregates (KMV distinct / KLL quantiles / MG heavy
  * hitters) already serialize their buffers for shuffle transport; this
  * file turns those buffers into BINARY column values:
  *
  *   state aggregates  `kmv_state / kll_state / mg_state`  rows → sketch
  *   merge aggregates  `kmv_merge / kll_merge / mg_merge`  sketches → sketch
  *   extractors        `kmv_estimate / kll_quantile / mg_top` sketch → value
  *
  * All three serialized forms are self-describing (k travels in the
  * bytes), so a merge needs no parameter agreement with the writer.
  * KMV merges are LOSSLESS by construction (the global k-minimum set is
  * a pure function of the union of per-part k-minimum sets), so
  * merge-of-stored-sketches ≡ one-pass sketch bit-for-bit at any scale —
  * the property `q_sketch_persist` oracle-checks. KLL/MG merges are
  * exact in their no-compaction regimes and carry the documented bounds
  * beyond them (SketchPersistSpec).
  *
  * The extractors are CodegenFallback by design: they run once per
  * GROUP on rollup-sized frames, never per corpus row — the per-element
  * hot-path rule (native codegen expressions) does not apply.
  */
object SketchState {
  import org.apache.spark.sql.graft.Bridge.{column, expression}

  /** KMV state bytes: [k][n][n × long hash]. KmvDistinct's shuffle form
    * omits k (the operator carries it); a PERSISTED sketch must be
    * self-describing. */
  private[functions] def kmvSerialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.set.size * 8)
    bb.putInt(buf.k)
    bb.putInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  private[functions] def kmvDeserialize(bytes: Array[Byte]): KmvBuffer = {
    // structural header validation: cardinality()'s overload dispatch
    // (SketchCardinality) routes ANY binary column here, so a non-sketch
    // binary value (raw bytes, an image, a different sketch family) must
    // fail LOUDLY rather than decode as garbage and return a plausible
    // estimate (ADVICE r18). The L63 layout is [int k][int n][n longs]:
    // requiring 0 <= n <= k and an exact byte length pins it.
    def bad(why: String): Nothing = throw new IllegalArgumentException(
      s"not a graft KMV sketch ($why): cardinality()/kmv_estimate expect the BINARY " +
        "produced by approx_set/merge/kmv_state — for array/map sizes use Spark's " +
        "cardinality on the collection column itself")
    if (bytes.length < 8) bad(s"${bytes.length} bytes, header needs 8")
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val n = bb.getInt
    if (k < 1) bad(s"k=$k")
    if (n < 0 || n > k) bad(s"n=$n outside [0, k=$k]")
    if (bytes.length != 8 + n.toLong * 8) bad(s"${bytes.length} bytes, expected ${8 + n.toLong * 8}")
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  def kmvState(hashed: Column, k: Int = 256): Column =
    column(KmvState(expression(hashed), k).toAggregateExpression())
  def kmvMerge(sketch: Column): Column =
    column(KmvMergeState(expression(sketch)).toAggregateExpression())
  def kmvEstimate(sketch: Column): Column =
    column(KmvEstimateExpr(expression(sketch)))

  def kllState(value: Column, k: Int = 256): Column =
    column(KllState(expression(value), k).toAggregateExpression())
  def kllMerge(sketch: Column): Column =
    column(KllMergeState(expression(sketch)).toAggregateExpression())
  def kllQuantile(sketch: Column, p: Double): Column =
    column(KllQuantileExpr(expression(sketch), p))

  def mgState(item: Column, k: Int = 256): Column =
    column(MgState(expression(item), k).toAggregateExpression())
  def mgMerge(sketch: Column): Column =
    column(MgMergeState(expression(sketch)).toAggregateExpression())
  def mgTop(sketch: Column, topN: Int): Column =
    column(MgTopExpr(expression(sketch), topN))

  // ---- pairwise BINARY merges (S26: sketch-typed merge-engine columns,
  // the Paimon hll_sketch/rbm field-agg shape): the fold merge engines
  // combine two stored sketch values at a time. Left-fold order matches
  // the merge aggregates' frame order, so both read formulations
  // produce identical bytes for these deterministic buffers.
  def kmvMergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val x = kmvDeserialize(a); x.mergeIn(kmvDeserialize(b)); kmvSerialize(x)
  }
  def kllMergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val x = QuantileBuffer.deserialize(a)
    x.mergeIn(QuantileBuffer.deserialize(b))
    x.serializeBytes()
  }
  def mgMergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val x = FreqBuffer.deserialize(a); x.mergeIn(FreqBuffer.deserialize(b)); x.serializeBytes()
  }
}

/** `kmv_state(hashedLong, k)` → BINARY sketch of the group. */
case class KmvState(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_state takes a pre-hashed BIGINT column (xxhash64/tokenHash64 " +
        s"upstream), got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kmv_state"
  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)
  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }
  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = { buf.mergeIn(other); buf }
  override def eval(buf: KmvBuffer): Any = SketchState.kmvSerialize(buf)
  override def serialize(buf: KmvBuffer): Array[Byte] = SketchState.kmvSerialize(buf)
  override def deserialize(bytes: Array[Byte]): KmvBuffer = SketchState.kmvDeserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): KmvState = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvState = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvState =
    copy(child = c.head)
}

/** Mutable cell for the merge aggregates: `inner == null` until the
  * first input sketch arrives (a parameterless "empty" buffer cannot
  * exist — k is only known from the data, and a dummy-k buffer would
  * either crash on construction or silently degrade exactness). */
final class SketchMergeHolder[T <: AnyRef](var inner: T)

/** `merge(sketchBinary)` → BINARY union sketch, runtime-dispatched on
  * the self-describing header: KMV (L63 layout) or dense HLL (the
  * magic-tagged R70/P4 layout) — Presto's `merge` likewise accepts both
  * HyperLogLog forms. Mixed-k KMV inputs merge at the SMALLEST k
  * (still a valid KMV of that size, the standard downgrade); mixing the
  * two FAMILIES in one group fails loudly (no sound union exists). */
case class KmvMergeState(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SketchMergeHolder[AnyRef]] {
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_merge requires a BINARY sketch column, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kmv_merge"
  override def createAggregationBuffer(): SketchMergeHolder[AnyRef] =
    new SketchMergeHolder[AnyRef](null)
  private def combine(h: SketchMergeHolder[AnyRef], b: AnyRef): SketchMergeHolder[AnyRef] = {
    (h.inner, b) match {
      case (null, _) => h.inner = b
      case (a: KmvBuffer, bb: KmvBuffer) =>
        if (bb.k < a.k) { bb.mergeIn(a); h.inner = bb } else a.mergeIn(bb)
      case (a: DenseHllBuffer, bb: DenseHllBuffer) => a.mergeIn(bb)
      case _ => throw new IllegalArgumentException(
        "merge() received BOTH a KMV and a dense-HLL sketch in one group — " +
          "the families have no sound union; re-aggregate one side")
    }
    h
  }
  private def decode(bytes: Array[Byte]): AnyRef =
    if (DenseHll.isDense(bytes)) DenseHll.deserialize(bytes)
    else SketchState.kmvDeserialize(bytes)
  private def encode(v: AnyRef): Array[Byte] = v match {
    case b: KmvBuffer => SketchState.kmvSerialize(b)
    case d: DenseHllBuffer => d.serialize
  }
  override def update(h: SketchMergeHolder[AnyRef], input: InternalRow): SketchMergeHolder[AnyRef] = {
    val v = child.eval(input)
    if (v == null) h
    else combine(h, decode(v.asInstanceOf[Array[Byte]]))
  }
  override def merge(h: SketchMergeHolder[AnyRef], o: SketchMergeHolder[AnyRef]): SketchMergeHolder[AnyRef] =
    if (o.inner == null) h else combine(h, o.inner)
  override def eval(h: SketchMergeHolder[AnyRef]): Any =
    encode(if (h.inner == null) new KmvBuffer(1) else h.inner)
  override def serialize(h: SketchMergeHolder[AnyRef]): Array[Byte] =
    if (h.inner == null) Array.emptyByteArray else encode(h.inner)
  override def deserialize(bytes: Array[Byte]): SketchMergeHolder[AnyRef] =
    new SketchMergeHolder[AnyRef](if (bytes.isEmpty) null else decode(bytes))
  override def withNewMutableAggBufferOffset(o: Int): KmvMergeState = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMergeState = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvMergeState =
    copy(child = c.head)
}

/** `kmv_estimate(sketchBinary)` → BIGINT distinct estimate. Dispatches
  * on the self-describing header: dense-HLL (magic-tagged) estimates via
  * the HLL harmonic mean, anything else must satisfy the KMV structural
  * header or fail loudly. */
case class KmvEstimateExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_estimate requires a BINARY sketch column, got ${child.dataType.sql}")
  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    if (DenseHll.isDense(bytes)) DenseHll.deserialize(bytes).estimate
    else SketchState.kmvDeserialize(bytes).estimate
  }
  override protected def withNewChildInternal(c: Expression): KmvEstimateExpr = copy(child = c)
}

/** `kll_state(numeric, k)` → BINARY quantile sketch of the group
  * (QuantileBuffer's self-describing byte form). */
case class KllState(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileBuffer] {
  require(k >= 8, "sketch size k must be at least 8")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_state"
  override def createAggregationBuffer(): QuantileBuffer = new QuantileBuffer(k)
  override def update(buf: QuantileBuffer, input: InternalRow): QuantileBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
      case d: Decimal => d.toDouble
      case other => throw new IllegalArgumentException(s"non-numeric input: $other")
    })
    buf
  }
  override def merge(buf: QuantileBuffer, other: QuantileBuffer): QuantileBuffer = {
    buf.mergeIn(other); buf
  }
  override def eval(buf: QuantileBuffer): Any = buf.serializeBytes()
  override def serialize(buf: QuantileBuffer): Array[Byte] = buf.serializeBytes()
  override def deserialize(bytes: Array[Byte]): QuantileBuffer = QuantileBuffer.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): KllState = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllState = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllState =
    copy(child = c.head)
}

/** `kll_merge(sketchBinary)` → BINARY merged quantile sketch. */
case class KllMergeState(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SketchMergeHolder[QuantileBuffer]] {
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_merge requires a BINARY sketch column, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_merge"
  override def createAggregationBuffer(): SketchMergeHolder[QuantileBuffer] =
    new SketchMergeHolder[QuantileBuffer](null)
  private def combine(h: SketchMergeHolder[QuantileBuffer], b: QuantileBuffer): SketchMergeHolder[QuantileBuffer] = {
    if (h.inner == null) h.inner = b
    else if (b.k < h.inner.k) { b.mergeIn(h.inner); h.inner = b }
    else h.inner.mergeIn(b)
    h
  }
  override def update(h: SketchMergeHolder[QuantileBuffer], input: InternalRow): SketchMergeHolder[QuantileBuffer] = {
    val v = child.eval(input)
    if (v == null) h
    else combine(h, QuantileBuffer.deserialize(v.asInstanceOf[Array[Byte]]))
  }
  override def merge(h: SketchMergeHolder[QuantileBuffer], o: SketchMergeHolder[QuantileBuffer]): SketchMergeHolder[QuantileBuffer] =
    if (o.inner == null) h else combine(h, o.inner)
  override def eval(h: SketchMergeHolder[QuantileBuffer]): Any =
    (if (h.inner == null) new QuantileBuffer(8) else h.inner).serializeBytes()
  override def serialize(h: SketchMergeHolder[QuantileBuffer]): Array[Byte] =
    if (h.inner == null) Array.emptyByteArray else h.inner.serializeBytes()
  override def deserialize(bytes: Array[Byte]): SketchMergeHolder[QuantileBuffer] =
    new SketchMergeHolder[QuantileBuffer](
      if (bytes.isEmpty) null else QuantileBuffer.deserialize(bytes))
  override def withNewMutableAggBufferOffset(o: Int): KllMergeState = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeState = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllMergeState =
    copy(child = c.head)
}

/** `kll_quantile(sketchBinary, p)` → DOUBLE interpolated quantile. */
case class KllQuantileExpr(child: Expression, p: Double)
  extends UnaryExpression with CodegenFallback {
  require(p >= 0 && p <= 1, "fraction must lie in [0,1]")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_quantile requires a BINARY sketch column, got ${child.dataType.sql}")
  override def nullSafeEval(v: Any): Any =
    QuantileBuffer.deserialize(v.asInstanceOf[Array[Byte]]).quantile(p)
  override protected def withNewChildInternal(c: Expression): KllQuantileExpr = copy(child = c)
}

/** `cardinality(x)` — the Presto-shaped OVERLOAD dispatch (ref:
  * paimon-presto TestPrestoSqlITCase testApproxSet: `cardinality(hll)`):
  * a BINARY KMV sketch yields its distinct estimate (BIGINT); any other
  * input keeps Spark's builtin collection semantics (Size over
  * array/map), so registering the name in a graft session does not break
  * `cardinality(array)`. Dispatch happens at ANALYSIS time on the
  * resolved child type (RuntimeReplaceable — the optimizer swaps in the
  * replacement, so codegen and pushdown see only the concrete node). */
case class SketchCardinality(child: Expression)
  extends Expression
  with org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case BinaryType => KmvEstimateExpr(child)
    case _ => org.apache.spark.sql.catalyst.expressions.Size(child, legacySizeOfNull = false)
  }
  override def prettyName: String = "cardinality"
  override protected def withNewChildInternal(c: Expression): SketchCardinality =
    copy(child = c)
}

/** `mg_state(item, k)` → BINARY Misra–Gries sketch of the group. */
case class MgState(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqBuffer] {
  require(k >= 4, "sketch size k must be at least 4")
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mg_state requires a STRING item column, got ${child.dataType.sql} — " +
        "cast explicitly so date/timestamp values are rendered, not raw internals")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "mg_state"
  override def createAggregationBuffer(): FreqBuffer = new FreqBuffer(k)
  override def update(buf: FreqBuffer, input: InternalRow): FreqBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString)
    buf
  }
  override def merge(buf: FreqBuffer, other: FreqBuffer): FreqBuffer = { buf.mergeIn(other); buf }
  override def eval(buf: FreqBuffer): Any = buf.serializeBytes()
  override def serialize(buf: FreqBuffer): Array[Byte] = buf.serializeBytes()
  override def deserialize(bytes: Array[Byte]): FreqBuffer = FreqBuffer.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): MgState = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgState = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MgState =
    copy(child = c.head)
}

/** `mg_merge(sketchBinary)` → BINARY merged Misra–Gries sketch. */
case class MgMergeState(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SketchMergeHolder[FreqBuffer]] {
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mg_merge requires a BINARY sketch column, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "mg_merge"
  override def createAggregationBuffer(): SketchMergeHolder[FreqBuffer] =
    new SketchMergeHolder[FreqBuffer](null)
  private def combine(h: SketchMergeHolder[FreqBuffer], b: FreqBuffer): SketchMergeHolder[FreqBuffer] = {
    if (h.inner == null) h.inner = b
    else if (b.k < h.inner.k) { b.mergeIn(h.inner); h.inner = b }
    else h.inner.mergeIn(b)
    h
  }
  override def update(h: SketchMergeHolder[FreqBuffer], input: InternalRow): SketchMergeHolder[FreqBuffer] = {
    val v = child.eval(input)
    if (v == null) h
    else combine(h, FreqBuffer.deserialize(v.asInstanceOf[Array[Byte]]))
  }
  override def merge(h: SketchMergeHolder[FreqBuffer], o: SketchMergeHolder[FreqBuffer]): SketchMergeHolder[FreqBuffer] =
    if (o.inner == null) h else combine(h, o.inner)
  override def eval(h: SketchMergeHolder[FreqBuffer]): Any =
    (if (h.inner == null) new FreqBuffer(4) else h.inner).serializeBytes()
  override def serialize(h: SketchMergeHolder[FreqBuffer]): Array[Byte] =
    if (h.inner == null) Array.emptyByteArray else h.inner.serializeBytes()
  override def deserialize(bytes: Array[Byte]): SketchMergeHolder[FreqBuffer] =
    new SketchMergeHolder[FreqBuffer](
      if (bytes.isEmpty) null else FreqBuffer.deserialize(bytes))
  override def withNewMutableAggBufferOffset(o: Int): MgMergeState = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgMergeState = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MgMergeState =
    copy(child = c.head)
}

/** `mg_top(sketchBinary, n)` → array<struct<item,cnt>> of the top-n
  * surviving counters, (count desc, item asc)-ordered — the FreqItems
  * output shape read back out of a persisted sketch. */
case class MgTopExpr(child: Expression, topN: Int)
  extends UnaryExpression with CodegenFallback {
  require(topN >= 1, "topN must be at least 1")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "mg_top"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mg_top requires a BINARY sketch column, got ${child.dataType.sql}")
  override def nullSafeEval(v: Any): Any = {
    val buf = FreqBuffer.deserialize(v.asInstanceOf[Array[Byte]])
    new GenericArrayData(buf.top(topN).map { case (item, cnt) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), cnt))
    }.toArray[Any])
  }
  override protected def withNewChildInternal(c: Expression): MgTopExpr = copy(child = c)
}
