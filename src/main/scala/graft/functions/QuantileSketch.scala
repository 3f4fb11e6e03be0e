package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

import java.nio.ByteBuffer

/** Mergeable multilevel quantile sketch (Munro–Paterson / KLL family,
  * deterministic alternating compaction).
  *
  * Structure: level h holds ≤ k values, each representing 2^h input
  * rows. A full level sorts and keeps alternate elements (the kept
  * parity flips per compaction, deterministically), promoting them to
  * level h+1 — so n rows occupy O(k log(n/k)) memory and a group's
  * whole distribution crosses the shuffle as ONE such buffer instead of
  * n rows. That is the 100 TB grouped-percentile path: where
  * `Percentiles.exact` range-shuffles every (group, value) pair for
  * exact answers, the sketch aggregate is map-side combinable and
  * shuffles only sketches (`Percentiles.approx`).
  *
  * Rank error: a compaction at level h perturbs ranks by at most 2^h,
  * and level h compacts at most n/(k·2^h) times, so the worst-case rank
  * error is O(n·log(n/k)/k) — well under 1% of n at k=256 for millions
  * of rows per group (asserted with a generous empirical bound in
  * PercentilesSpec). No RNG anywhere: results are reproducible for a
  * fixed partitioning.
  *
  * Level 0 is the per-row hot path: a preallocated array + counter, no
  * allocation per add; higher levels change only on (rare) compaction.
  */
final class QuantileBuffer(val k: Int) {
  // level 0 grows GEOMETRICALLY up to its k+1 cap instead of eagerly
  // allocating k+1 doubles at construction: the exactness discipline
  // derives k from the MEAN group size (4x, power-of-two), and at a
  // dimension-fixed scale-up that mean is corpus/dims — r19's full-set
  // sf100 sweep hit k≈4M, i.e. a 32 MB eager array per group buffer,
  // and ObjectHashAggregate OOM'd in createAggregationBuffer before a
  // single value arrived. Lazily, per-group memory is O(values actually
  // held) — identical add/compaction sequences, bit-identical results.
  private var l0 = new Array[Double](math.min(k + 1, 64))
  private[functions] var l0n = 0
  // hi(i) = level i+1 (weight 2^(i+1)); parities(h) = next kept parity
  // for level h (0 = level 0)
  private[functions] var hi: Array[Array[Double]] = Array.empty
  private var parities: Array[Boolean] = new Array[Boolean](1)
  var count: Long = 0L

  private[functions] def l0Values: Array[Double] = java.util.Arrays.copyOf(l0, l0n)
  private[functions] def setParities(p: Array[Boolean]): Unit = parities = p
  private[functions] def parityBits: Array[Boolean] = parities

  def add(v: Double): Unit = {
    sortedL0n = -1 // any mutation invalidates the cached eval sort
    if (l0n == l0.length && l0.length < k + 1)
      l0 = java.util.Arrays.copyOf(l0, math.min(l0.length.toLong * 2, k + 1L).toInt)
    l0(l0n) = v
    l0n += 1
    count += 1
    if (l0n > k) {
      promote(0, compactHalf(java.util.Arrays.copyOf(l0, l0n), 0))
      l0n = 0
      cascade()
    }
  }

  /** Sort and keep alternate elements; the kept parity flips per level
    * per compaction (deterministic, unbiased over pairs of compactions). */
  private def compactHalf(values: Array[Double], level: Int): Array[Double] = {
    sortedL0n = -1 // see promote(): structural mutations self-invalidate
    java.util.Arrays.sort(values)
    ensureParity(level)
    val start = if (parities(level)) 1 else 0
    parities(level) = !parities(level)
    Array.tabulate(math.max(0, (values.length - start + 1) / 2))(i => values(start + 2 * i))
  }

  private def ensureParity(level: Int): Unit =
    if (level >= parities.length) {
      val np = new Array[Boolean](level + 1)
      System.arraycopy(parities, 0, np, 0, parities.length)
      parities = np
    }

  private def promote(fromLevel: Int, values: Array[Double]): Unit = {
    // defense in depth (r19 advice): add() already pre-invalidates and
    // every mutation funnels through it today, but a future direct
    // level-0/level writer landing on the same l0n would silently serve
    // a stale snapshot from the length-equality fast path — invalidate
    // at every structural mutation too, so validity never depends on
    // the add()-only invariant
    sortedL0n = -1
    val i = fromLevel // hi index for level fromLevel+1
    if (i >= hi.length) {
      val nh = new Array[Array[Double]](i + 1)
      System.arraycopy(hi, 0, nh, 0, hi.length)
      for (j <- hi.length to i) nh(j) = Array.emptyDoubleArray
      hi = nh
    }
    hi(i) = hi(i) ++ values
  }

  private def cascade(): Unit = {
    var i = 0
    while (i < hi.length) {
      if (hi(i).length > k) {
        val promoted = compactHalf(hi(i), i + 1)
        hi(i) = Array.emptyDoubleArray
        promote(i + 1, promoted)
      }
      i += 1
    }
  }

  def mergeIn(other: QuantileBuffer): Unit = {
    var j = 0
    while (j < other.l0n) { // replays counts too
      add(other.l0(j))
      count -= 1 // add() bumped it; restore and add the true total below
      j += 1
    }
    var i = 0
    while (i < other.hi.length) {
      if (other.hi(i).nonEmpty) promote(i, other.hi(i))
      i += 1
    }
    count += other.count
    cascade()
  }

  /** Sorted level-0 snapshot, cached across the quantile(p) calls of one
    * eval. In the sketch's EXACT regime (k ≥ group size — the oracle
    * discipline sizes k at 4× the mean group, so nothing ever compacts)
    * level 0 holds the whole group: sorting it ONCE with the primitive
    * dual-pivot `Arrays.sort(double[])` instead of per-call boxed
    * `indices.sortBy` (an Integer-boxing comparator sort) was measured
    * 5-10× faster on the eval path. Invalidated by any add/merge. */
  private var sortedL0: Array[Double] = null
  private var sortedL0n: Int = -1

  /** Linear-interpolated quantile over the weighted items (weight 2^h at
    * level h) — percentile_cont-style semantics over the sketch view. */
  def quantile(p: Double): Double = {
    var n = l0n
    var i = 0
    while (i < hi.length) { n += hi(i).length; i += 1 }
    if (n == 0) return Double.NaN
    if (n == l0n) {
      // fast path: no compacted levels (the exact regime) — all weights
      // are 1, so the generic walk below reduces to: sort values, pick
      // r = floor(target), frac = target - r, interpolate when frac > 0.
      // Same IEEE sequence as the wi = 1 branch of the generic path
      // (frac*1 - 0 ≡ frac), bit-identical; Arrays.sort's total order
      // (-0.0 < 0.0, NaN last) matches the boxed TotalOrdering.
      if (sortedL0n != l0n) {
        sortedL0 = java.util.Arrays.copyOf(l0, l0n)
        java.util.Arrays.sort(sortedL0)
        sortedL0n = l0n
      }
      val target = p * (n - 1).toDouble
      val r = target.toInt
      val frac = target - r
      return if (r + 1 < n && frac > 0)
        sortedL0(r) + frac * (sortedL0(r + 1) - sortedL0(r))
      else sortedL0(r)
    }
    val values = new Array[Double](n)
    val weights = new Array[Long](n)
    var w = 0
    var j = 0
    while (j < l0n) { values(w) = l0(j); weights(w) = 1L; w += 1; j += 1 }
    i = 0
    while (i < hi.length) {
      val lw = 1L << (i + 1)
      hi(i).foreach { v => values(w) = v; weights(w) = lw; w += 1 }
      i += 1
    }
    // sort by value, carrying weights
    val idx = values.indices.toArray.sortBy(values)
    val total = weights.sum
    val target = p * (total - 1)
    var cum = 0L
    var r = 0
    while (r < idx.length) {
      val wi = weights(idx(r))
      if (target < cum + wi) {
        val frac = (target - cum) / wi
        return if (r + 1 < idx.length && frac > (wi - 1).toDouble / wi)
          values(idx(r)) + (frac * wi - (wi - 1)) * (values(idx(r + 1)) - values(idx(r)))
        else values(idx(r))
      }
      cum += wi
      r += 1
    }
    values(idx.last)
  }

  def serializeBytes(): Array[Byte] = {
    val sz = 8 + 4 + 4 + l0n * 8 + 4 + parities.length +
      hi.map(l => 4 + l.length * 8).sum + 4
    val bb = ByteBuffer.allocate(sz)
    bb.putLong(count)
    bb.putInt(k)
    bb.putInt(l0n)
    var j = 0
    while (j < l0n) { bb.putDouble(l0(j)); j += 1 }
    bb.putInt(hi.length)
    hi.foreach { l => bb.putInt(l.length); l.foreach(bb.putDouble) }
    bb.putInt(parities.length)
    parities.foreach(p => bb.put(if (p) 1.toByte else 0.toByte))
    bb.array()
  }
}

object QuantileBuffer {
  def deserialize(bytes: Array[Byte]): QuantileBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val count = bb.getLong
    val k = bb.getInt
    val buf = new QuantileBuffer(k)
    val l0n = bb.getInt
    var j = 0
    while (j < l0n) { buf.add(bb.getDouble); j += 1 }
    buf.count = count // add() above double-counted; restore the true total
    val nHi = bb.getInt
    val hi = new Array[Array[Double]](nHi)
    for (i <- 0 until nHi) {
      val len = bb.getInt
      hi(i) = Array.fill(len)(bb.getDouble)
    }
    buf.hi = hi
    val np = bb.getInt
    buf.setParities(Array.fill(np)(bb.get() == 1))
    buf
  }
}

/** Grouped approximate quantiles: `kll_quantiles(value, k, ps…)` →
  * array<double> of the requested percentiles. Map-side combinable;
  * O(k log(n/k)) bytes per group cross the shuffle. */
case class KllQuantiles(
    child: Expression,
    k: Int,
    ps: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileBuffer] {

  require(k >= 8, "sketch size k must be at least 8")
  require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), "fractions must lie in [0,1]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "kll_quantiles"

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
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(s"non-numeric input: $other")
    })
    buf
  }

  override def merge(buf: QuantileBuffer, other: QuantileBuffer): QuantileBuffer = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: QuantileBuffer): Any =
    new GenericArrayData(ps.map(buf.quantile).toArray)

  override def serialize(buf: QuantileBuffer): Array[Byte] = buf.serializeBytes()

  override def deserialize(bytes: Array[Byte]): QuantileBuffer =
    QuantileBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllQuantiles =
    copy(child = newChildren.head)
}
