package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** DENSE HyperLogLog sketch — the fixed-register sibling of the KMV
  * sketch (ref: paimon-presto PrestoDistributedQueryTest.java:809-858
  * testP4ApproxSet* — Presto's P4HyperLogLog, the DENSE storage form of
  * approx_set; all skipped there). Semantics parity, not byte parity:
  * Presto's P4 register byte LAYOUT is Airlift-engine-internal storage
  * (4-bit packed registers + baseline/overflow encoding), so this codec
  * uses its own self-describing layout and SURVEY §2 documents the
  * byte-format N/A decision.
  *
  * Why a dense form at all, at 100 TB: a KMV sketch's size is k·8 B and
  * its accuracy degrades as 1/√k for UNIONS of many sketches only via
  * the shared k-min set; a dense HLL is a FIXED m-byte register file
  * whose merge is a bytewise max — the canonical rollup-table column
  * when billions of per-partition sketches fold into one (the S26
  * aggregation merge engine / L63 persisted-sketch pattern).
  *
  * Byte layout (self-describing, magic-tagged):
  *   [int32 MAGIC = 0xD4484C4C]["p" byte in 4..16][2^p register bytes]
  * The magic's high bit makes the first int NEGATIVE, so a dense sketch
  * can never satisfy the KMV structural header (k >= 1) and the two
  * families dispatch unambiguously at runtime (SketchState.kmvDeserialize
  * rejects it loudly; sketch-aware callers route on [[DenseHll.isDense]]).
  *
  * Register update: for hash h, bucket = top p bits, rho = leading
  * zeros of the remaining 64-p bits + 1 (capped). Estimator: standard
  * HLL harmonic mean with alpha(m) bias correction and the
  * linear-counting small-range correction; no large-range correction
  * (64-bit hash space — collisions are unreachable at any real corpus).
  */
final class DenseHllBuffer(val p: Int) {
  require(p >= 4 && p <= 16, s"dense HLL precision p must be in [4,16], got $p")
  val m: Int = 1 << p
  val registers: Array[Byte] = new Array[Byte](m)

  def add(hash: Long): Unit = {
    val bucket = (hash >>> (64 - p)).toInt
    val rest = hash << p
    // rho of the remaining bits; all-zero rest caps at 64-p+1
    val rho = (if (rest == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (rho > (registers(bucket) & 0xFF)) registers(bucket) = rho.toByte
  }

  def mergeIn(other: DenseHllBuffer): Unit = {
    require(other.p == p,
      s"cannot merge dense HLL sketches of different precision ($p vs ${other.p}) — " +
        "build both sides with the same maxError")
    var i = 0
    while (i < m) {
      if ((other.registers(i) & 0xFF) > (registers(i) & 0xFF)) registers(i) = other.registers(i)
      i += 1
    }
  }

  def estimate: Long = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = registers(i) & 0xFF
      sum += java.lang.Math.scalb(1.0, -r) // exact 2^-r
      if (r == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m.toDouble * m.toDouble / sum
    val corrected =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.rint(corrected).toLong
  }

  def serialize: Array[Byte] = {
    val bb = ByteBuffer.allocate(5 + m)
    bb.putInt(DenseHll.Magic)
    bb.put(p.toByte)
    bb.put(registers)
    bb.array()
  }
}

object DenseHll {
  /** High bit set ⇒ first int of a dense sketch is negative — structurally
    * disjoint from the KMV header (k >= 1). */
  val Magic: Int = 0xD4484C4C

  def isDense(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 5 &&
      ByteBuffer.wrap(bytes, 0, 4).getInt == Magic

  def deserialize(bytes: Array[Byte]): DenseHllBuffer = {
    def bad(why: String): Nothing = throw new IllegalArgumentException(
      s"not a graft dense-HLL sketch ($why): expected the BINARY produced by p4_approx_set")
    if (bytes.length < 5) bad(s"${bytes.length} bytes, header needs 5")
    val bb = ByteBuffer.wrap(bytes)
    if (bb.getInt != Magic) bad("bad magic")
    val p = bb.get().toInt
    if (p < 4 || p > 16) bad(s"p=$p")
    if (bytes.length != 5 + (1 << p)) bad(s"${bytes.length} bytes, expected ${5 + (1 << p)}")
    val buf = new DenseHllBuffer(p)
    bb.get(buf.registers)
    buf
  }

  /** Presto maxError → precision: m = (1.04/e)^2 rounded UP to a power
    * of two (register count must be 2^p), clamped to p in [4,16]. */
  def maxErrorToP(e: Double): Int = {
    require(e >= 0.0040625 && e <= 0.26,
      s"p4_approx_set maxError must be in [0.0040625, 0.26], got $e")
    val m = (1.04 / e) * (1.04 / e)
    var p = 4
    while (p < 16 && (1 << p) < m - 1e-9) p += 1
    p
  }
}

/** `p4_approx_set(hashedLong[, p])` → BINARY dense-HLL sketch of the
  * group. The child is a pre-hashed BIGINT (null-propagating xxhash64
  * upstream, like KmvState) so NULL inputs are skipped — the Presto
  * with-nulls/only-nulls contract (an only-nulls group yields an empty
  * sketch estimating 0). */
case class DenseHllState(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DenseHllBuffer] {
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"p4_approx_set takes a pre-hashed BIGINT column, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "p4_approx_set"
  override def createAggregationBuffer(): DenseHllBuffer = new DenseHllBuffer(p)
  override def update(buf: DenseHllBuffer, input: InternalRow): DenseHllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }
  override def merge(buf: DenseHllBuffer, other: DenseHllBuffer): DenseHllBuffer = {
    buf.mergeIn(other); buf
  }
  override def eval(buf: DenseHllBuffer): Any = buf.serialize
  override def serialize(buf: DenseHllBuffer): Array[Byte] = buf.serialize
  override def deserialize(bytes: Array[Byte]): DenseHllBuffer = DenseHll.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): DenseHllState = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DenseHllState = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): DenseHllState =
    copy(child = c.head)
}
