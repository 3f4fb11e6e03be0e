package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's Unicode CODE POINTS:
  * `acc = (acc * mult + cp) % mod` (mod 0 ⇒ wrapping 64-bit). Code
  * points (not UTF-16 units) so the DuckDB oracle's per-character ord()
  * matches even for supplementary-plane text (emoji, CJK ext-B).
  *
  * A native Catalyst expression with real codegen so document
  * fingerprinting stays inside whole-stage codegen at 100 TB — the
  * preferred extension point over a Scala UDF (which would box every row).
  * The DuckDB oracle replicates it with
  * `list_reduce(ord-per-char, (a,c) -> (a*31+c)%mod)`.
  */
case class PolyHash64(child: Expression, mult: Long, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash64"

  override def nullSafeEval(input: Any): Any =
    PolyHash64Impl.hash(input.asInstanceOf[UTF8String], mult, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyHash64Impl$$.MODULE$$.hash($c, ${mult}L, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)
}

object PolyHash64Impl {
  /** Code-point fold, single pass over the UTF-16 buffer. */
  def hash(u: UTF8String, mult: Long, mod: Long): Long = {
    val s = u.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = acc * mult + cp
      if (mod > 0) acc %= mod
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Presto's `key_sampling_percent(varchar)` → DOUBLE in [0,1): a
  * deterministic per-key sampling coordinate, so `WHERE
  * key_sampling_percent(k) < 0.1` keeps a consistent ~10% of KEYS
  * across tables and across a join chain (ref paimon-presto
  * PrestoDistributedQueryTest.java:629 testKeyBasedSampling, :979
  * testSamplingJoinChain — both skipped there; the Presto-engine
  * function this re-expresses).
  *
  * Built on the repo's oracle-expressible sampling discipline
  * (GraftV2.sampleBucket): the poly fold of NEAR-IDENTICAL keys is
  * SEQUENTIAL, so the raw hash must be finished with the Fibonacci
  * multiplicative mix `(h * 2654435761) mod 2^32` before scaling —
  * all intermediates < 2^46 stay exact BIGINTs in both engines, and
  * the final division by 2^32 is a power-of-two scale (EXACT in
  * IEEE double), so a DuckDB oracle replays the value bit-for-bit. */
case class KeySamplingPercent(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "key_sampling_percent"
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"key_sampling_percent takes a STRING key, got ${child.dataType.sql} — " +
        "cast explicitly so numeric keys are rendered deterministically")
  override def nullSafeEval(input: Any): Any =
    KeySamplingPercentImpl.pct(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.KeySamplingPercentImpl$$.MODULE$$.pct($c);")
  override protected def withNewChildInternal(newChild: Expression): KeySamplingPercent =
    copy(child = newChild)
}

object KeySamplingPercentImpl {
  def pct(u: UTF8String): Double = {
    val h = PolyHash64Impl.hash(u, 31L, 1000000007L)
    ((h * 2654435761L) % 4294967296L).toDouble / 4294967296.0
  }
}

object SimHash64Impl {
  /** Fused words→simhash: hashes each word with the wrapping FNV-style
    * polynomial (same arithmetic as PolyHash64Impl.hash(mult,0)) and
    * feeds the per-bit vote in a single pass — no intermediate
    * array<long> materialization and no interpreted HOF lambda (the
    * ArrayTransform formulation is CodegenFallback; measured 17-30×
    * slower in SURVEY §4). */
  def computeWords(words: ArrayData, mult: Long): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = words.numElements()
    while (i < n) {
      val h = PolyHash64Impl.hash(words.getUTF8String(i), mult, 0L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** 64-bit SimHash of pre-hashed tokens: per-bit vote ±1, sign → bit. */
  def compute(hashes: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = hashes.numElements()
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}

/** SimHash over an array of 64-bit token hashes (SURVEY §2.3 L4).
  * Codegen calls the static impl directly, so it stays inside
  * whole-stage codegen without per-row boxing. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sim_hash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64Impl.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64Impl$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object HashedScoreImpl {
  /** L69: hashed-bag-of-words linear score — each word hashes into one
    * of `buckets` feature slots (the oracle-replayable mod-1e9+7
    * polynomial) and contributes that slot's deterministic pseudo-weight
    * `(slot*a + c) % m - m/2`; the doc's score is the plain sum. One
    * tight pass per doc, no interpreted per-token lambda (the SimHash
    * lesson). The weight schedule stands in for trained classifier
    * weights — swapping in a learned table changes one array lookup,
    * none of the Spark-side shape. */
  def score(words: ArrayData, buckets: Int, a: Int, c: Int, m: Int): Long = {
    var s = 0L
    val shift = m / 2
    var i = 0
    val n = words.numElements()
    while (i < n) {
      val slot = PolyHash64Impl.hash(words.getUTF8String(i), 31L, 1000000007L) % buckets
      s += (slot * a + c) % m - shift
      i += 1
    }
    s
  }
}

object HashedTableScoreImpl {
  /** L69 learned-weights form: each word hashes into slot
    * `polyHash % weights.length` and contributes the TABLE's weight —
    * the production surface where a trained classifier's weights
    * replace the deterministic pseudo-schedule. Same single codegen
    * pass per doc; the table rides the serialized plan (bounded — a
    * hashed-BoW model is a few hundred slots, the fastText trick). */
  def score(words: ArrayData, weights: Array[Long]): Long = {
    var s = 0L
    var i = 0
    val n = words.numElements()
    while (i < n) {
      val slot = PolyHash64Impl.hash(words.getUTF8String(i), 31L, 1000000007L) %
        weights.length
      s += weights(slot.toInt)
      i += 1
    }
    s
  }
}

/** [[HashedWeightSum]] with a LEARNED slot→weight table instead of the
  * baked pseudo-schedule (SURVEY §2.3 L69's trained form). The table is
  * a plan-time constant shipped inside the expression — the right
  * transport for a classifier of ≤ a few thousand weights (a bigger
  * model is a broadcast join, not a scalar expression). */
case class HashedWeightTableSum(child: Expression, weights: Seq[Long])
  extends UnaryExpression {

  require(weights.nonEmpty, "weight table must be non-empty")
  private lazy val weightArr: Array[Long] = weights.toArray

  override def dataType: DataType = LongType
  override def prettyName: String = "hashed_weight_table_sum"

  override def nullSafeEval(input: Any): Any =
    HashedTableScoreImpl.score(input.asInstanceOf[ArrayData], weightArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("weights", weightArr, "long[]")
    nullSafeCodeGen(ctx, ev, cIn =>
      s"${ev.value} = graft.functions.HashedTableScoreImpl$$.MODULE$$.score($cIn, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedWeightTableSum =
    copy(child = newChild)
}

/** Fused words→hashed-linear-classifier score in one codegen pass
  * (SURVEY §2.3 L69 — the fastText-style quality-filter shape). */
case class HashedWeightSum(child: Expression, buckets: Int, a: Int, c: Int, m: Int)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hashed_weight_sum"

  override def nullSafeEval(input: Any): Any =
    HashedScoreImpl.score(input.asInstanceOf[ArrayData], buckets, a, c, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, cIn =>
      s"${ev.value} = graft.functions.HashedScoreImpl$$.MODULE$$" +
        s".score($cIn, $buckets, $a, $c, $m);")

  override protected def withNewChildInternal(newChild: Expression): HashedWeightSum =
    copy(child = newChild)
}

/** Fused SimHash over an array<string> of words: token hash + bit vote in
  * one codegen pass (SURVEY §2.3 L4). Equivalent to
  * `SimHash64(transform(words, tokenHash64))` but stays inside
  * whole-stage codegen — ArrayTransform is CodegenFallback and its
  * interpreted lambda was the hot path of q_dedup_simhash. */
case class SimHashWords(child: Expression, mult: Long) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sim_hash_words"

  override def nullSafeEval(input: Any): Any =
    SimHash64Impl.computeWords(input.asInstanceOf[ArrayData], mult)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64Impl$$.MODULE$$.computeWords($c, ${mult}L);")

  override protected def withNewChildInternal(newChild: Expression): SimHashWords =
    copy(child = newChild)
}

/** Per-entry hashes of a map column for the bloom-filter file index —
  * the write-side half of map-subscript file pruning (ref:
  * PrestoSessionProperties.java:38 range_filters_on_subscripts_enabled).
  * Each non-null entry hashes as XxHash64 (seed 42, Spark's default)
  * over the UTF-8 string "key\u0000value" rendered from the Catalyst
  * values; the planner hashes a subscript predicate's (key, value)
  * literals with [[MapEntryHashesImpl.hashEntry]], the same convention.
  * Null map values are skipped: `element_at(m, k) = v` can never match
  * them, so their absence from the filter is sound.
  *
  * Native codegen (one virtual call per row, loop in compiled JVM code)
  * so the write path stays inside whole-stage codegen. */
case class MapEntryHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "map_entry_hashes"

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case m: MapType =>
      MapEntryHashesImpl.hash(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData], m.keyType, m.valueType)
    case a: ArrayType =>
      MapEntryHashesImpl.hashArray(
        input.asInstanceOf[ArrayData], a.elementType)
    case s: StructType =>
      MapEntryHashesImpl.hashStruct(
        input.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow], s)
    case other => throw new IllegalStateException(s"unsupported child type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case m: MapType =>
        val kt = ctx.addReferenceObj("kt", m.keyType)
        val vt = ctx.addReferenceObj("vt", m.valueType)
        nullSafeCodeGen(ctx, ev, c =>
          s"${ev.value} = graft.functions.MapEntryHashesImpl$$.MODULE$$.hash($c, $kt, $vt);")
      case a: ArrayType =>
        val et = ctx.addReferenceObj("et", a.elementType)
        nullSafeCodeGen(ctx, ev, c =>
          s"${ev.value} = graft.functions.MapEntryHashesImpl$$.MODULE$$.hashArray($c, $et);")
      case s: StructType =>
        val st = ctx.addReferenceObj("st", s)
        nullSafeCodeGen(ctx, ev, c =>
          s"${ev.value} = graft.functions.MapEntryHashesImpl$$.MODULE$$.hashStruct($c, $st);")
      case other => throw new IllegalStateException(s"unsupported child type $other")
    }

  override protected def withNewChildInternal(newChild: Expression): MapEntryHashes =
    copy(child = newChild)
}

object MapEntryHashesImpl {
  /** Map key/value types whose write-side Catalyst rendering provably
    * equals the plan-side literal rendering (both are the JVM toString
    * of the same Catalyst value class). Anything else makes no pruning
    * claim — a rendering mismatch would be a bloom FALSE NEGATIVE,
    * i.e. unsound pruning. */
  val SafeTypes: Set[DataType] =
    Set(StringType, IntegerType, LongType, ShortType, ByteType, BooleanType)

  def subscriptSafe(dt: DataType): Boolean = dt match {
    case m: MapType => SafeTypes(m.keyType) && SafeTypes(m.valueType)
    // struct (row) subscripts (ref testRowSubscript, `r.f = v`): entries
    // hash as (field name, value) — only SafeType leaves are hashed, and
    // the plan side claims per-LEAF (see SubscriptFilterRule), so a
    // struct qualifies when any leaf is claimable
    case s: StructType => s.fields.exists(f => SafeTypes(f.dataType))
    // array subscripts (ref `a[2] = 5`): entries hash as
    // (1-based position, value) — the position IS the key
    case a: ArrayType => SafeTypes(a.elementType)
    case _ => false
  }

  /** The shared entry-hash convention (both sides). */
  def hashEntry(key: String, value: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      UTF8String.fromString(key + "\u0000" + value), StringType, 42L)

  /** Array entries hash as (1-based position, value) — matching Presto
    * and Spark element_at subscripts; null elements are skipped (a
    * subscript equality can never match null). */
  def hashArray(a: ArrayData, et: DataType): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    var written = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        out(written) = hashEntry((i + 1).toString, a.get(i, et).toString)
        written += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (written == n) out else java.util.Arrays.copyOf(out, written))
  }

  /** Struct entries hash as (field name, value) for SafeType leaves —
    * the row-subscript analogue of the map convention; null leaves are
    * skipped (an equality can never match null) and non-SafeType leaves
    * make no claim (the plan side never renders them). */
  def hashStruct(row: org.apache.spark.sql.catalyst.InternalRow, st: StructType): ArrayData = {
    val n = st.length
    val out = new Array[Long](n)
    var i = 0
    var written = 0
    while (i < n) {
      val f = st.fields(i)
      if (SafeTypes(f.dataType) && !row.isNullAt(i)) {
        out(written) = hashEntry(f.name, row.get(i, f.dataType).toString)
        written += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (written == n) out else java.util.Arrays.copyOf(out, written))
  }

  def hash(m: org.apache.spark.sql.catalyst.util.MapData,
      kt: DataType, vt: DataType): ArrayData = {
    val ks = m.keyArray()
    val vs = m.valueArray()
    val n = m.numElements()
    val out = new Array[Long](n)
    var i = 0
    var written = 0
    while (i < n) {
      if (!vs.isNullAt(i)) { // map keys are never null in Spark
        out(written) = hashEntry(ks.get(i, kt).toString, vs.get(i, vt).toString)
        written += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (written == n) out else java.util.Arrays.copyOf(out, written))
  }
}

object HashExpr {
  import org.apache.spark.sql.graft.Bridge.{column, expression}

  /** Fingerprint matching the DuckDB-expressible polynomial (mult 31,
    * mod 1e9+7) — oracle-checkable. */
  def polyHash(c: Column): Column =
    column(PolyHash64(expression(c), 31L, 1000000007L))

  /** Wrapping 64-bit FNV-style hash — full-width bits for SimHash. */
  def tokenHash64(c: Column): Column =
    column(PolyHash64(expression(c), 1099511628211L, 0L))

  /** Presto key_sampling_percent: deterministic per-key double in [0,1). */
  def keySamplingPercent(c: Column): Column =
    column(KeySamplingPercent(expression(c)))

  def simHash(c: Column): Column = column(SimHash64(expression(c)))

  /** L69 hashed-bag-of-words linear score (64 slots, weights in
    * [-10, 10] from the (37, 11, 21) schedule). */
  def hashedScore(words: Column): Column =
    column(HashedWeightSum(expression(words), 64, 37, 11, 21))

  /** L69 learned form: score against a trained slot→weight table (see
    * [[graft.operators.TextOps.trainLinearWeights]] for the trainer). */
  def hashedScoreWeights(words: Column, weights: Seq[Long]): Column =
    column(HashedWeightTableSum(expression(words), weights))

  /** Fused words→simhash with the tokenHash64 polynomial. */
  def simHashWords(c: Column): Column =
    column(SimHashWords(expression(c), 1099511628211L))

  /** Per-entry bloom hashes of a map/array column (the write-side half
    * of subscript file pruning; also used by rewrite_file_index, S47). */
  def mapEntryHashes(c: Column): Column = column(MapEntryHashes(expression(c)))
}
