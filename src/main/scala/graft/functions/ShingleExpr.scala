package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object Shingles3Impl {
  private val Space = UTF8String.fromString(" ")

  /** Distinct 3-word shingles, first-occurrence order — same set as
    * `array_distinct(transform(sequence(...), concat_ws(' ', w[i..i+2])))`
    * and the oracle's list_distinct/list_transform, but a single native
    * pass instead of interpreted lambda evals. Windows containing a null
    * word are skipped — the declared element type is containsNull=false,
    * and a null element would poison downstream codegen (explode, joins). */
  def eval(words: ArrayData): ArrayData = {
    val n = words.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var i = 0
    while (i <= n - 3) {
      val w0 = words.getUTF8String(i)
      val w1 = words.getUTF8String(i + 1)
      val w2 = words.getUTF8String(i + 2)
      if (w0 != null && w1 != null && w2 != null)
        seen.add(UTF8String.concat(w0, Space, w1, Space, w2))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

/** Native 3-gram shingling (SURVEY §2.3 L2/L3 hot path). The HOF
  * formulation was measured at ~38 s for 5 000 docs at sf0.1 — interpreted
  * lambdas, plus Catalyst pushing the explode's inferred filter below the
  * projection and re-inlining the whole expression. This is one tight
  * loop, stays in whole-stage codegen, and is cheap even when the
  * optimizer duplicates it into a pushed filter. */
case class Shingles3(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles3"

  override def nullSafeEval(input: Any): Any =
    Shingles3Impl.eval(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Shingles3Impl$$.MODULE$$.eval($c);")

  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}

object BigramsImpl {
  private val Space = UTF8String.fromString(" ")

  /** ALL adjacent word pairs, in order, WITH multiplicity (unlike the
    * distinct shingle set): the tf-weighted unit of the L39 familiarity
    * score. Pairs containing a null word are skipped (containsNull=false
    * contract, as Shingles3). */
  def eval(words: ArrayData): ArrayData = {
    val n = words.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](n - 1)
    var i = 0
    while (i <= n - 2) {
      val w0 = words.getUTF8String(i)
      val w1 = words.getUTF8String(i + 1)
      if (w0 != null && w1 != null) out.add(UTF8String.concat(w0, Space, w1))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Native adjacent-bigram expression (SURVEY §2.3 L39 hot path): one
  * tight whole-stage-codegen loop, for the same reason as Shingles3 —
  * the HOF formulation is interpreted and gets re-inlined by Catalyst. */
case class Bigrams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bigrams"

  override def nullSafeEval(input: Any): Any =
    BigramsImpl.eval(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BigramsImpl$$.MODULE$$.eval($c);")

  override protected def withNewChildInternal(newChild: Expression): Bigrams =
    copy(child = newChild)
}

object ShinglesNImpl {
  private val Space = UTF8String.fromString(" ")

  /** Distinct n-word shingles, first-occurrence order — the Shingles3
    * loop generalized (L72's 13-gram decontamination wash needs long
    * windows). Windows containing a null word are skipped. */
  def eval(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
    var i = 0
    while (i <= m - n) {
      var j = 0
      var ok = true
      val parts = new Array[UTF8String](2 * n - 1)
      while (ok && j < n) {
        val w = words.getUTF8String(i + j)
        if (w == null) ok = false
        else {
          if (j > 0) parts(2 * j - 1) = Space
          parts(2 * j) = w
        }
        j += 1
      }
      if (ok) seen.add(UTF8String.concat(parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

/** Native distinct n-gram shingling (whole-stage codegen, same rationale
  * as Shingles3). `n` is a plan-time constant. */
case class ShinglesN(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = s"shingles$n"

  override def nullSafeEval(input: Any): Any =
    ShinglesNImpl.eval(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShinglesNImpl$$.MODULE$$.eval($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShinglesN =
    copy(child = newChild)
}

object CdcChunksImpl {
  private val Space = UTF8String.fromString(" ")

  @inline private def joinRange(words: ArrayData, from: Int, len: Int): UTF8String = {
    val parts = new Array[UTF8String](2 * len - 1)
    var j = 0
    while (j < len) {
      val w = words.getUTF8String(from + j)
      if (j > 0) parts(2 * j - 1) = Space
      parts(2 * j) = if (w == null) UTF8String.EMPTY_UTF8 else w
      j += 1
    }
    UTF8String.concat(parts: _*)
  }

  /** Content-defined chunking (the rsync/CDC trick, SURVEY §2.3 L73): a
    * word position ends a chunk when the polynomial hash of the k-word
    * window ENDING there ≡ 0 (mod d); the last position always closes
    * the final chunk. Boundaries depend only on the k local words, so a
    * repeated span longer than k + chunk length yields IDENTICAL
    * interior chunks at ANY offset (self-synchronizing within k−1
    * words) — the property L33's fixed word grid lacks (an offset shift
    * misaligns every block). Expected chunk length ≈ d words. Emits the
    * chunks' space-joined strings in document order. */
  def eval(words: ArrayData, k: Int, d: Long, mult: Long, mod: Long): ArrayData = {
    val n = words.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](math.max(4, n / math.max(1, d.toInt)))
    var start = 0
    var i = 0
    while (i < n) {
      val isBp = i >= k - 1 &&
        PolyHash64Impl.hash(joinRange(words, i - k + 1, k), mult, mod) % d == 0L
      if (isBp || i == n - 1) {
        out.add(joinRange(words, start, i - start + 1))
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Native CDC chunker (whole-stage codegen, same rationale as Shingles3;
  * the window hash is the SAME (31, 1e9+7) char fold the DuckDB oracle
  * replays via polyHashSqlOf). `k` and `d` are plan-time constants. */
case class CdcChunks(child: Expression, k: Int, d: Long) extends UnaryExpression {
  require(k >= 1 && d >= 1, "window width and breakpoint divisor must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = s"cdc_chunks_${k}_$d"

  override def nullSafeEval(input: Any): Any =
    CdcChunksImpl.eval(input.asInstanceOf[ArrayData], k, d, 31L, 1000000007L)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcChunksImpl$$.MODULE$$.eval($c, $k, ${d}L, 31L, 1000000007L);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object ShingleExpr {
  import org.apache.spark.sql.graft.Bridge.{column, expression}
  def shingles3(words: Column): Column = column(Shingles3(expression(words)))
  def bigrams(words: Column): Column = column(Bigrams(expression(words)))
  def shinglesN(words: Column, n: Int): Column = column(ShinglesN(expression(words), n))
  def cdcChunks(words: Column, k: Int, d: Long): Column =
    column(CdcChunks(expression(words), k, d))
}
