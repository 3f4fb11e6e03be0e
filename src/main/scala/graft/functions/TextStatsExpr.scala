package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One fused byte pass over a STRING computing the three per-document
  * stats the curation queries derive from three separate passes today:
  *
  *   ntok  ≡ size(split(trim(text), "\\s+"))          (Spark split, limit -1)
  *   alnum ≡ length(regexp_replace(text, "[^A-Za-z0-9]", ""))
  *   len   ≡ length(text)
  *
  * The composed form pays a regex engine walk PLUS a stripped copy of
  * every text for `alnum`, and a token-array materialization for `ntok`;
  * this expression allocates nothing and reads each byte once.
  *
  * Exactness arguments (each is byte-level sound in UTF-8):
  *  - `trim` removes ASCII space 0x20 only (UTF8String.trim) — mirrored.
  *  - Java regex `\s` = [ \t\n\x0B\f\r] (ASCII-only by default); all are
  *    single bytes, and UTF-8 continuation/lead bytes are ≥ 0x80, so a
  *    byte-level whitespace scan can never split a multi-byte char.
  *  - split with limit -1 KEEPS trailing empty pieces, so the piece
  *    count is exactly (number of maximal \s runs) + 1, and "" → 1.
  *  - [A-Za-z0-9] are single bytes; counting matching BYTES equals
  *    counting matching code points.
  *  - length() counts code points = bytes with (b & 0xC0) != 0x80.
  *
  * Pinned against the composed builtins by TextStatsSpec. */
case class TextStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TextStatsImpl.Schema
  override def prettyName: String = "text_stats"
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"text_stats takes STRING, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    TextStatsImpl.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextStatsImpl$$.MODULE$$.compute($c);")
  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStatsImpl {
  val Schema: StructType = StructType(Seq(
    StructField("ntok", LongType, nullable = false),
    StructField("alnum", LongType, nullable = false),
    StructField("len", LongType, nullable = false)))

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)
  @inline private def isAlnum(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')

  def compute(u: UTF8String): InternalRow = {
    val n = u.numBytes()
    val base = u.getBaseObject
    val off = u.getBaseOffset
    var len = 0L
    var alnum = 0L
    var i = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if ((b & 0xC0) != 0x80) len += 1
      if (isAlnum(b)) alnum += 1
      i += 1
    }
    // trim = strip 0x20 from both ends (UTF8String.trim semantics)
    var lo = 0
    while (lo < n &&
      org.apache.spark.unsafe.Platform.getByte(base, off + lo) == 0x20) lo += 1
    var hi = n
    while (hi > lo &&
      org.apache.spark.unsafe.Platform.getByte(base, off + hi - 1) == 0x20) hi -= 1
    // pieces of split(s, "\s+", -1) = maximal \s runs + 1 (empty s → 1)
    var runs = 0L
    var inWs = false
    i = lo
    while (i < hi) {
      val ws = isWs(org.apache.spark.unsafe.Platform.getByte(base, off + i))
      if (ws && !inWs) runs += 1
      inWs = ws
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](runs + 1L, alnum, len))
  }
}

object TextStatsExpr {
  import org.apache.spark.sql.graft.Bridge.{column, expression}

  /** struct(ntok, alnum, len) in one byte pass — see [[TextStats]]. */
  def textStats(c: Column): Column = column(TextStats(expression(c)))
}
