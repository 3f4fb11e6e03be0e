package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** `java.lang.Double.doubleToLongBits(v)` as a codegen'd Catalyst
  * expression — the order-preserving backbone of histogram-based order
  * statistics: for the sign-adjusted form (see
  * [[graft.operators.Percentiles]]) ascending signed-long order equals
  * ascending IEEE double order (with -0.0 < 0.0 and canonical NaN
  * last), so a coarse top-bits bucket of the adjusted value is a
  * rank-correct histogram key computable inside whole-stage codegen.
  * Per-element hot path ⇒ native expression, not a UDF (CLAUDE.md). */
case class DoubleBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "double_bits"
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"double_bits takes DOUBLE, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    java.lang.Double.doubleToLongBits(input.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = java.lang.Double.doubleToLongBits($c);")
  override protected def withNewChildInternal(newChild: Expression): DoubleBits =
    copy(child = newChild)
}

/** The first 60 bits of md5(utf8(s)) as a non-negative BIGINT —
  * bit-identical to `CAST(conv(substr(md5(s), 1, 15), 16, 10) AS
  * BIGINT)` (and DuckDB's `('0x' || substr(md5(s),1,15))::BIGINT`),
  * fused into one pass: no 32-char hex rendering, no substring, no
  * base-16 string parse, and the MessageDigest instance is reused per
  * thread instead of looked up per row (DigestUtils.md5Hex constructs
  * one per call). The checksum render itself stays ordinary Spark SQL —
  * the rendered TEXT is the cross-engine contract; only the
  * hash-to-long tail fuses. */
case class Md5Bits60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_bits60"
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"md5_bits60 takes STRING, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    Md5Bits60Impl.hash(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Bits60Impl$$.MODULE$$.hash($c);")
  override protected def withNewChildInternal(newChild: Expression): Md5Bits60 =
    copy(child = newChild)
}

object Md5Bits60Impl {
  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of the digest = bytes 0..6 whole + the HIGH
    * nibble of byte 7 — always < 2^60, so the value is non-negative. */
  def hash(u: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = localMd.get()
    md.reset()
    val d = md.digest(u.getBytes)
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    (acc << 4) | ((d(7) & 0xf0L) >> 4)
  }
}

object BitsExpr {
  import org.apache.spark.sql.graft.Bridge.{column, expression}

  def doubleBits(c: Column): Column = column(DoubleBits(expression(c)))

  /** First 60 bits of md5 as BIGINT (≡ conv(substr(md5(x),1,15),16,10)). */
  def md5Bits60(c: Column): Column = column(Md5Bits60(expression(c)))

  /** Sign-adjusted IEEE bits: ascending signed-long order ≡ ascending
    * double order (total order; -0.0 < 0.0, NaN last). */
  def orderedBits(c: Column): Column = {
    import org.apache.spark.sql.functions.{lit, shiftright}
    val b = doubleBits(c)
    b.bitwiseXOR(shiftright(b, 63).bitwiseAND(lit(Long.MaxValue)))
  }

  /** The driver-side mirror of [[orderedBits]]. */
  def orderedBitsOf(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v)
    b ^ ((b >> 63) & Long.MaxValue)
  }
}
