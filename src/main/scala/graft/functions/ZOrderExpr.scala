package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave of two int columns: the sort key for
  * locality-clustered compaction. Sorting by the z-value gives every
  * output file a tight min/max box on BOTH dimensions, so manifest data
  * skipping prunes on either column — the multi-column clustering the
  * reference format gets from its sort-key compaction. Ints map through
  * an order-preserving unsigned flip (x ^ MIN_VALUE) before bit
  * interleave. Native codegen: compaction is a full-table rewrite, so
  * the per-row cost is a 100 TB-scale concern, not a detail. */
case class ZOrder64(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "z_order64"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder64Impl.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder64Impl$$.MODULE$$.interleave($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZOrder64 =
    copy(left = newLeft, right = newRight)
}

object ZOrder64Impl {
  /** Interleaves the unsigned-flipped bits of a (odd positions) and b
    * (even positions) into one 64-bit z-value. */
  def interleave(a: Int, b: Int): Long = {
    val ua = (a ^ Int.MinValue).toLong & 0xffffffffL
    val ub = (b ^ Int.MinValue).toLong & 0xffffffffL
    // all 64 bits are used, so flip the top bit: the z-domain is
    // unsigned, but the sort key is a signed long
    (spread(ua) << 1 | spread(ub)) ^ Long.MinValue
  }

  /** Spreads the low 32 bits of x into the even bit positions of a long
    * (the standard Morton bit-twiddle, no loop). */
  private def spread(x: Long): Long = {
    var v = x & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }
}

object ZOrderExpr {
  import org.apache.spark.sql.graft.Bridge.{column, expression}
  def zvalue(a: Column, b: Column): Column =
    column(ZOrder64(expression(a), expression(b)))
}
