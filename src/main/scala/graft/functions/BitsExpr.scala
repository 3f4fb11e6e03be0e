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

object BitsExpr {
  import org.apache.spark.sql.graft.Bridge.{column, expression}

  def doubleBits(c: Column): Column = column(DoubleBits(expression(c)))

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
