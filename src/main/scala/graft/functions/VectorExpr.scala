package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

object VecImpl {
  /** Sequential left-fold dot product — the exact addition order of the
    * oracle's `list_reduce(list_cat([0.0], products), +)`, so cosines are
    * bit-identical to DuckDB's. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }
}

/** Native dot product over array<double> (SURVEY §2.3 L5–L7 hot path).
  * Spark's higher-order `aggregate`/`zip_with` are CodegenFallback
  * (interpreted per element); this stays inside whole-stage codegen and
  * is the difference between an interpreted 64-step lambda fold and a
  * tight primitive loop per pair at 100 TB.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecImpl$$.MODULE$$.dot($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

object VectorExpr {
  import org.apache.spark.sql.graft.Bridge.{column, expression}
  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
}
