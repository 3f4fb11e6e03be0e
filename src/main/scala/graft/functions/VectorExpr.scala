package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

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

  /** Element-wise quantization to integer-valued doubles: x →
    * sign(x)·floor(|x·scale| + 0.5). The formula is chosen for exact
    * ENGINE PARITY, not ideal rounding: floor/abs/negate are exact IEEE
    * ops, so a DuckDB `CASE WHEN v >= 0 THEN floor(v+0.5) ELSE
    * -floor(-v+0.5) END` over the same doubles is bit-identical — which
    * is what lets cross-row sums of the result be exact (integers below
    * 2^53 add associatively) and k-means centroids replay in SQL. */
  def quantize(a: ArrayData, scale: Double): ArrayData = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val x = a.getDouble(i) * scale
      out(i) = if (x >= 0) math.floor(x + 0.5) else -math.floor(-x + 0.5)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native per-element quantizer over array<double> (SURVEY §2.3 L26) —
  * stays in whole-stage codegen (a `transform(v, ...)` HOF formulation
  * is interpreted per element and re-runs corpus-wide every Lloyd's
  * round). */
case class QuantizeVec(child: Expression, scale: Double) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_quantize"

  // strict array<double>: the kernel reads 8-byte slots, so an
  // array<int> child would yield garbage doubles (UnsafeArrayData) or a
  // mid-job ClassCastException — fail analysis instead (callers cast)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_quantize requires array<double>, got ${other.sql} — cast explicitly")
    }

  override def nullSafeEval(input: Any): Any =
    VecImpl.quantize(input.asInstanceOf[ArrayData], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VecImpl$$.MODULE$$.quantize($c, $scale);")

  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
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

object Dequant8Impl {
  /** Fused int8 scalar quantize→dequantize (SURVEY §2.3 L40): per-vector
    * [min,max] range mapped onto 256 levels, each element snapped to its
    * level's reconstruction value — the value an int8-compressed ANN
    * index would search over (codes cost 1 byte/dim vs 8: the ×8 memory
    * lever for 100 TB vector search; fidelity is bounded by range/255
    * per element). Every op (min/max select, one divide, subtract,
    * floor(x+0.5), multiply, add) is an exact-parity IEEE sequence the
    * oracle mirrors literally with list_min/list_max/list_transform;
    * codes from (x-mn)/scale are always >= 0, so the plain floor(x+0.5)
    * half of the QuantizeVec parity formula applies. A constant vector
    * (mx == mn, scale 0) reconstructs as all-mn. */
  def eval(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      if (x < mn) mn = x
      if (x > mx) mx = x
      i += 1
    }
    val out = new Array[Double](n)
    val scale = (mx - mn) / 255.0
    i = 0
    while (i < n) {
      out(i) =
        if (scale == 0) mn
        else mn + math.floor((a.getDouble(i) - mn) / scale + 0.5) * scale
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native fused int8 quantize→dequantize over array<double> — one tight
  * whole-stage-codegen pass (HOF min/max + transform would be three
  * interpreted walks). */
case class Dequant8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_dequant8"

  override def nullSafeEval(input: Any): Any =
    Dequant8Impl.eval(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Dequant8Impl$$.MODULE$$.eval($c);")

  override protected def withNewChildInternal(newChild: Expression): Dequant8 =
    copy(child = newChild)
}

object VectorExpr {
  import org.apache.spark.sql.graft.Bridge.{column, expression}
  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** Fused int8 scalar quantize→dequantize (see [[Dequant8Impl]]). */
  def dequant8(a: Column): Column = column(Dequant8(expression(a)))

  /** Quantize an array<double> column to integer-valued doubles (see
    * [[VecImpl.quantize]] for the parity-exact rounding formula). */
  def quantize(a: Column, scale: Double): Column =
    column(QuantizeVec(expression(a), scale))
}
