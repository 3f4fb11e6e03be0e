// Lives in the sql bridge package (like Bridge): HigherOrderFunction's
// argumentTypes/functionTypes signatures name the private[sql]
// AbstractDataType, which an override outside org.apache.spark.sql
// cannot write.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, HigherOrderFunction, LambdaFunction, NamedLambdaVariable, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{AbstractDataType, AnyDataType, DataType}

/** Mutable fold cell for [[ReduceAgg]] — one Catalyst value of the state
  * type plus a seen flag. `seen = false` means "no input folded yet": an
  * unseen partial merges as a NO-OP, so the accidental count of EMPTY
  * partials (shuffle partitions that saw no rows of the group) can never
  * leak into the result, and an empty GROUP evaluates to the initial
  * state. Each partial that does see input seeds the initial once before
  * its first fold — which is why `initialState` must be a
  * combineFunction identity (the same contract as Presto's reduce_agg):
  * a non-identity initial is counted once per data-bearing partial, a
  * partitioning accident. */
final class ReduceHolder(var seen: Boolean, var value: Any)

object ReduceAgg {

  /** The user-facing fold aggregate, Presto-shaped:
    *
    *   reduceAgg(col, lit(0L), "(s, x) -> s + x * x", "(a, b) -> a + b")
    *
    * The lambda texts parse through the CATALYST SQL parser into plain
    * LambdaFunctions and the expression is assembled directly — NOT
    * registered as a SQL function name: Spark 4's ResolveFunctions
    * hard-rejects lambda arguments whose resolved function is not
    * itself a HigherOrderFunction, and its validateFunction wraps every
    * AggregateFunction into an AggregateExpression BEFORE that check
    * (NON_HIGHER_ORDER_FUNCTION), so an aggregate HOF cannot resolve
    * through any function registry — only through direct construction.
    * ResolveLambdaVariables still binds the variables (it matches the
    * HigherOrderFunction inside the AggregateExpression), so the bodies
    * type-check against the real input/state types at analysis. */
  def reduceAgg(
      input: org.apache.spark.sql.Column,
      initial: org.apache.spark.sql.Column,
      inputFn: String,
      combineFn: String): org.apache.spark.sql.Column = {
    def lam(text: String): Expression =
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(text) match {
        case l: LambdaFunction => l
        case other => throw new IllegalArgumentException(
          s"reduce_agg expects a lambda like '(s, x) -> s + x', got: ${other.sql}")
      }
    Bridge.column(
      ReduceAgg(Bridge.expression(input), Bridge.expression(initial),
        lam(inputFn), lam(combineFn)).toAggregateExpression())
  }
}

/** R72: Presto's `reduce_agg(inputValue, initialState, inputFunction,
  * combineFunction)` (ref PrestoDistributedQueryTest :894) — the GENERIC
  * user-programmable fold aggregate, re-expressed as a
  * TypedImperativeAggregate (the L15 mergeable-summary skeleton) that is
  * ALSO a HigherOrderFunction, so the analyzer's standard lambda-binding
  * pass resolves the SQL lambdas:
  *
  *   reduce_agg(x, 0L, (s, x) -> s + x * x, (a, b) -> a + b)
  *
  * Distribution contract (same as Presto's): `inputFunction` folds one
  * input into a state, `combineFunction` merges two states — partial
  * states combine map-side, so ONE state value per group crosses the
  * shuffle regardless of group size. The result is deterministic only
  * when the fold is commutative-associative (input order is arbitrary
  * under any parallel engine). The lambda bodies may reference ONLY
  * their lambda variables (a combine has no input row to read other
  * columns from). NULL input values are skipped; an empty fold returns
  * the initial state; `initialState` must be a combineFunction IDENTITY
  * (see [[ReduceHolder]] — Presto's contract, for the same reason).
  * Both lambda bodies must return exactly the state type — checked at
  * analysis, with a cast hint.
  *
  * The fold body is Catalyst-interpreted per row (a user lambda cannot
  * whole-stage-codegen) — reduce_agg is the ad-hoc/escape-hatch fold;
  * hot-path folds belong in native expressions per the repo rule.
  */
case class ReduceAgg(
    input: Expression,
    initial: Expression,
    inputFn: Expression,
    combineFn: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ReduceHolder] with HigherOrderFunction {

  private def stateType: DataType = initial.dataType

  override def prettyName: String = "reduce_agg"
  override def dataType: DataType = stateType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = arguments ++ functions

  override def arguments: Seq[Expression] = Seq(input, initial)
  override def argumentTypes: Seq[AbstractDataType] = Seq(AnyDataType, AnyDataType)
  override def functions: Seq[Expression] = Seq(inputFn, combineFn)
  override def functionTypes: Seq[AbstractDataType] = Seq(AnyDataType, AnyDataType)

  override def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): ReduceAgg =
    copy(
      inputFn = f(inputFn, (stateType, true) :: (input.dataType, input.nullable) :: Nil),
      combineFn = f(combineFn, (stateType, true) :: (stateType, true) :: Nil))

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!initial.foldable) {
      return TypeCheckResult.TypeCheckFailure(
        "reduce_agg initialState must be a literal/foldable value")
    }
    (inputFn, combineFn) match {
      case (i: LambdaFunction, c: LambdaFunction) if i.resolved && c.resolved =>
        if (i.dataType != stateType) {
          TypeCheckResult.TypeCheckFailure(
            s"reduce_agg inputFunction returns ${i.dataType.sql} but the state is " +
              s"${stateType.sql} — cast the body (or the initial state) so they agree")
        } else if (c.dataType != stateType) {
          TypeCheckResult.TypeCheckFailure(
            s"reduce_agg combineFunction returns ${c.dataType.sql} but the state is " +
              s"${stateType.sql} — cast the body (or the initial state) so they agree")
        } else TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckSuccess // lambdas not bound yet
    }
  }

  // lambda variable cells (shared with the functionsForEval copies — the
  // HOF machinery rewrites eval bodies to reference these instances)
  @transient private lazy val LambdaFunction(_,
    Seq(foldStateVar: NamedLambdaVariable, foldInputVar: NamedLambdaVariable), _) = inputFn
  @transient private lazy val LambdaFunction(_,
    Seq(combLeftVar: NamedLambdaVariable, combRightVar: NamedLambdaVariable), _) = combineFn
  @transient private lazy val Seq(foldForEval, combForEval) = functionsForEval

  override def createAggregationBuffer(): ReduceHolder =
    new ReduceHolder(false, null)

  override def update(buf: ReduceHolder, row: InternalRow): ReduceHolder = {
    val x = input.eval(row)
    if (x != null) {
      if (!buf.seen) {
        buf.seen = true
        buf.value = InternalRow.copyValue(initial.eval(InternalRow.empty))
      }
      foldStateVar.value.set(buf.value)
      foldInputVar.value.set(x)
      buf.value = InternalRow.copyValue(foldForEval.eval(row))
    }
    buf
  }

  override def merge(buf: ReduceHolder, other: ReduceHolder): ReduceHolder = {
    if (other.seen) {
      if (!buf.seen) { buf.seen = true; buf.value = other.value }
      else {
        combLeftVar.value.set(buf.value)
        combRightVar.value.set(other.value)
        buf.value = InternalRow.copyValue(combForEval.eval(InternalRow.empty))
      }
    }
    buf
  }

  override def eval(buf: ReduceHolder): Any =
    if (buf.seen) buf.value
    else InternalRow.copyValue(initial.eval(InternalRow.empty))

  @transient private lazy val stateProjection =
    UnsafeProjection.create(Array(stateType))

  override def serialize(buf: ReduceHolder): Array[Byte] = {
    if (!buf.seen) return Array.emptyByteArray
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](buf.value))
    stateProjection.apply(row).getBytes
  }

  override def deserialize(bytes: Array[Byte]): ReduceHolder = {
    if (bytes.isEmpty) return new ReduceHolder(false, null)
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    new ReduceHolder(true, InternalRow.copyValue(row.get(0, stateType)))
  }

  override def withNewMutableAggBufferOffset(o: Int): ReduceAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ReduceAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ReduceAgg =
    copy(input = c(0), initial = c(1), inputFn = c(2), combineFn = c(3))
}
