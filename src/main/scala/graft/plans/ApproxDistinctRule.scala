package graft.plans

import graft.functions.KmvDistinct
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.expressions.{If, IsNull, Literal, XxHash64}
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: when `spark.graft.approxDistinct.enabled=true`,
  * rewrite exact `COUNT(DISTINCT x)` aggregates into the KMV sketch
  * (`kmv_distinct(xxhash64(x), k)`).
  *
  * This is the legitimate use of a custom Rule[LogicalPlan] in this
  * engine: the user's query stays declarative SQL, and an opt-in session
  * conf swaps the O(distinct-keys-over-the-shuffle) plan for the O(k)
  * sketch — the 100 TB escape hatch when exact cardinalities aren't
  * needed. Everything else in graft composes from built-ins, so no other
  * custom rule/strategy is warranted (SURVEY §3).
  */
case class ApproxDistinctRule(enabled: () => Boolean) extends Rule[LogicalPlan] {

  private val K = 4096 // ~1.6% standard error

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled()) return plan
    plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(children), Complete, true, _, _)
              if children.length == 1 =>
            // COUNT(DISTINCT) ignores NULLs, but xxhash64(NULL) is the
            // non-null seed — propagate NULL so the sketch skips it too
            val hashed = If(IsNull(children.head),
              Literal(null, LongType), new XxHash64(children))
            AggregateExpression(
              KmvDistinct(hashed, K),
              Complete,
              isDistinct = false,
              filter = ae.filter,
              resultId = ae.resultId)
        }
    }
  }
}
