package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sweeping plan-quality audit: no query in the inventory may plan an
  * (unbroadcast) cartesian product — the one join shape that cannot
  * survive a 100 TB scale-up. BroadcastNestedLoopJoin is allowed where a
  * bounded side is broadcast by construction (ANN probe sets). */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("no CartesianProduct in any declared query plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan =
        try fn(spark, dir).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLAN_FAILED: $e" }
      if (plan.contains("CartesianProduct")) Some(name)
      else if (plan.startsWith("PLAN_FAILED")) Some(s"$name ($plan)")
      else None
    }
    assert(offenders.isEmpty, s"cartesian or failed plans: $offenders")
  }
}
