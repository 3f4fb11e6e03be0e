package graft

import graft.plans.ApproxDistinctRule
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom optimizer Rule via extension point: opt-in rewrite of exact
  * COUNT(DISTINCT) to the KMV sketch. */
class ApproxRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("rule rewrites count(distinct) to kmv sketch only when enabled") {
    spark.experimental.extraOptimizations = Seq(ApproxDistinctRule(() =>
      spark.conf.get("spark.graft.approxDistinct.enabled", "false").toBoolean))
    try {
      val q = Tables.lineitem(spark, dir).agg(countDistinct(col("l_partkey")).as("n"))
      val exact = q.first().getLong(0)

      spark.conf.set("spark.graft.approxDistinct.enabled", "true")
      val approxQ = Tables.lineitem(spark, dir).agg(countDistinct(col("l_partkey")).as("n"))
      val plan = approxQ.queryExecution.optimizedPlan.toString
      assert(plan.contains("kmv_distinct"), plan)
      val approx = approxQ.first().getLong(0)
      assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")

      // NULLs must not count as a distinct value (xxhash64(NULL) = seed)
      import spark.implicits._
      val withNulls = Seq(Some("a"), Some("b"), None, None).toDF("x")
      assert(withNulls.agg(countDistinct(col("x"))).first().getLong(0) == 2)

      spark.conf.set("spark.graft.approxDistinct.enabled", "false")
      val back = Tables.lineitem(spark, dir).agg(countDistinct(col("l_partkey")).as("n"))
      assert(!back.queryExecution.optimizedPlan.toString.contains("kmv_distinct"))
      assert(back.first().getLong(0) == exact)
    } finally {
      spark.conf.set("spark.graft.approxDistinct.enabled", "false")
      spark.experimental.extraOptimizations = Nil
    }
  }
}
