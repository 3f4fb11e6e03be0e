package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sweeping plan-quality audit: no query in the inventory may plan an
  * (unbroadcast) cartesian product — the one join shape that cannot
  * survive a 100 TB scale-up. BroadcastNestedLoopJoin is allowed where a
  * bounded side is broadcast by construction (ANN probe sets). */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Queries whose BroadcastNestedLoopJoin is bounded by construction:
    * q_ann_brute and q_ann_quantized broadcast a ≤20-vector probe set;
    * q_ann_ivf and q_ann_ivf_trained broadcast their K=8 centroids for
    * coarse assignment. Everything else must not plan a BNLJ at all —
    * an unbounded one is a full-corpus broadcast that OOMs before the
    * n² compute matters. */
  private val boundedBnlj =
    Set("q_ann_brute", "q_ann_quantized", "q_ann_ivf", "q_ann_ivf_trained",
      "q_dedup_semantic",
      // recall report composes q_ann_brute — same ≤20-probe broadcast
      "q_ann_recall",
      // > ALL decorrelation crossJoins a broadcast 1-ROW (max,count)
      // aggregate — the most bounded build side possible (an equi-join
      // on lit keys constant-folds back to the same BNLJ)
      "q_any_all",
      // RRF fusion broadcasts a 1-vector probe (same shape as ann_brute)
      "q_hybrid_rank",
      // persisted-index probe broadcasts the K=8 centroid table for
      // probe routing — the q_ann_ivf_trained shape served from tables
      "q_ann_index",
      // hard negatives: K=8 centroid broadcast for cell assignment +
      // a ≤20-probe broadcast for the cross-cell ranking (annBrute's)
      "q_hard_negatives")

  test("no CartesianProduct and no unbounded BroadcastNestedLoopJoin in any plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan =
        try fn(spark, dir).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLAN_FAILED: $e" }
      if (plan.contains("CartesianProduct")) Some(s"$name (cartesian)")
      else if (plan.contains("BroadcastNestedLoopJoin") && !boundedBnlj(name))
        Some(s"$name (unbounded BNLJ)")
      else if (plan.startsWith("PLAN_FAILED")) Some(s"$name ($plan)")
      else None
    }
    assert(offenders.isEmpty, s"bad plans: $offenders")
  }

  test("duplicate-cluster selection plans no window over the cluster key") {
    // L70/L60 pin: per-cluster selection over the duplicate-cluster key
    // must be a map-combinable groupBy (+ AQE-skew-splittable join-back),
    // never a window — a 10M-copy boilerplate cluster would put every
    // copy through ONE window task (AQE cannot split window partitions).
    for (name <- Seq("q_dedup_downsample", "q_dedup_canonical")) {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$name plans a window over the duplicate-cluster key:\n$plan")
    }
  }

  test("no interpreted higher-order array functions in any declared query plan") {
    // ArrayTransform/ArrayAggregate/ArrayFilter/ZipWith are CodegenFallback
    // (interpreted per element) and measured 17-30× slower than native
    // expressions on data-sized paths (CLAUDE.md rule) — the declared
    // surface must be free of them; native graft.functions expressions
    // are the sanctioned path. Catalyst renders every HOF via its
    // embedded lambda, which prints as "lambdafunction(" — match THAT
    // (the pretty names "transform("/"filter(" would false-positive on
    // unrelated operators, and class names never appear in plan text;
    // the guard test below proves the probe string actually fires).
    val probe = "lambdafunction("
    val rendered = spark.range(1)
      .select(org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.array(org.apache.spark.sql.functions.lit(1)),
        x => x + 1).as("a"))
      .queryExecution.executedPlan.toString
    assert(rendered.contains(probe),
      s"probe string no longer matches Spark's HOF rendering — fix the audit:\n$rendered")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan =
        try fn(spark, dir).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLAN_FAILED: $e" }
      if (plan.contains(probe)) Some(name) else None
    }
    assert(offenders.isEmpty, s"interpreted HOFs in plans: $offenders")
  }
}
