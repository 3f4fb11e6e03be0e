package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.1 S1–S3: the plans actually push filters/projections into
  * the parquet scan and broadcast the small sides — the properties that
  * matter at 100 TB, asserted on the executed plan.
  */
class PushdownSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("S1: projection pruning — scan reads only the 3 needed lineitem columns") {
    val p = planOf("q_scan_project")
    val readSchema = "ReadSchema: struct<(.*?)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(readSchema.split(",").length == 3, s"ReadSchema: $readSchema")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_linenumber")
      && readSchema.contains("l_extendedprice"))
  }

  test("S2: predicates reach the parquet reader (PushedFilters)") {
    // read the scan's metadata directly — the plan toString truncates it
    val df = SparkEntry.queries("q6_filter_agg")(spark, dir)
    val pushed = df.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.metadata("PushedFilters")
    }.mkString
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), pushed)
    assert(pushed.contains("LessThan(l_quantity"), pushed)
    assert(pushed.contains("LessThanOrEqual(l_discount"), pushed)
  }

  test("R66: 500-literal IN plans as InSet and pushes whole to the scan") {
    val df = SparkEntry.queries("q_large_in")(spark, dir)
    // physical predicate is ONE hash-set probe (INSET), not a 500-branch
    // OR chain
    assert(df.queryExecution.executedPlan.toString.contains("INSET"),
      "expected an InSet physical predicate")
    val pushed = df.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.metadata("PushedFilters")
    }.mkString
    assert(pushed.contains("In(l_partkey"), pushed.take(200))
    // the In filter reaches the reader with ALL its values, not a prefix
    val inList = "In\\(l_partkey, \\[([^\\]]*)\\]".r
      .findFirstMatchIn(pushed).map(_.group(1)).getOrElse("")
    assert(inList.split(",").length == 500,
      s"expected all 500 IN values pushed, got ${inList.split(",").length}")
  }

  test("R68b: IS [NOT] DISTINCT FROM as a SCALAR filter — EqualNullSafe " +
    "reaches PushedFilters; the null-probe face matches null rows") {
    import spark.implicits._
    val p = TestSpark.tmpDir("nullsafe-filter")
    Seq((1L, Some(7L)), (2L, None), (3L, Some(7L)), (4L, Some(9L)), (5L, None))
      .toDF("id", "v").repartition(2).write.parquet(p)
    // literal face: a <=> 7 ≡ a IS NOT DISTINCT FROM 7 — pushed as
    // EqualNullSafe, not left residual (the R68 JOIN face's scalar twin)
    val lit7 = spark.read.parquet(p).filter(expr("v IS NOT DISTINCT FROM 7"))
    val pushed = lit7.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.metadata("PushedFilters")
    }.mkString
    assert(pushed.contains("EqualNullSafe(v,7)"), pushed)
    assert(lit7.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    // null-probe face: <=> NULL matches exactly the null rows (a plain
    // `= NULL` matches nothing) — Catalyst may canonicalize to IsNull,
    // which pushes equally; assert semantics + a pushed filter exists
    val nulls = spark.read.parquet(p).filter(col("v") <=> lit(null))
    assert(nulls.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 5L))
    // negated face: IS DISTINCT FROM 7 keeps nulls (unlike <> 7)
    val not7 = spark.read.parquet(p).filter(expr("v IS DISTINCT FROM 7"))
    assert(not7.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 4L, 5L))
  }

  test("S3: limit compiles to a bounded collect (CollectLimit/TakeOrdered)") {
    val p = planOf("q_limit")
    assert(p.contains("TakeOrderedAndProject") || p.contains("CollectLimit"), p)
    val topk = planOf("q_topk")
    assert(topk.contains("TakeOrderedAndProject"), topk)
  }

  test("R4: q5 multi-join broadcasts every dimension (single big-table shuffle)") {
    val p = planOf("q5_multi_join")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts")
    assert(!p.contains("CartesianProduct"))
  }

  test("S14d: stats pruning on dotted-vs-nested attribute renderings — " +
    "quote-aware split, collision declines every claim") {
    import graft.sources.{ColStats, FileStats}
    import org.apache.spark.sql.sources.EqualTo
    import org.apache.spark.sql.types._
    // struct-only schema: the backticked walk resolves and prunes
    val nested = StructType(Seq(
      StructField("a", StructType(Seq(StructField("b", IntegerType))))))
    val stats = Map("a.b" -> ColStats("1", "5", 0L))
    assert(!FileStats.mayMatch(EqualTo("`a`.`b`", 100), stats, nested),
      "quoted struct walk should prune on the leaf's stats")
    assert(!FileStats.mayMatch(EqualTo("a.b", 100), stats, nested),
      "plain dotted walk should prune on the leaf's stats")
    assert(FileStats.mayMatch(EqualTo("a.b", 3), stats, nested))
    // dotted TOP-LEVEL column only: `a.b` is that column, same stats key
    val dotted = StructType(Seq(StructField("a.b", IntegerType)))
    assert(!FileStats.mayMatch(EqualTo("`a.b`", 100), stats, dotted),
      "quoted dotted name should prune on the top-level column's stats")
    // COLLISION: both a top-level "a.b" and struct a.b exist — the
    // footer keys both under "a.b", so every rendering must DECLINE
    // (keep the file) rather than prune with unattributable stats
    val both = StructType(nested.fields ++ dotted.fields)
    for (attr <- Seq("`a.b`", "`a`.`b`", "a.b"))
      assert(FileStats.mayMatch(EqualTo(attr, 100), stats, both),
        s"ambiguous $attr must keep the file")
  }

  test("whole-stage codegen covers the agg pipeline of q1") {
    // AQE materializes the final plan (with codegen spans) only on execute
    val df = SparkEntry.queries("q1_agg")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WholeStageCodegen") || p.contains("*(1)"), p)
    assert(p.contains("HashAggregate"), "partial/final hash agg expected")
  }
}
