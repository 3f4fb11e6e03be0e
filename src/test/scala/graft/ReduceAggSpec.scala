package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ReduceAgg.reduceAgg
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.2 R72: Presto's reduce_agg — the generic user-programmable
  * fold aggregate as a HigherOrderFunction TypedImperativeAggregate,
  * exposed as a Column API with Presto-shaped lambda texts (a SQL
  * registry name is impossible: Spark 4's ResolveFunctions rejects
  * lambda args on non-HOF registry results, and every AggregateFunction
  * wraps before that check). q_reduce_agg proves the integer-exact
  * oracle face; this spec pins the machinery: cross-partition merge,
  * non-primitive state serialization, null skipping, empty-input
  * identity, and the analysis-time state-type check. */
class ReduceAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("R72a: sum-of-squares fold across a forced shuffle equals the builtin") {
    val df = (1 to 1000).toDF("x").repartition(13)
    val got = df.agg(reduceAgg(col("x").cast("long"), lit(0L),
      "(s, x) -> s + x * x", "(a, b) -> a + b").as("ssq")).head.getLong(0)
    val want = (1 to 1000).map(i => i.toLong * i).sum
    assert(got == want)
  }

  test("R72b: grouped max-fold (greatest) equals max, partial states merge map-side") {
    val df = (1 to 999).map(i => (i % 7, i.toLong)).toDF("g", "x").repartition(8)
    val got = df.groupBy("g")
      .agg(reduceAgg(col("x"), lit(-1L),
        "(s, x) -> greatest(s, x)", "(a, b) -> greatest(a, b)").as("mx"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val want = df.groupBy("g").agg(max("x").as("mx"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("R72c: STRING state survives the buffer serialize/merge path") {
    val df = Seq("pear", "apple", "quince", "fig").toDF("w").repartition(4)
    val got = df.agg(reduceAgg(col("w"), lit(""),
      "(s, x) -> greatest(s, x)", "(a, b) -> greatest(a, b)").as("mx"))
      .head.getString(0)
    assert(got == "quince")
  }

  test("R72d: a fold body whose type drifts from the state fails analysis with a cast hint") {
    val df = (1 to 3).toDF("x")
    val e = intercept[AnalysisException] {
      df.agg(reduceAgg(col("x").cast("long"), lit(0L),
        "(s, x) -> 1.5", "(a, b) -> a + b").as("r")).collect()
    }
    assert(e.getMessage.contains("cast"), s"unexpected message: ${e.getMessage}")
  }

  test("R72e: NULL inputs are skipped; an empty fold returns the initial state") {
    // initial 0 is the combine identity — the reduce_agg contract (a
    // non-identity initial counts once per data-bearing partial, the
    // same partition accident Presto documents away)
    val df = Seq(Some(5L), None, Some(7L)).toDF("x").repartition(4)
    val got = df.agg(reduceAgg(col("x"), lit(0L),
      "(s, x) -> s + x", "(a, b) -> a + b").as("r")).head.getLong(0)
    assert(got == 12L, "nulls must be skipped, not fold to NULL")
    // the empty-group face: no partial ever sees input, the seen-flag
    // no-op merges leave the buffer unseeded, eval returns the initial —
    // even a NON-identity one, and regardless of empty-partition count
    val empty = df.filter(col("x") > 1000)
      .agg(reduceAgg(col("x"), lit(42L),
        "(s, x) -> s + x", "(a, b) -> a + b").as("r")).head.getLong(0)
    assert(empty == 42L, "empty input must return the initial state")
  }

  test("R72f: a non-lambda function text fails loudly") {
    val e = intercept[IllegalArgumentException] {
      reduceAgg(col("x"), lit(0L), "1 + 2", "(a, b) -> a + b")
    }
    assert(e.getMessage.contains("lambda"))
  }
}
