package graft

import graft.functions.{DotProduct, KmvDistinct, PolyHash64, Shingles3, SimHash64}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions registering graft's native expressions as SQL
  * functions, so `spark.sql("SELECT poly_hash64(text) ...")` works — the
  * Spark-native analogue of the reference's plugin/connector function
  * surface. Install with:
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * or config spark.sql.extensions=graft.GraftExtensions,
  * or on a live session: GraftExtensions.register(spark).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.defs.foreach(e.injectFunction)
    e.injectOptimizerRule { session =>
      graft.plans.ApproxDistinctRule(() =>
        session.conf.get("spark.graft.approxDistinct.enabled", "false").toBoolean)
    }
    e.injectOptimizerRule { session =>
      graft.plans.SubscriptFilterRule(() =>
        session.conf.get("spark.graft.subscriptFilters.enabled", "false").toBoolean)
    }
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  val defs: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("poly_hash64"),
      info("poly_hash64", "poly_hash64(str) - rolling polynomial hash mod 1e9+7"),
      (args: Seq[Expression]) => PolyHash64(args.head, 31L, 1000000007L)),
    (FunctionIdentifier("token_hash64"),
      info("token_hash64", "token_hash64(str) - wrapping 64-bit polynomial hash"),
      (args: Seq[Expression]) => PolyHash64(args.head, 1099511628211L, 0L)),
    (FunctionIdentifier("sim_hash64"),
      info("sim_hash64", "sim_hash64(array<bigint>) - 64-bit simhash of token hashes"),
      (args: Seq[Expression]) => SimHash64(args.head)),
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(array<double>, array<double>) - sequential-fold dot product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("kmv_distinct"),
      info("kmv_distinct", "kmv_distinct(hash64, k) - approx distinct via k-minimum-values sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kmv_distinct(hash64, k) takes exactly 2 arguments")
        val k = args(1) match {
          case lit: org.apache.spark.sql.catalyst.expressions.Literal =>
            lit.value match {
              case i: Int => i
              case l: Long => l.toInt
              case s: Short => s.toInt
              case other => throw new IllegalArgumentException(
                s"kmv_distinct k must be an integral literal, got $other")
            }
          case other => throw new IllegalArgumentException(
            s"kmv_distinct k must be a literal, got ${other.sql}")
        }
        KmvDistinct(args(0), k).toAggregateExpression()
      }),
    (FunctionIdentifier("shingles3"),
      info("shingles3", "shingles3(array<string>) - distinct 3-word shingles"),
      (args: Seq[Expression]) => Shingles3(args.head)),
    (FunctionIdentifier("kll_quantiles"),
      info("kll_quantiles",
        "kll_quantiles(value, k, p1[, p2...]) - mergeable multilevel quantile sketch"),
      (args: Seq[Expression]) => {
        require(args.length >= 3, "kll_quantiles(value, k, p1[, p2...]) needs >= 3 arguments")
        graft.functions.KllQuantiles(args.head,
          litNum(args(1), "k").toInt,
          args.drop(2).map(litNum(_, "fraction"))).toAggregateExpression()
      }),
    (FunctionIdentifier("freq_items"),
      info("freq_items",
        "freq_items(item, k, topN) - mergeable Misra-Gries heavy-hitters sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "freq_items(item, k, topN) takes exactly 3 arguments")
        // cast the item to STRING at the Catalyst level: FreqItems
        // stringifies the evaluated value, and internal representations
        // (DateType Int days, TimestampType Long micros) would otherwise
        // render as raw numbers through the SQL surface (the DataFrame
        // operator casts the same way)
        graft.functions.FreqItems(
          org.apache.spark.sql.catalyst.expressions.Cast(
            args.head, org.apache.spark.sql.types.StringType),
          litNum(args(1), "k").toInt, litNum(args(2), "topN").toInt).toAggregateExpression()
      }),
    (FunctionIdentifier("vec_quantize"),
      info("vec_quantize",
        "vec_quantize(array<double>, scale) - quantize to integer-valued doubles (parity-exact rounding)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_quantize(vec, scale) takes exactly 2 arguments")
        graft.functions.QuantizeVec(args.head, litNum(args(1), "scale"))
      }),
    (FunctionIdentifier("min_n_summary"),
      info("min_n_summary",
        "min_n_summary(ord, id, payload, n) - bounded n-smallest-by-(ord,id) summary: struct(kept, payload_sum)"),
      (args: Seq[Expression]) => {
        require(args.length == 4, "min_n_summary(ord, id, payload, n) takes exactly 4 arguments")
        graft.functions.MinNSummary(args(0), args(1), args(2),
          litNum(args(3), "n").toInt).toAggregateExpression()
      }),
    // ---- R70: the Presto approx-sketch SQL surface (ref: paimon-presto
    // TestPrestoSqlITCase testApproxSet / testMergeHyperLogLog /
    // testApproxSetBigint / approx_percentile usages) re-expressed over
    // the KMV/KLL machinery. approx_set hashes with Spark's codegen'd
    // xxhash64 — NOT the replayable poly fold: KMV's estimator needs a
    // well-MIXED hash (measured: the weakly-mixed poly hash of short
    // strings skews the k-th minimum 7× at 20k distinct), and the
    // q_approx_set oracle runs in the EXACT regime (estimate ≡ distinct
    // count below k), where the hash choice is invisible. The bit-exact
    // poly-hash replay gate lives in q_sketch_distinct. The sketch VALUE
    // is the self-describing L63 binary, so it persists in tables and
    // re-merges later.
    (FunctionIdentifier("approx_set"),
      info("approx_set",
        "approx_set(x[, k | maxError]) - mergeable KMV distinct-count sketch of x (BINARY; Presto approx_set). " +
          "A fractional second argument (< 1) is Presto's maxError and maps to k = ceil((1.04/maxError)^2)"),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          "approx_set(x[, k | maxError]) takes 1 or 2 arguments")
        val k =
          if (args.length != 2) 256
          else {
            val n = litNum(args(1), "k | maxError")
            if (n < 1.0) maxErrorToK(n) else n.toInt
          }
        graft.functions.KmvState(nullSafeXxHash64(args.head), k).toAggregateExpression()
      }),
    // The DENSE HLL face (ref testP4ApproxSet* :809-858): same hashing
    // and null-skip as approx_set, fixed 2^p register file instead of a
    // k-min set. merge()/cardinality() dispatch on the self-describing
    // header, so stored columns of either family flow through the same
    // SQL. maxError maps to the register count (power-of-two ceil).
    (FunctionIdentifier("p4_approx_set"),
      info("p4_approx_set",
        "p4_approx_set(x[, maxError]) - DENSE HyperLogLog distinct sketch (BINARY; Presto P4 semantics)"),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          "p4_approx_set(x[, maxError]) takes 1 or 2 arguments")
        val p =
          if (args.length != 2) 12 // Presto's default 0.01625 → 4096 registers
          else graft.functions.DenseHll.maxErrorToP(litNum(args(1), "maxError"))
        graft.functions.DenseHllState(nullSafeXxHash64(args.head), p).toAggregateExpression()
      }),
    // R73: Presto key_sampling_percent — deterministic per-key sampling
    // coordinate in [0,1) (ref PrestoDistributedQueryTest.java:629/:979:
    // a key's sample fate is CONSISTENT across tables and join chains).
    // Oracle-replayable by construction: poly fold + Fibonacci mix +
    // power-of-two scale, all exact in both engines (see HashExpr).
    (FunctionIdentifier("key_sampling_percent"),
      info("key_sampling_percent",
        "key_sampling_percent(key) - deterministic per-key DOUBLE in [0,1) for consistent key sampling"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "key_sampling_percent(key) takes exactly 1 argument")
        graft.functions.KeySamplingPercent(args.head)
      }),
    (FunctionIdentifier("merge"),
      info("merge",
        "merge(sketch) - re-merge stored KMV distinct sketches (BINARY; Presto merge(hll))"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "merge(sketch) takes exactly 1 argument")
        // the approx_set flow's merge; KLL/MG sketches re-merge through
        // their typed names (kll_merge/mg_merge) — the binary forms are
        // not tagged, so a type-dispatching merge cannot exist
        graft.functions.KmvMergeState(args.head).toAggregateExpression()
      }),
    (FunctionIdentifier("cardinality"),
      info("cardinality",
        "cardinality(x) - distinct estimate of a BINARY KMV sketch; Spark size() of array/map"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "cardinality(x) takes exactly 1 argument")
        graft.functions.SketchCardinality(args.head)
      }),
    // NOTE: reduce_agg (R72) is deliberately NOT here: Spark 4's
    // ResolveFunctions rejects lambda arguments unless the registry
    // result is itself a HigherOrderFunction, and validateFunction wraps
    // every AggregateFunction into an AggregateExpression BEFORE that
    // check — an aggregate HOF cannot resolve through any function
    // registry. Use org.apache.spark.sql.graft.ReduceAgg.reduceAgg.
    (FunctionIdentifier("approx_percentile"),
      info("approx_percentile",
        "approx_percentile(x, p[, k]) - KLL-sketch quantile (Presto approx_percentile shape)"),
      (args: Seq[Expression]) => {
        require(args.length == 2 || args.length == 3,
          "approx_percentile(x, p[, k]) takes 2 or 3 arguments")
        val p = litNum(args(1), "fraction")
        val k = if (args.length == 3) litNum(args(2), "k").toInt else 256
        graft.functions.KllQuantileExpr(
          graft.functions.KllState(args.head, k).toAggregateExpression(), p)
      }))

  /** xxhash64 that PROPAGATES null instead of folding it into the seed:
    * XxHash64 of a null child returns the running seed (42), so a bare
    * XxHash64 would make KmvState count NULL as one extra distinct
    * element per group — Presto's approx_set (and COUNT(DISTINCT))
    * skip NULLs (ADVICE r18). Wrapping as if(isnull(x), null, hash(x))
    * lets KmvState's existing null-skip fire. */
  private def nullSafeXxHash64(x: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.If(
      org.apache.spark.sql.catalyst.expressions.IsNull(x),
      org.apache.spark.sql.catalyst.expressions.Literal(null, org.apache.spark.sql.types.LongType),
      new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(x)))

  /** Presto's approx_set(x, maxError) second-argument face: a standard
    * error e maps to sketch size k = ceil((1.04/e)^2) (the HLL
    * error-to-bucket rule 1.04/sqrt(m), inverted; KMV's error is the
    * same 1/sqrt(k) family). The 1-ulp guard keeps exact quotients
    * (e.g. e=0.0325 → 32.0² = 1024) from ceil-ing one past the intended
    * size on libm drift. Presto bounds e to [0.0040625, 0.26]; we accept
    * that range and reject outside it, matching the reference's
    * error surface (PrestoDistributedQueryTest.java:154-204). */
  private def maxErrorToK(e: Double): Int = {
    require(e >= 0.0040625 && e <= 0.26,
      s"approx_set maxError must be in [0.0040625, 0.26], got $e")
    val raw = 1.04 / e
    math.ceil(raw * raw - 1e-9).toInt
  }

  /** Shared literal decode for the sketch-function arguments. */
  private def litNum(e: Expression, what: String): Double = e match {
    case l: org.apache.spark.sql.catalyst.expressions.Literal =>
      l.value match {
        case d: Double => d
        case f: Float => f.toDouble
        case i: Int => i.toDouble
        case n: Long => n.toDouble
        case s: Short => s.toDouble
        case b: Byte => b.toDouble
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case other => throw new IllegalArgumentException(s"$what must be numeric, got $other")
      }
    case other => throw new IllegalArgumentException(s"$what must be a literal, got ${other.sql}")
  }

  /** Register the SQL FUNCTIONS into an already-built session
    * (withExtensions only applies at session construction). Note: the
    * ApproxDistinctRule optimizer rule CANNOT be injected post-build —
    * sessions needing the approx-distinct rewrite must be constructed
    * with `withExtensions(new GraftExtensions)` or
    * `spark.sql.extensions=graft.GraftExtensions` (or use
    * `spark.experimental.extraOptimizations`). */
  def register(spark: SparkSession): Unit =
    defs.foreach { case (ident, inf, builder) =>
      org.apache.spark.sql.graft.Bridge.registerFunction(spark, ident, inf, builder)
    }
}
