package graft.operators

import graft.{QDef, Tables => T}
import graft.functions.{HashExpr, KmvSketch}
import org.apache.spark.sql.functions._

/** Sketch aggregates (SURVEY §2.3 L15): mergeable small-state summaries —
  * the 100 TB answer to COUNT(DISTINCT): k longs per group cross the
  * shuffle instead of every key.
  *
  * The sketch is hash-agnostic (any uniform 64-bit upstream hash works —
  * xxhash64 in the general API docs); this query feeds it the wrapping
  * polynomial hash so the DuckDB oracle can replay the ENTIRE estimate
  * bit-for-bit: same hashes, same k-th minimum, same estimator.
  */
object Sketches {

  private val K = 1024
  private val Two64 = "18446744073709551616"

  /** DuckDB: wrapping 64-bit poly fold of `expr`'s string form (HUGEINT
    * mod 2^64) — mirrors HashExpr.tokenHash64. */
  private def hashSql(expr: String): String =
    s"""list_reduce(list_cat([CAST(0 AS HUGEINT)],
       |      list_transform(string_split(CAST($expr AS VARCHAR),''), c -> CAST(ord(c) AS HUGEINT))),
       |      (a,c) -> (a * 1099511628211 + c) % $Two64)""".stripMargin

  /** DuckDB CTE pair replaying the KMV estimate for one hashed column:
    * distinct hashes per group, unsigned k-th minimum, (k-1)/fraction. */
  private def kmvSql(tag: String, expr: String, outName: String): String =
    s"""d$tag AS (SELECT DISTINCT l_returnflag, ${hashSql(expr)} AS h FROM lineitem),
       |r$tag AS (SELECT l_returnflag, h,
       |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) rn,
       |    count(*) OVER (PARTITION BY l_returnflag) cnt
       |  FROM d$tag),
       |e$tag AS (SELECT l_returnflag,
       |    CASE WHEN max(cnt) < $K THEN CAST(max(cnt) AS BIGINT)
       |         ELSE CAST(round(($K - 1) / (CAST(max(CASE WHEN rn = $K THEN h END) AS DOUBLE)
       |                                     / $Two64.0)) AS BIGINT) END AS $outName
       |  FROM r$tag GROUP BY l_returnflag)""".stripMargin

  val defs: Seq[QDef] = Seq(
    QDef(
      "q_sketch_distinct",
      (s, d) =>
        T.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            KmvSketch.kmvDistinct(
              HashExpr.tokenHash64(col("l_partkey").cast("string")), K).as("approx_parts"),
            KmvSketch.kmvDistinct(
              HashExpr.tokenHash64(col("l_suppkey").cast("string")), K).as("approx_supps"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some(s"""WITH ${kmvSql("p", "l_partkey", "approx_parts")},
              |${kmvSql("s", "l_suppkey", "approx_supps")},
              |base AS (SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag)
              |SELECT b.l_returnflag, ep.approx_parts, es.approx_supps, b.n
              |FROM base b
              |JOIN ep ON b.l_returnflag = ep.l_returnflag
              |JOIN es ON b.l_returnflag = es.l_returnflag
              |ORDER BY b.l_returnflag""".stripMargin)),

    /** L22 on the oracle surface: the KLL sketch end-to-end through the
      * driver gate. Per-supplier lineitem groups hold ≤ ~700 rows at ANY
      * scale factor (TPC-H row counts scale with supplier count), so
      * k=2048 pins the sketch in its EXACT regime — no compaction ever
      * fires, level 0 holds the whole group, and the weighted
      * interpolation must equal DuckDB's quantile_cont bit-for-bit
      * regardless of partitioning or merge order. This oracle-checks the
      * full plumbing (TypedImperativeAggregate update/serialize/merge
      * across a real shuffle, posexplode naming, interpolation math);
      * compaction correctness under n ≫ k is PercentilesSpec's
      * rank-error + split/merge-associativity property tests.
      *
      * l_quantity (integral values) rather than l_extendedprice: with
      * integer endpoints and frac ∈ {0, .25, .5, .75} every interpolated
      * quantile is an exact multiple of 0.25 — bit-identical IEEE
      * doubles in BOTH engines regardless of interpolation formula, so
      * no rounding-boundary flakes (extendedprice interpolates at
      * quarter-CENT boundaries, where round-to-2dp flips on 1-ulp
      * engine differences — observed 3/300 rows). */
    QDef(
      "q_sketch_quantiles",
      (s, d) =>
        Percentiles.approx(
            T.lineitem(s, d), Seq("l_suppkey"), "l_quantity",
            Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75)), k = 2048)
          .orderBy("l_suppkey", "name"),
      Some("""WITH q AS (
             |  SELECT l_suppkey,
             |    quantile_cont(l_quantity, 0.25) AS p25,
             |    quantile_cont(l_quantity, 0.50) AS p50,
             |    quantile_cont(l_quantity, 0.75) AS p75
             |  FROM lineitem GROUP BY l_suppkey)
             |SELECT l_suppkey, name, value
             |FROM q UNPIVOT (value FOR name IN (p25, p50, p75))
             |ORDER BY l_suppkey, name""".stripMargin))
  )
}
