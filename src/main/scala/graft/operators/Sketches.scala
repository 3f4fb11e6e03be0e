package graft.operators

import graft.{QDef, Tables => T}
import graft.functions.{FreqItems, HashExpr, KmvSketch}
import org.apache.spark.sql.DataFrame
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

  /** Grouped heavy hitters via the mergeable Misra–Gries sketch
    * (graft.functions.FreqItems): ≤ 2k (item, count) pairs per group
    * cross the shuffle instead of one row per distinct item. Long-format
    * output: groupCols..., item STRING, cnt BIGINT, rn BIGINT (1-based,
    * count desc / item asc). The exact grouped-top-k sibling is
    * `q_group_topk` (R16) — same trade as Percentiles.exact vs approx.
    *
    * A group CAN yield zero rows: if a compaction lands exactly on
    * uniform counts (e.g. 2k+1 equal singletons) every counter drops
    * and "no provably frequent item" is reported as an absent group —
    * never as fabricated rows; more typically a uniform tail surfaces
    * post-compaction stragglers whose counts are true UNDERcounts (MG
    * never overcounts). FrequentsSpec L23e pins both. Groups with ≤ 2k
    * distinct items never compact and always report exactly. */
  def topItems(df: DataFrame, groupCols: Seq[String], itemCol: String,
      k: Int = 256, topN: Int = 10): DataFrame = {
    require(groupCols.nonEmpty, "grouped operator: pass at least one group column")
    import org.apache.spark.sql.graft.Bridge
    val gs = groupCols.map(col)
    val sketch = Bridge.column(
      FreqItems(Bridge.expression(col(itemCol).cast("string")), k, topN)
        .toAggregateExpression())
    df.filter(col(itemCol).isNotNull)
      .groupBy(gs: _*)
      .agg(sketch.as("__fi"))
      .select(gs :+ posexplode(col("__fi")).as(Seq("__i", "__s")): _*)
      .select(gs :+ col("__s.item").as("item") :+ col("__s.cnt").as("cnt") :+
        (col("__i") + 1).cast("long").as("rn"): _*)
  }

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
      * driver gate, with k sized (from footer metadata, driver-side) to
      * pin the sketch in its EXACT regime at the gate's scale — no
      * compaction ever fires, level 0 holds the whole group, and the
      * weighted interpolation must equal DuckDB's quantile_cont
      * bit-for-bit regardless of partitioning or merge order. This
      * oracle-checks the full plumbing (TypedImperativeAggregate
      * update/serialize/merge across a real shuffle, posexplode naming,
      * interpolation math); compaction correctness under n ≫ k is
      * PercentilesSpec's rank-error + split/merge-associativity property
      * tests.
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
      (s, d) => {
        // The ORACLE-GATED configuration must stay in the sketch's exact
        // regime (quantile_cont can only oracle exactness), and ScaleUp
        // multiplies rows-per-supplier by the factor while COPYING the
        // supplier dim — so a fixed k has a scale horizon (k=8192 died at
        // sf10's 60k rows/group). Derive k from footer metadata instead:
        // next power of two ≥ 4× the mean group size (uniform suppkeys;
        // ScaleUp replicates every group exactly, so the ×4 margin is
        // factor-invariant). Driver-side, zero scans, no oracle
        // counterpart needed — exact quantiles don't depend on k.
        // Compaction-regime correctness (rank error ≤ bound, split/merge
        // associativity) is PercentilesSpec's property tests, not an
        // equality oracle.
        val rows = T.metadataRowCount(s, d, "lineitem")
        val supp = math.max(T.metadataRowCount(s, d, "supplier"), 1L)
        val mean = math.max(rows / supp, 512L)
        val k = java.lang.Long.highestOneBit(mean * 4 - 1).toInt * 2
        Percentiles.approx(
            T.lineitem(s, d), Seq("l_suppkey"), "l_quantity",
            Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75)), k = math.max(k, 8192))
          .orderBy("l_suppkey", "name")
      },
      Some("""WITH q AS (
             |  SELECT l_suppkey,
             |    quantile_cont(l_quantity, 0.25) AS p25,
             |    quantile_cont(l_quantity, 0.50) AS p50,
             |    quantile_cont(l_quantity, 0.75) AS p75
             |  FROM lineitem GROUP BY l_suppkey)
             |SELECT l_suppkey, name, value
             |FROM q UNPIVOT (value FOR name IN (p25, p50, p75))
             |ORDER BY l_suppkey, name""".stripMargin)),

    /** L23 on the oracle surface: per-returnflag top-5 ship MONTHS via
      * the MG sketch. TPC-H ship dates span a fixed 1992–1998 window, so
      * ~83 distinct months per group ≤ 2k = 128 at ANY scale factor: the
      * sketch never compacts, counts are exact under any merge order,
      * and the DuckDB count/row_number replay matches bit-for-bit — the
      * same exact-regime oracle pattern as q_sketch_quantiles (KLL) and
      * q_sketch_distinct (KMV). Approx-regime guarantees (heavy-hitter
      * survival, undercount ≤ err ≤ n/(k+1)) are FrequentsSpec's
      * property tests. */
    QDef(
      "q_sketch_topk",
      (s, d) =>
        topItems(
          T.lineitem(s, d).withColumn("item",
            date_format(col("l_shipdate"), "yyyy-MM")),
          Seq("l_returnflag"), "item", k = 64, topN = 5)
          .orderBy("l_returnflag", "rn"),
      Some("""WITH c AS (
             |  SELECT l_returnflag, strftime(l_shipdate, '%Y-%m') AS item,
             |         count(*) AS cnt
             |  FROM lineitem GROUP BY 1, 2),
             |r AS (SELECT l_returnflag, item, cnt,
             |        row_number() OVER (PARTITION BY l_returnflag
             |                           ORDER BY cnt DESC, item) AS rn
             |      FROM c)
             |SELECT l_returnflag, item, cnt, rn FROM r WHERE rn <= 5
             |ORDER BY l_returnflag, rn""".stripMargin)),

    /** L63 on the oracle surface: PERSISTABLE sketch columns — the
      * rollup-table pattern the reference exercises as Presto's
      * approx_set → stored HyperLogLog → merge → cardinality (ref:
      * TestPrestoSqlITCase testApproxSet / testMergeHyperLogLog).
      * Stage 1 sketches per (returnflag, shipmode) cell and STORES the
      * binary sketch in a graft table; stage 2 reads the table back and
      * merges cells up to per-returnflag estimates — no touch of the
      * raw rows. KMV merges are LOSSLESS (the global k-min set is a
      * pure function of the union of per-cell k-min sets), so the
      * merged estimate equals the one-pass estimate bit-for-bit at ANY
      * scale factor, and the oracle replay is the same kmvSql the
      * one-pass q_sketch_distinct uses. The binary round-trip through
      * graft parquet (write → manifest stats skip → scan) is the other
      * half of what this checks; KLL/MG state/merge parity is
      * SketchPersistSpec. */
    QDef(
      "q_sketch_persist",
      (s, d) => {
        import graft.functions.SketchState
        val rollup = T.lineitem(s, d)
          .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
          .groupBy("l_returnflag", "ship_month")
          .agg(
            SketchState.kmvState(
              HashExpr.tokenHash64(col("l_suppkey").cast("string")), K).as("sk"),
            count(lit(1)).as("n"))
        val t = graft.sources.GraftTable.create(
          s, GraftQueries.tmpRoot("skpersist"), rollup.schema)
        t.append(rollup)
        t.read()
          .groupBy("l_returnflag")
          .agg(SketchState.kmvMerge(col("sk")).as("msk"), sum("n").as("n"))
          .select(col("l_returnflag"),
            SketchState.kmvEstimate(col("msk")).as("approx_supps"),
            col("n"))
          .orderBy("l_returnflag")
      },
      Some(s"""WITH ${kmvSql("m", "l_suppkey", "approx_supps")},
              |base AS (SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag)
              |SELECT b.l_returnflag, em.approx_supps, b.n
              |FROM base b JOIN em ON b.l_returnflag = em.l_returnflag
              |ORDER BY b.l_returnflag""".stripMargin)),

    // S26c/L63 composition: a rollup TABLE whose sketch column merges
    // through the AGGREGATION MERGE ENGINE itself — per-lang
    // distinct-source sketches upsert in two halves and the table's
    // kmv_merge fold maintains the union; no read-side merge query at
    // all. Exact-regime oracle: ≤20 distinct sources per lang < k=256,
    // where the KMV estimate IS the exact distinct count, so the plain
    // COUNT(DISTINCT) replays it. The engine-level fold is what a
    // 100 TB ingest wants: every upsert carries O(k) sketch bytes and
    // the stored rollup is always current.
    QDef(
      "q_sketch_rollup",
      (s, d) => {
        import graft.functions.SketchState
        val docs = T.documents(s, d)
        def half(even: Boolean) = docs
          .filter(if (even) col("doc_id") % 2 === 0 else col("doc_id") % 2 =!= 0)
          .groupBy("lang")
          .agg(SketchState.kmvState(HashExpr.tokenHash64(col("source"))).as("sk"))
        val h1 = half(even = true)
        val t = graft.sources.GraftTable.create(
          s, GraftQueries.tmpRoot("skrollup"), h1.schema,
          primaryKeys = Seq("lang"),
          options = Map(
            "merge-engine" -> "aggregation",
            "fields.sk.aggregate-function" -> "kmv_merge"))
        t.upsert(h1)
        t.upsert(half(even = false))
        t.read()
          .select(col("lang"), SketchState.kmvEstimate(col("sk")).as("n_sources"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(DISTINCT source) AS n_sources
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // S26d: the EXACT sibling of q_sketch_rollup — per-priority distinct
    // BUYER SETS as rbm64 bitmap columns maintained by the aggregation
    // merge engine (Paimon's rbm64 field aggregate). Two upsert halves,
    // the engine folds the exact union, the read extracts cardinalities;
    // the oracle is a plain COUNT(DISTINCT) — no exactness regime caveat
    // at ANY scale factor, which is precisely what separates rbm64 from
    // the KMV sketch column.
    QDef(
      "q_rbm_rollup",
      (s, d) => {
        import graft.functions.Bitmap64
        val o = T.orders(s, d)
        def half(even: Boolean) = o
          .filter(if (even) col("o_orderkey") % 2 === 0 else col("o_orderkey") % 2 =!= 0)
          .groupBy("o_orderpriority")
          .agg(Bitmap64.rbmState(col("o_custkey").cast("long")).as("buyers"))
        val h1 = half(even = true)
        val t = graft.sources.GraftTable.create(
          s, GraftQueries.tmpRoot("rbmrollup"), h1.schema,
          primaryKeys = Seq("o_orderpriority"),
          options = Map(
            "merge-engine" -> "aggregation",
            "fields.buyers.aggregate-function" -> "rbm64_merge"))
        t.upsert(h1)
        t.upsert(half(even = false))
        t.read()
          .select(col("o_orderpriority").as("prio"),
            Bitmap64.rbmCardinality(col("buyers")).as("n_buyers"))
          .orderBy("prio")
      },
      Some("""SELECT o_orderpriority AS prio, count(DISTINCT o_custkey) AS n_buyers
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    /** R70: the Presto approx-sketch SQL SURFACE — `approx_set(x)` →
      * sketch-typed value → `merge(...)` → `cardinality(...)`, run as
      * SQL text through the GraftExtensions function registry (ref:
      * paimon-presto TestPrestoSqlITCase testApproxSet /
      * testMergeHyperLogLog). Same machinery as q_sketch_persist, but
      * exercised through the SQL names a reference user types: sketch
      * per (lang, doc_id%4) sub-corpus cell, re-merge cells per lang,
      * estimate. EXACT regime: the source dim is bounded (≪ k = 256
      * distinct per lang at ANY scale factor — ScaleUp replicates the
      * dim), and KMV merges are lossless, so the merged estimate IS the
      * distinct count and the oracle is a plain COUNT(DISTINCT). */
    QDef(
      "q_approx_set",
      (s, d) => {
        graft.GraftExtensions.register(s)
        T.documents(s, d).createOrReplaceTempView("graft_apxset_docs")
        s.sql("""
          WITH cells AS (
            SELECT lang, doc_id % 4 AS cell, approx_set(source) AS sk
            FROM graft_apxset_docs GROUP BY lang, doc_id % 4)
          SELECT lang, cardinality(merge(sk)) AS n_sources
          FROM cells GROUP BY lang ORDER BY lang""")
      },
      Some("""SELECT lang, count(DISTINCT source) AS n_sources
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    /** R70 quantile face: `approx_percentile(x, p, k)` over the KLL
      * sketch, through SQL. Exactness discipline copied verbatim from
      * q_sketch_quantiles: k is derived DRIVER-side from footer metadata
      * (next power of two ≥ 4× mean group size — no scan, and exact
      * quantiles don't depend on k so the static oracle needs no
      * counterpart), and l_quantity's integral values interpolate at
      * exact multiples of 0.25 — bit-identical IEEE doubles in both
      * engines. */
    QDef(
      "q_approx_percentile",
      (s, d) => {
        graft.GraftExtensions.register(s)
        T.lineitem(s, d).createOrReplaceTempView("graft_apxpct_li")
        val rows = T.metadataRowCount(s, d, "lineitem")
        val supp = math.max(T.metadataRowCount(s, d, "supplier"), 1L)
        val mean = math.max(rows / supp, 512L)
        val k = math.max(java.lang.Long.highestOneBit(mean * 4 - 1).toInt * 2, 8192)
        s.sql(s"""
          SELECT l_suppkey,
            round(approx_percentile(l_quantity, 0.25D, $k), 2) AS p25,
            round(approx_percentile(l_quantity, 0.50D, $k), 2) AS p50,
            round(approx_percentile(l_quantity, 0.75D, $k), 2) AS p75
          FROM graft_apxpct_li GROUP BY l_suppkey ORDER BY l_suppkey""")
      },
      Some("""SELECT l_suppkey,
             |  round(quantile_cont(l_quantity, 0.25), 2) AS p25,
             |  round(quantile_cont(l_quantity, 0.50), 2) AS p50,
             |  round(quantile_cont(l_quantity, 0.75), 2) AS p75
             |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin))
  )
}
