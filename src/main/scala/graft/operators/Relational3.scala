package graft.operators

import graft.{QDef, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third tranche of relational coverage (SURVEY §2.2 R54–R56): modal
  * value per group, bitwise aggregates, and a bucketed interval/range
  * join (ref: Presto's range-predicate joins over Paimon scans,
  * paimon-presto-common PaimonSplitManager drives plain scans — the
  * join itself is engine-side; re-expressed Spark-first).
  */
object Relational3 {

  val defs: Seq[QDef] = Seq(
    // R54: statistical mode per group with a deterministic tie-break
    // (max count, ties → lexicographically smallest value). Expressed
    // as count + window rank rather than an engine-native mode() so the
    // tie-break is pinned identically in both engines. Scale shape: the
    // aggregate runs map-side-combinable over (status, priority) — a
    // ≤15-key space — and the window sorts ≤5 rows per status.
    QDef(
      "q_mode",
      (s, d) => {
        val counts = T.orders(s, d)
          .groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(col("n").desc, col("o_orderpriority").asc)
        counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_orderstatus"), col("o_orderpriority").as("modal_pri"), col("n"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, modal_pri, n FROM (
             |  SELECT o_orderstatus, o_orderpriority AS modal_pri, count(*) AS n,
             |    row_number() OVER (PARTITION BY o_orderstatus
             |      ORDER BY count(*) DESC, o_orderpriority ASC) AS rn
             |  FROM orders GROUP BY o_orderstatus, o_orderpriority) t
             |WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin)),

    // R55: bitwise aggregates (Presto's bitwise_or_agg/bitwise_and_agg
    // family). Integer-exact under any partitioning: OR/AND/XOR are
    // associative + commutative, so the partial aggregates map-side
    // combine and one ≤3-group shuffle finishes at any corpus size.
    QDef(
      "q_bitwise_agg",
      (s, d) =>
        T.lineitem(s, d)
          .select(col("l_returnflag"),
            col("l_linenumber").cast("long").as("ln"),
            (col("l_orderkey") % 1024L).as("okm"))
          .groupBy("l_returnflag")
          .agg(
            expr("bit_or(ln)").cast("long").as("b_or"),
            expr("bit_and(ln + 12)").cast("long").as("b_and"),
            expr("bit_xor(okm)").cast("long").as("b_xor"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(bit_or(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS b_or,
             |  CAST(bit_and(CAST(l_linenumber AS BIGINT) + 12) AS BIGINT) AS b_and,
             |  CAST(bit_xor(l_orderkey % 1024) AS BIGINT) AS b_xor,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // R57: second string-function family — levenshtein edit distance,
    // translate (with-removal form: unmapped chars drop in BOTH
    // engines), lpad, repeat, left/right slicing (Presto's
    // levenshtein_distance / translate / lpad family). All outputs are
    // integer-exact (distances and lengths summed per ≤5 groups), so
    // there is no rounding surface; one codegen pass + one tiny shuffle.
    QDef(
      "q_string_fns",
      (s, d) =>
        T.customer(s, d)
          .select(
            col("c_mktsegment"),
            levenshtein(expr("right(c_name, 6)"),
              lpad((col("c_custkey") % 1000000L).cast("string"), 6, "0"))
              .cast("long").as("lv"),
            length(translate(col("c_name"), "0123456789", "")).cast("long").as("tl"),
            length(repeat(expr("left(c_mktsegment, 2)"), 3)).cast("long").as("rp"))
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("n"),
            sum("lv").as("lv_sum"),
            sum("tl").as("tl_sum"),
            sum("rp").as("rp_sum"))
          .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS n,
             |  CAST(sum(levenshtein(right(c_name,6),
             |        lpad(CAST(c_custkey % 1000000 AS VARCHAR),6,'0'))) AS BIGINT) AS lv_sum,
             |  CAST(sum(length(translate(c_name,'0123456789',''))) AS BIGINT) AS tl_sum,
             |  CAST(sum(length(repeat(left(c_mktsegment,2),3))) AS BIGINT) AS rp_sum
             |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // R56: interval/range join — orders matched to OVERLAPPING 45-day
    // promotion windows (offset 30 days, so one order can hit two
    // windows; NOT expressible as a date_trunc bucketing). Spark-first
    // scale shape: a naive `day BETWEEN lo AND hi` join plans as a
    // broadcast nested loop — O(rows × windows) probes; instead each
    // window is exploded into the ≤2 fixed-width 30-day bins it
    // touches and the join becomes a broadcast EQUI-join on the bin
    // with the BETWEEN kept as a residual filter. Each order's bin is
    // unique, so no pair dedup is needed. The oracle replays the plain
    // BETWEEN join — proving the bucketed plan semantics-identical.
    // The window origin (min order date) is one footer-cheap scalar
    // aggregate collected on the driver (O(1), the q_rank_bm25
    // precedent); revenues are floored to integer-valued longs (§5).
    QDef(
      "q_range_join",
      (s, d) => {
        import s.implicits._
        val d0 = T.orders(s, d)
          .agg(min(col("o_orderdate").cast("date"))).as[java.sql.Date]
          .collect().head // bounded: ONE scalar row (window grid origin)
        val windows = s.range(10).toDF("w_id")
          .select(col("w_id"),
            explode(array(col("w_id"), col("w_id") + 1L)).as("bin"))
        val orders = T.orders(s, d)
          .select(
            datediff(col("o_orderdate").cast("date"), lit(d0)).cast("long").as("day"),
            floor(col("o_totalprice")).cast("long").as("fp"))
          .withColumn("bin", expr("day div 30"))
        orders.join(broadcast(windows),
            orders("bin") === windows("bin") &&
              col("day").between(col("w_id") * 30L, col("w_id") * 30L + 44L))
          .groupBy("w_id")
          .agg(count(lit(1)).as("n"), sum("fp").as("rev"))
          .orderBy("w_id")
      },
      Some("""WITH d0 AS (SELECT CAST(min(o_orderdate) AS DATE) AS m FROM orders),
             |w AS (SELECT CAST(range AS BIGINT) AS w_id FROM range(10)),
             |o AS (SELECT date_diff('day', (SELECT m FROM d0), CAST(o_orderdate AS DATE)) AS day,
             |             CAST(floor(o_totalprice) AS BIGINT) AS fp FROM orders)
             |SELECT w_id, count(*) AS n, CAST(sum(fp) AS BIGINT) AS rev
             |FROM w JOIN o ON o.day BETWEEN w_id*30 AND w_id*30+44
             |GROUP BY w_id ORDER BY w_id""".stripMargin)),

    // R58: GROUPING() diagnostics over ROLLUP — the function that tells a
    // report "this NULL is the rollup's ALL, not a null data value"
    // (Presto/Spark/DuckDB all ship it; any BI layer on top needs it).
    // The combined grouping id is computed EXPLICITLY as 2·g(status) +
    // g(prio) on both sides — engines disagree on grouping_id() naming,
    // not on GROUPING() itself.
    QDef(
      "q_grouping_fn",
      (s, d) =>
        T.orders(s, d)
          .rollup("o_orderstatus", "o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            grouping(col("o_orderstatus")).cast("long").as("g_status"),
            grouping(col("o_orderpriority")).cast("long").as("g_prio"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
            col("n"), col("g_status"), col("g_prio"),
            (col("g_status") * 2 + col("g_prio")).as("gid"))
          .orderBy("gid", "status", "prio"),
      Some("""SELECT coalesce(o_orderstatus,'ALL') AS status,
             |  coalesce(o_orderpriority,'ALL') AS prio,
             |  count(*) AS n,
             |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
             |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
             |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid
             |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
             |ORDER BY gid, status, prio""".stripMargin)),

    // R59: RECURSIVE CTE (Spark 4.1 WITH RECURSIVE ≡ DuckDB's) — a
    // row-to-row recurrence a window CANNOT express: an integer
    // compounded quarterly index (idx' = idx·(10000+bps) div 10000, the
    // multiplicative analogue of a running sum; exp(Σlog) would be
    // float-divergent, the scaled-integer recurrence is exact on both
    // engines). Recursion depth = distinct order QUARTERS (≤ ~28 —
    // calendar-bounded, never corpus-bounded: Spark executes one job
    // per recursive step, so depth must stay metadata-sized; unbounded
    // iteration belongs to the L25 localCheckpoint-loop shape instead);
    // each step joins the 1-row frontier to the collected spine.
    QDef(
      "q_recursive_cte",
      (s, d) => {
        // materialize the quarter spine FIRST (one map-combinable corpus
        // aggregate, collected as ≤ ~28 calendar-bounded rows — the
        // percentile-run-table discipline): the recursive term re-plans
        // its source once per iteration, and recursing directly over
        // the corpus CTE re-scanned orders once per step (measured 34 s
        // at sf0.1 with an 80-step monthly spine; sub-second per step
        // over the collected spine)
        val spine = T.orders(s, d)
          .groupBy(concat(year(col("o_orderdate")).cast("string"), lit("-Q"),
            quarter(col("o_orderdate")).cast("string")).as("qtr"))
          .agg(count(lit(1)).as("n"))
          .orderBy("qtr")
          .collect().zipWithIndex
          .map { case (r, i) => (i + 1L, r.getString(0), r.getLong(1)) }
        import s.implicits._
        spine.toSeq.toDF("rn", "qtr", "n").createOrReplaceTempView("r59_quarters")
        s.sql("""
          WITH RECURSIVE
          g(rn, qtr, n, idx) AS (
            SELECT rn, qtr, n, CAST(1000000 AS BIGINT) FROM r59_quarters WHERE rn = 1
            UNION ALL
            SELECT s.rn, s.qtr, s.n, (g.idx * (10000 + s.n % 500)) div 10000
            FROM g JOIN r59_quarters s ON s.rn = g.rn + 1
          )
          SELECT rn, qtr, n, idx FROM g ORDER BY rn""")
      },
      Some("""WITH RECURSIVE
             |quarters AS (SELECT CAST(year(o_orderdate) AS VARCHAR) || '-Q' ||
             |    CAST(quarter(o_orderdate) AS VARCHAR) AS qtr, count(*) AS n
             |  FROM orders GROUP BY 1),
             |seq AS (SELECT qtr, n, row_number() OVER (ORDER BY qtr) AS rn FROM quarters),
             |g(rn, qtr, n, idx) AS (
             |  SELECT rn, qtr, n, CAST(1000000 AS BIGINT) FROM seq WHERE rn = 1
             |  UNION ALL
             |  SELECT s.rn, s.qtr, s.n, (g.idx * (10000 + s.n % 500)) // 10000
             |  FROM g JOIN seq s ON s.rn = g.rn + 1
             |)
             |SELECT rn, qtr, n, CAST(idx AS BIGINT) AS idx
             |FROM g ORDER BY rn""".stripMargin)),

    // R60: SQL UDFs (Spark 4 `CREATE FUNCTION ... RETURNS ... RETURN`,
    // the ANSI SQL-invoked-function surface): a scalar net-revenue UDF
    // and a CASE banding UDF used inside a grouped aggregate. SQL UDFs
    // INLINE into the plan at analysis (no black-box eval — the body
    // participates in codegen/pushdown like any expression), so the
    // oracle simply inlines the same bodies. Float sums rounded 2dp
    // (§5, the q6 pattern).
    QDef(
      "q_sql_udf",
      (s, d) => {
        T.lineitem(s, d).createOrReplaceTempView("r60_lineitem")
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION r60_net(
                |  p DOUBLE, disc DOUBLE, tax DOUBLE) RETURNS DOUBLE
                |RETURN p * (1.0 - disc) * (1.0 + tax)""".stripMargin)
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION r60_band(q DOUBLE) RETURNS STRING
                |RETURN CASE WHEN q < 10 THEN 'low'
                |            WHEN q < 30 THEN 'mid' ELSE 'high' END""".stripMargin)
        // exact 1e-6-unit sums (see q1_agg: double-sum drift at sf10
        // scale); net has 6 decimal digits, and per-group sums *1e6 stay
        // ~2.5e17 at sf10 - far inside BIGINT
        s.sql("""SELECT l_returnflag, r60_band(l_quantity) AS band, count(*) AS n,
                |  round(sum(CAST(round(r60_net(l_extendedprice, l_discount, l_tax)
                |    * 1000000) AS BIGINT)) / 1000000.0, 2) AS net_sum
                |FROM r60_lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
      },
      Some("""SELECT l_returnflag,
             |  CASE WHEN l_quantity < 10 THEN 'low'
             |       WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS band,
             |  count(*) AS n,
             |  round(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
             |    * (1.0 + l_tax) * 1000000) AS BIGINT)) AS BIGINT)
             |    / 1000000.0, 2) AS net_sum
             |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // R61: VARIANT semi-structured type (Spark 4 parse_json/variant_get,
    // the open-format twin of Snowflake/Delta VARIANT): events.props
    // parses ONCE to a VARIANT column that survives the group-by
    // exchange (binary-encoded, shredding-ready), then typed paths
    // extract on the agg side. Differs from R39's from_json in that no
    // schema is declared anywhere — the type is carried, not projected.
    // Exact integer aggregates; the oracle extracts the same paths with
    // DuckDB's JSON pointers.
    QDef(
      "q_variant",
      (s, d) =>
        T.events(s, d)
          .select(col("event_type"), parse_json(col("props")).as("v"))
          .select(col("event_type"),
            expr("variant_get(v, '$.k', 'bigint')").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            count(col("k")).as("n_k"),
            sum("k").as("k_sum"),
            sum(when(pmod(col("k"), lit(2L)) === 0, 1L).otherwise(0L)).as("k_even"))
          .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
             |  count(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
             |  CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             |    AS k_sum,
             |  CAST(sum(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
             |                     % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS k_even
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // R62: max_by / min_by + the N-variant (ref skipped suite:
    // PrestoDistributedQueryTest.java:704 testMaxBy, :709 testMaxByN,
    // :759/:764 the min twins). 2-arg forms are Spark-native declarative
    // aggregates (map-side combinable; o_orderkey is unique so the
    // selection is deterministic). The N-variant is the bounded MinNRows
    // aggregate — ≤3 rows per group per partition cross the shuffle, and
    // posexplode's pos+1 IS the row_number the (banned) hot-key window
    // form would produce; ord (cents DESC, okey ASC) is a total order.
    // Prices compare as exact cents: round(p*100) is the same IEEE
    // multiply + half-up-on-positives round in both engines.
    QDef(
      "q_max_min_by",
      (s, d) => {
        val cents = round(col("o_totalprice") * 100).cast("long")
        T.orders(s, d)
          .select(col("o_orderstatus"), cents.as("cents"),
            col("o_orderkey").as("okey"), col("o_orderpriority").as("pri"))
          .groupBy("o_orderstatus")
          .agg(
            expr("max_by(pri, okey)").as("last_pri"),
            expr("min_by(pri, okey)").as("first_pri"),
            graft.functions.MinNAgg.minNRows(3,
              Seq(("cents", col("cents"), true), ("okey", col("okey"), false)))
              .as("top3"))
          .select(col("o_orderstatus"), col("last_pri"), col("first_pri"),
            posexplode(col("top3")))
          .select(col("o_orderstatus"), (col("pos") + 1).cast("long").as("rnk"),
            col("col.cents").as("cents"), col("col.okey").as("okey"),
            col("last_pri"), col("first_pri"))
          .orderBy("o_orderstatus", "rnk")
      },
      Some("""WITH g AS (SELECT o_orderstatus,
             |    max_by(o_orderpriority, o_orderkey) AS last_pri,
             |    min_by(o_orderpriority, o_orderkey) AS first_pri
             |  FROM orders GROUP BY 1),
             |r AS (SELECT o_orderstatus, o_orderkey AS okey,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             |    row_number() OVER (PARTITION BY o_orderstatus
             |      ORDER BY round(o_totalprice * 100) DESC, o_orderkey) AS rnk
             |  FROM orders)
             |SELECT r.o_orderstatus, CAST(rnk AS BIGINT) AS rnk, cents, okey,
             |  last_pri, first_pri
             |FROM r JOIN g ON r.o_orderstatus = g.o_orderstatus
             |WHERE rnk <= 3 ORDER BY 1, 2""".stripMargin)),

    // R63: OFFSET / LIMIT-with-OFFSET (ref skipped suite: :804
    // testOffsetEmptyResult). Both faces: a mid-stream page and an
    // offset past the result set (empty at any SF — unioned so the
    // declared output stays non-empty). Scale shape: ORDER BY + LIMIT n
    // OFFSET k plans as a per-partition top-(n+k) + single (n+k)-row
    // final pick — driver-bounded, never a global sort, PROVIDED n+k is
    // small: Spark sizes the selection's priority queue at n+k rows, so
    // a billions-deep OFFSET allocates a billions-slot queue and OOMs
    // (measured — exit 52 on the first cut of this query). Deep paging
    // belongs to keyset pagination (WHERE key > last_seen), which is why
    // the empty-result face here offsets past a BOUNDED 10-row page, not
    // past the corpus.
    QDef(
      "q_offset",
      (s, d) => {
        T.orders(s, d).createOrReplaceTempView("r63_orders")
        s.sql("""SELECT o_orderkey, o_orderstatus,
                |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                |FROM (SELECT * FROM r63_orders ORDER BY o_orderkey LIMIT 15 OFFSET 25)
                |UNION ALL
                |SELECT o_orderkey, o_orderstatus,
                |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                |FROM (SELECT * FROM (SELECT * FROM r63_orders
                |        ORDER BY o_orderkey LIMIT 10) page
                |      ORDER BY o_orderkey LIMIT 5 OFFSET 20)
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_orderstatus,
             |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 15 OFFSET 25)
             |UNION ALL
             |SELECT o_orderkey, o_orderstatus,
             |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |FROM (SELECT * FROM (SELECT * FROM orders
             |        ORDER BY o_orderkey LIMIT 10) page
             |      ORDER BY o_orderkey LIMIT 5 OFFSET 20)
             |ORDER BY o_orderkey""".stripMargin)),

    // R64: TRY / error-safe expression family (ref skipped suite: :1159
    // testTry) — the ANSI-mode-era twin: try_divide NULLs the zero
    // divisor (quantity = 25), try_cast NULLs the non-numeric strings,
    // try_add NULLs the BIGINT overflow (keys > 7 push past Long.Max).
    // The oracle replays each semantics explicitly: plain division
    // (DuckDB /0 is NULL), TRY_CAST, and HUGEINT-widened add + TRY_CAST
    // back down. Per-row values are single IEEE ops both engines; the
    // cross-row double sum rounds 2dp (§5, the q6 pattern).
    QDef(
      "q_try_family",
      (s, d) =>
        T.lineitem(s, d)
          .select(col("l_returnflag"),
            expr("try_divide(l_extendedprice, l_quantity - 25.0)").as("td"),
            // r20: the ORIGINAL r18 CASE is restored — every row's
            // l_returnflag flows through the cast again — now via the
            // engine-level non-throwing TryCastLong (identical try_cast
            // semantics, TryCastSpec fuzz-pinned): Spark's TRY cast
            // constructs-and-catches a SparkNumberFormatException per
            // non-numeric row (measured 4.74 s vs 0.35 s at sf0.1 for
            // this one expression), which r19 had only worked around
            // with a query-side rare-failure CASE.
            graft.functions.TryCastExpr.tryCastLong(
              expr("CASE WHEN l_linenumber <= 3 " +
                "THEN CAST(l_linenumber AS STRING) " +
                "ELSE l_returnflag END"))
              .as("tc"),
            // overflow must be the RARE case: JVM try_add throws/catches
            // ArithmeticException on overflow, and the first cut
            // overflowed on ~every row (orderkey ≥ 8) — 60M exceptions
            // at the sf10 gate turned a scan-bound query into minutes of
            // exception control flow. One row in 512 overflows; the
            // non-overflow path is an intrinsified Math.addExact.
            expr("try_add(l_orderkey, CASE WHEN l_orderkey % 512 = 0 " +
              "THEN 9223372036854775807L ELSE 0L END)").as("ta"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            count(col("td")).as("n_div"),
            round(sum("td"), 2).as("div_sum"),
            count(col("tc")).as("n_cast"),
            sum("tc").as("cast_sum"),
            count(col("ta")).as("n_add"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(*) AS n,
             |  count(td) AS n_div, round(sum(td), 2) AS div_sum,
             |  count(tc) AS n_cast, CAST(sum(tc) AS BIGINT) AS cast_sum,
             |  count(ta) AS n_add
             |FROM (SELECT l_returnflag,
             |    l_extendedprice / (l_quantity - 25.0) AS td,
             |    TRY_CAST(CASE WHEN l_linenumber <= 3
             |      THEN CAST(l_linenumber AS VARCHAR) ELSE l_returnflag END
             |      AS BIGINT) AS tc,
             |    TRY_CAST(CAST(l_orderkey AS HUGEINT)
             |      + CASE WHEN l_orderkey % 512 = 0
             |             THEN 9223372036854775807 ELSE 0 END
             |      AS BIGINT) AS ta
             |  FROM lineitem) t
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // R65: set_agg (ref skipped suite: :1029 testSetAgg) — Presto's
    // set_agg ≡ Spark collect_set, rendered as sorted comma-joined
    // STRINGS (§5: oracle-checked cells must be scalar). Buffers are
    // DISTINCT-bounded (≤5 priorities, ≤10 residues), so the aggregate
    // map-side combines with tiny state at any corpus size; the
    // array<long> renders via an elementwise Cast, not an interpreted
    // HOF.
    QDef(
      "q_set_agg",
      (s, d) =>
        T.orders(s, d)
          .groupBy(col("o_orderstatus"))
          .agg(
            array_join(sort_array(collect_set(col("o_orderpriority"))), ",").as("pris"),
            size(collect_set(col("o_orderpriority"))).cast("long").as("npri"),
            array_join(
              sort_array(collect_set(pmod(col("o_custkey"), lit(10L))))
                .cast("array<string>"), ",").as("custmods"),
            count(lit(1)).as("n"))
          .orderBy("o_orderstatus"),
      Some("""WITH m AS (SELECT o_orderstatus, o_orderpriority,
             |    o_custkey % 10 AS cm FROM orders)
             |SELECT o_orderstatus,
             |  array_to_string(list(DISTINCT o_orderpriority
             |    ORDER BY o_orderpriority), ',') AS pris,
             |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS npri,
             |  array_to_string(list(DISTINCT cm ORDER BY cm), ',') AS custmods,
             |  count(*) AS n
             |FROM m GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // R66: large IN-list (ref skipped suite: :644 testLargeIn, :589
    // testIn, :134 testAndInFilter). 500 literals — past Spark's
    // inSetConversionThreshold (10), so the predicate plans as InSet: ONE
    // O(1) hash-set probe per row inside whole-stage codegen, not a
    // 500-branch OR chain (the naive expansion testLargeBytecode guards
    // against). The In filter also pushes down whole to the scan
    // (PushedFilters carries all 500 values — parquet dictionary pages
    // and graft bloom-index claims each prune per value). The list is a
    // STATIC coprime progression (97 ⊥ 4000 ⇒ 500 distinct keys), baked
    // identically into both engines' texts — never corpus-derived (§5).
    QDef(
      "q_large_in",
      (s, d) => {
        val inKeys = Relational3.largeInKeys
        T.lineitem(s, d)
          .filter(col("l_partkey").isin(inKeys: _*) && col("l_quantity") < 30.0)
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            countDistinct(col("l_partkey")).as("nparts"),
            sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
          .orderBy("l_returnflag")
      },
      Some(s"""SELECT l_returnflag, count(*) AS n,
              |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS nparts,
              |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
              |FROM lineitem
              |WHERE l_partkey IN (${Relational3.largeInKeys.mkString(", ")})
              |  AND l_quantity < 30
              |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // R67: order-independent checksum aggregate (Presto's checksum() —
    // the migration/replication validator: prove a CTAS copy, a branch
    // fast-forward, or a cross-cluster replica carries EXACTLY the same
    // rows as its source WITHOUT sorting 100 TB). Each row renders to a
    // canonical '|'-joined string (ints verbatim, money as exact cents,
    // dates as ISO — every piece the same text in both engines), hashes
    // through md5 (the one hash both engines share bit-for-bit; 15 hex
    // digits = 60 bits, inside BIGINT), and XOR-folds per group: XOR is
    // commutative + associative, so partials map-side combine and the
    // result is identical under ANY partitioning/order — the property
    // that makes it a valid equality witness across engines. A second
    // single-column checksum shows the per-column variant that localizes
    // WHICH column diverged when the full-row checksums disagree.
    QDef(
      "q_checksum",
      (s, d) => {
        val cents = round(col("l_extendedprice") * 100).cast("long")
        T.lineitem(s, d)
          .select(col("l_returnflag"),
            concat_ws("|",
              col("l_orderkey").cast("string"),
              col("l_linenumber").cast("string"),
              col("l_partkey").cast("string"),
              cents.cast("string"),
              col("l_shipdate").cast("date").cast("string"),
              col("l_returnflag")).as("render"),
            cents.cast("string").as("prender"))
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            // r19: fused md5→60-bit native expression (BitsExpr) — the
            // hex-render + substr + base-16 parse tail of the previous
            // form collapsed into one digest pass; value bit-identical
            bit_xor(graft.functions.BitsExpr.md5Bits60(col("render")))
              .as("cksum"),
            bit_xor(graft.functions.BitsExpr.md5Bits60(col("prender")))
              .as("cksum_price"))
          .orderBy("l_returnflag")
      },
      Some("""WITH t AS (SELECT l_returnflag,
             |    CAST(l_orderkey AS VARCHAR) || '|' ||
             |    CAST(l_linenumber AS VARCHAR) || '|' ||
             |    CAST(l_partkey AS VARCHAR) || '|' ||
             |    CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR) || '|' ||
             |    CAST(CAST(l_shipdate AS DATE) AS VARCHAR) || '|' ||
             |    l_returnflag AS render,
             |    CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR) AS prender
             |  FROM lineitem)
             |SELECT l_returnflag, count(*) AS n,
             |  CAST(bit_xor(('0x' || substr(md5(render), 1, 15))::BIGINT) AS BIGINT)
             |    AS cksum,
             |  CAST(bit_xor(('0x' || substr(md5(prender), 1, 15))::BIGINT) AS BIGINT)
             |    AS cksum_price
             |FROM t GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // R68: null-safe equality join (Spark `<=>` ≡ SQL IS NOT DISTINCT
    // FROM — Presto's null-safe join face). The trap this pins: a plain
    // equi-join DROPS rows whose key is NULL on either side (NULL = NULL
    // is UNKNOWN), while the null-safe form matches NULL keys to each
    // other — the semantics dimension tables with "unknown" buckets
    // need. Plan shape matters as much as semantics: Spark's
    // ExtractEquiJoinKeys lifts EqualNullSafe into ordinary hash/SMJ
    // join keys (coalesce-wrapped), so this stays an equi-join — a
    // planner without that extraction degrades to a nested-loop scan of
    // every pair. Both sides pre-aggregate to ≤26 rows before the join,
    // so the join itself is bounded at any corpus size. FULL OUTER +
    // null-safe: right keys 20..24 exist only on the customer side and
    // surface as unmatched rows; the NULL bucket matches across.
    QDef(
      "q_nullsafe_join",
      (s, d) => {
        val lk = when(pmod(col("o_custkey"), lit(7L)) === 0, lit(null))
          .otherwise(pmod(col("o_custkey"), lit(20L)))
        val rk = when(pmod(col("c_custkey"), lit(5L)) === 0, lit(null))
          .otherwise(pmod(col("c_custkey"), lit(25L)))
        val l = T.orders(s, d)
          .select(lk.as("k"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .groupBy("k")
          .agg(count(lit(1)).as("cnt_l"), sum("cents").as("cents_l"))
        val r = T.customer(s, d)
          .select(rk.as("k"))
          .groupBy("k").agg(count(lit(1)).as("cnt_r"))
        l.join(r, l("k") <=> r("k"), "full_outer")
          .select(
            coalesce(l("k").cast("string"), r("k").cast("string"), lit("NULL"))
              .as("bucket"),
            coalesce(col("cnt_l"), lit(0L)).as("cnt_l"),
            coalesce(col("cents_l"), lit(0L)).as("cents_l"),
            coalesce(col("cnt_r"), lit(0L)).as("cnt_r"))
          .orderBy("bucket")
      },
      Some("""WITH l AS (SELECT CASE WHEN o_custkey % 7 = 0 THEN NULL
             |      ELSE o_custkey % 20 END AS k,
             |    count(*) AS cnt_l,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |      AS cents_l
             |  FROM orders GROUP BY 1),
             |r AS (SELECT CASE WHEN c_custkey % 5 = 0 THEN NULL
             |      ELSE c_custkey % 25 END AS k,
             |    count(*) AS cnt_r
             |  FROM customer GROUP BY 1)
             |SELECT coalesce(CAST(l.k AS VARCHAR), CAST(r.k AS VARCHAR), 'NULL')
             |    AS bucket,
             |  CAST(coalesce(cnt_l, 0) AS BIGINT) AS cnt_l,
             |  CAST(coalesce(cents_l, 0) AS BIGINT) AS cents_l,
             |  CAST(coalesce(cnt_r, 0) AS BIGINT) AS cnt_r
             |FROM l FULL JOIN r ON l.k IS NOT DISTINCT FROM r.k
             |ORDER BY bucket""".stripMargin)),

    // R69: histogram / map_agg family (Presto histogram(x),
    // map_agg(k, v), map_union — the map-SHAPED aggregates). Graft
    // renders the map scalar (§5: oracle cells must be scalar): the
    // value histogram builds as an ordinary two-level aggregate — counts
    // per (group, key) then a bounded per-group fold — NOT by
    // collecting raw rows into a map state, so the shuffled state is one
    // row per DISTINCT (group, key) pair regardless of corpus size. Keys
    // render "k:v" BEFORE collect_list (priority strings are distinct
    // per group, so the lexicographic sort_array IS the key order) and
    // the map_union face shows two disjoint sub-corpus histograms
    // merging by key-wise sum — associative, any partitioning.
    QDef(
      "q_histogram_map",
      (s, d) => {
        val half = (pmod(col("o_orderkey"), lit(2L)) === 0).cast("int")
        val l1 = T.orders(s, d)
          .select(col("o_orderstatus"), col("o_orderpriority"), half.as("h"))
          .groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("cnt"), sum("h").as("cnt_even"))
        l1.select(col("o_orderstatus"),
            concat(col("o_orderpriority"), lit(":"), col("cnt")).as("kv"),
            concat(col("o_orderpriority"), lit(":"), col("cnt_even"),
              lit("+"), (col("cnt") - col("cnt_even"))).as("kv2"),
            col("cnt"))
          .groupBy("o_orderstatus")
          .agg(
            array_join(sort_array(collect_list(col("kv"))), ",").as("hist"),
            array_join(sort_array(collect_list(col("kv2"))), ",").as("hist_union"),
            count(lit(1)).cast("long").as("nkeys"),
            sum("cnt").as("n"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH l1 AS (SELECT o_orderstatus, o_orderpriority,
             |    count(*) AS cnt,
             |    CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS cnt_even
             |  FROM orders GROUP BY 1, 2)
             |SELECT o_orderstatus,
             |  array_to_string(list(o_orderpriority || ':' || cnt
             |    ORDER BY o_orderpriority || ':' || cnt), ',') AS hist,
             |  array_to_string(list(o_orderpriority || ':' || cnt_even || '+'
             |      || (cnt - cnt_even)
             |    ORDER BY o_orderpriority || ':' || cnt_even || '+'
             |      || (cnt - cnt_even)), ',') AS hist_union,
             |  CAST(count(*) AS BIGINT) AS nkeys,
             |  CAST(sum(cnt) AS BIGINT) AS n
             |FROM l1 GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    /** R71: plain multiset array_agg (Presto `array_agg(x)`, ref :214)
      * with PINNED ordering (sort_array — array_agg alone is
      * order-nondeterministic under any parallel engine, so a replayable
      * result must sort), composed with UNNEST WITH ORDINALITY (ref
      * :1224): posexplode's pos+1 IS the ordinality. Two faces: `digits`
      * keeps DUPLICATES (right(n_name,1) repeats within a region — the
      * multiset property that separates array_agg from collect_set), and
      * the exploded rows round-trip the sorted array back to relational
      * form. Rendered scalar per §5. Scale contract: array_agg is only
      * sane over BOUNDED groups (a dim here); the corpus-scale "top-N
      * rows as array" sibling is MinNRows (q_max_min_by). */
    QDef(
      "q_array_agg",
      (s, d) => {
        val rn = T.region(s, d)
          .join(T.nation(s, d), col("n_regionkey") === col("r_regionkey"))
        val agg = rn.groupBy("r_name").agg(
          expr("sort_array(array_agg(n_name))").as("arr"),
          expr("array_join(sort_array(array_agg(right(n_name, 1))), ',')").as("digits"))
        agg.select(col("r_name"), col("digits"),
            array_join(col("arr"), ",").as("nations"),
            posexplode(col("arr")).as(Seq("p", "n_name")))
          .select(col("r_name"), col("nations"), col("digits"),
            (col("p") + 1).cast("long").as("pos"), col("n_name"))
          .orderBy("r_name", "pos")
      },
      Some("""WITH a AS (
             |  SELECT r_name,
             |    array_to_string(list(n_name ORDER BY n_name), ',') AS nations,
             |    array_to_string(list(right(n_name, 1)
             |      ORDER BY right(n_name, 1)), ',') AS digits
             |  FROM region JOIN nation ON n_regionkey = r_regionkey
             |  GROUP BY r_name),
             |e AS (
             |  SELECT r_name, n_name,
             |    CAST(row_number() OVER (PARTITION BY r_name ORDER BY n_name)
             |      AS BIGINT) AS pos
             |  FROM region JOIN nation ON n_regionkey = r_regionkey)
             |SELECT e.r_name, a.nations, a.digits, e.pos, e.n_name
             |FROM e JOIN a USING (r_name) ORDER BY r_name, pos""".stripMargin)),

    /** R72: Presto `reduce_agg` (ref :894) — the generic user-
      * programmable fold, integer-exact through the gate: a
      * sum-of-squares fold and a greatest-fold over BIGINT quantities
      * reproduce the builtin sum(x*x)/max(x) bit-for-bit under any
      * partitioning (commutative-associative integer folds). One fold
      * state per group crosses the shuffle (map-side combine through
      * the TypedImperativeAggregate partial path); the lambda bodies
      * are analysis-bound SQL lambdas. Machinery faces (string state,
      * null skipping, type-drift analysis error): ReduceAggSpec. */
    QDef(
      "q_reduce_agg",
      (s, d) => {
        import org.apache.spark.sql.graft.ReduceAgg.reduceAgg
        T.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            reduceAgg(col("l_quantity").cast("long"), lit(0L),
              "(s, x) -> s + x * x", "(a, b) -> a + b").as("ssq"),
            reduceAgg(col("l_quantity").cast("long"), lit(-1L),
              "(s, x) -> greatest(s, x)", "(a, b) -> greatest(a, b)").as("mxq"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
             |    AS BIGINT) AS ssq,
             |  CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS mxq,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // R73: key_sampling_percent (ref PrestoDistributedQueryTest.java:629
    // testKeyBasedSampling, :979 testSamplingJoinChain): a deterministic
    // per-key sampling coordinate — the SAME ~10% of orderkeys survive
    // on every table that filters by it, so the sampled orders join
    // chain (orders→lineitem→customer) is a consistent subgraph, not
    // two independent samples. Scale shape: the filter is a scan-side
    // scalar predicate (codegen'd native expression, no shuffle added);
    // the join chain shuffles only the pre-shrunk 10%.
    // Parity: poly fold + Fibonacci mix are exact BIGINT in both
    // engines and /2^32 is a power-of-two scale (exact in double), so
    // DuckDB replays the sample bit-for-bit (GraftV2.sampleBucket's
    // discipline — the raw poly fold of consecutive keys is sequential,
    // the mix is what de-correlates the sample from key ranges).
    QDef(
      "q_key_sample",
      (s, d) => {
        import graft.functions.HashExpr.keySamplingPercent
        val o = T.orders(s, d)
          .where(keySamplingPercent(col("o_orderkey").cast("string")) < lit(0.1))
        o.join(T.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(T.customer(s, d), col("c_custkey") === col("o_custkey"))
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("n"),
            countDistinct(col("o_orderkey")).as("keys"),
            round(sum("l_quantity"), 2).as("qty"))
          .orderBy("c_mktsegment")
      },
      Some(s"""WITH sampled AS (
             |  SELECT o_orderkey, o_custkey FROM orders
             |  WHERE CAST((${Dedup.polyHashSqlOf("CAST(o_orderkey AS VARCHAR)")}
             |          * 2654435761) % 4294967296 AS DOUBLE) / 4294967296 < 0.1)
             |SELECT c_mktsegment, count(*) AS n,
             |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS keys,
             |  round(sum(l_quantity), 2) AS qty
             |FROM sampled
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))
  )

  /** R66's static IN-list: 500 distinct keys (97 coprime to 4000), baked
    * into BOTH engine texts — never derived from the corpus (§5). */
  private[operators] lazy val largeInKeys: Seq[Long] =
    (1 to 500).map(i => 1L + (i.toLong * 97) % 4000)
}
