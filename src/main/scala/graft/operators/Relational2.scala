package graft.operators

import graft.{QDef, Tables => T}
import graft.functions.Text
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second tranche of relational coverage (SURVEY §2.2 R27–R30, R33–R34):
  * full outer join, pivot, explode/word-count, rank-family windows,
  * LISTAGG, RANGE-frame moving aggregates.
  */
object Relational2 {

  val defs: Seq[QDef] = Seq(
    // R27: FULL OUTER join — customers with no urgent orders and urgent
    // orders with no customer row both survive.
    QDef(
      "q_full_outer",
      (s, d) => {
        val c = T.customer(s, d).filter(col("c_acctbal") > 9000)
          .select(col("c_custkey"), col("c_mktsegment"))
        val o = T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("urgent_orders"))
        c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
          .groupBy(
            coalesce(col("c_mktsegment"), lit("NO_CUSTOMER")).as("seg"),
            col("c_custkey").isNull.as("no_cust"),
            col("o_custkey").isNull.as("no_orders"))
          .agg(count(lit(1)).as("n"),
            sum(coalesce(col("urgent_orders"), lit(0L))).as("urgent"))
          .orderBy("seg", "no_cust", "no_orders")
      },
      Some("""SELECT coalesce(c_mktsegment,'NO_CUSTOMER') AS seg,
             |  c_custkey IS NULL AS no_cust, o_custkey IS NULL AS no_orders,
             |  count(*) AS n,
             |  CAST(sum(coalesce(urgent_orders, 0)) AS BIGINT) AS urgent
             |FROM (SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 9000) c
             |FULL OUTER JOIN (
             |  SELECT o_custkey, count(*) AS urgent_orders FROM orders
             |  WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) o
             |ON c_custkey = o_custkey
             |GROUP BY seg, no_cust, no_orders
             |ORDER BY seg, no_cust, no_orders""".stripMargin)),

    // R28: pivot — orders count per status pivoted over priority buckets.
    QDef(
      "q_pivot",
      (s, d) =>
        T.orders(s, d)
          .withColumn("pri", substring(col("o_orderpriority"), 1, 1))
          .groupBy("o_orderstatus")
          .pivot("pri", Seq("1", "2", "3"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
             |  count(*) FILTER (substr(o_orderpriority,1,1) = '1') AS "1",
             |  count(*) FILTER (substr(o_orderpriority,1,1) = '2') AS "2",
             |  count(*) FILTER (substr(o_orderpriority,1,1) = '3') AS "3"
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // R29: explode / word count over documents (the lateral-view shape).
    QDef(
      "q_wordcount",
      (s, d) =>
        T.documents(s, d)
          .select(explode(Text.words(col("text"))).as("w"))
          .groupBy("w")
          .agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("w"))
          .limit(10),
      Some("""SELECT w, count(*) AS n
             |FROM (SELECT unnest(string_split_regex(trim(text),'\s+')) AS w FROM documents) t
             |GROUP BY w ORDER BY n DESC, w LIMIT 10""".stripMargin)),

    // R30: rank-family window functions — ntile/percent_rank/cume_dist.
    QDef(
      "q_window_ranks",
      (s, d) => {
        val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))
        T.customer(s, d)
          .select(
            col("c_mktsegment"), col("c_custkey"),
            ntile(4).over(w).cast("long").as("quartile"),
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"))
          .filter(col("c_custkey") % 50 === 0)
          .orderBy("c_mktsegment", "c_custkey")
      },
      Some("""SELECT c_mktsegment, c_custkey, quartile, round(pr,6) AS pr, round(cd,6) AS cd
             |FROM (SELECT c_mktsegment, c_custkey,
             |    ntile(4) OVER w AS quartile,
             |    percent_rank() OVER w AS pr,
             |    cume_dist() OVER w AS cd
             |  FROM customer
             |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)) t
             |WHERE c_custkey % 50 = 0
             |ORDER BY c_mktsegment, c_custkey""".stripMargin)),

    // R33: LISTAGG / string_agg (ref: Presto's listagg; Paimon's listagg
    // aggregation merge-engine function, mirrored by S26's fields.*.
    // aggregate-function=listagg). Scale shape: the aggregated set is
    // DISTINCT over a bounded domain (nations ≤ 25) so the collect_set
    // is map-side combinable and each group's list is bounded — a
    // listagg over unbounded per-group rows is the anti-pattern (use
    // L28's MinNSummary head instead). Sorted before joining so the
    // rendering is partitioning-independent.
    QDef(
      "q_listagg",
      (s, d) => {
        val c = T.customer(s, d)
        val n = T.nation(s, d)
        val pairs = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .select(col("c_mktsegment"), col("n_name")).distinct()
        pairs.groupBy("c_mktsegment")
          .agg(
            array_join(sort_array(collect_set(col("n_name"))), ",").as("nations"),
            count(lit(1)).as("n_nations"))
          .orderBy("c_mktsegment")
      },
      Some("""WITH p AS (SELECT DISTINCT c_mktsegment, n_name
             |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
             |SELECT c_mktsegment,
             |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
             |  count(*) AS n_nations
             |FROM p GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // R34: RANGE-frame moving aggregate — 7-day trailing order count per
    // priority bucket over daily pre-aggregates. The window input is one
    // row per (pri, day) — bounded by the calendar, not the fact table —
    // so the sort inside each partition stays tiny at any corpus size;
    // the heavy lifting is the map-side-combinable daily groupBy. RANGE
    // (value-based) framing, not ROWS: gap days genuinely age out of the
    // trailing week. Integer day arithmetic + one final IEEE division
    // keep both engines bit-identical.
    QDef(
      "q_moving_avg",
      (s, d) => {
        val daily = T.orders(s, d)
          .select(
            substring(col("o_orderpriority"), 1, 1).as("pri"),
            datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
              .cast("long").as("day_num"))
          .groupBy("pri", "day_num").agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("pri").orderBy("day_num").rangeBetween(-6, 0)
        daily.select(
            col("pri"), col("day_num"), col("n"),
            sum("n").over(w).as("n7"))
          .withColumn("avg7", round(col("n7").cast("double") / lit(7.0), 4))
          .orderBy("pri", "day_num")
      },
      Some("""WITH daily AS (
             |  SELECT substr(o_orderpriority, 1, 1) AS pri,
             |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_num,
             |    count(*) AS n
             |  FROM orders GROUP BY 1, 2),
             |win AS (
             |  SELECT pri, CAST(day_num AS BIGINT) AS day_num, n,
             |    CAST(sum(n) OVER (PARTITION BY pri ORDER BY day_num
             |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n7
             |  FROM daily)
             |SELECT pri, day_num, n, n7, round(n7 / 7.0, 4) AS avg7
             |FROM win ORDER BY pri, day_num""".stripMargin)),

    // R36: offset windows — lag/lead/first_value/last_value over each
    // customer's order history (the per-entity "previous event" shape:
    // order-over-order price delta, distance from the first order).
    // Scale shape: one hash shuffle on o_custkey; per-customer order
    // counts are bounded (TPC-H ~10) so no hot-key sort wall. All window
    // outputs are single picked VALUES (no cross-row float accumulation)
    // — the only derived float is one subtraction, a single IEEE op both
    // engines, rounded at the end. Deterministic: the window order
    // includes the unique o_orderkey tie-break.
    QDef(
      "q_lead_lag",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val wFull = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        T.orders(s, d)
          .select(
            col("o_custkey"), col("o_orderkey"),
            round(col("o_totalprice"), 2).as("price"),
            round(lag(col("o_totalprice"), 1).over(w), 2).as("prev_price"),
            round(lead(col("o_totalprice"), 1).over(w), 2).as("next_price"),
            round(first(col("o_totalprice")).over(wFull), 2).as("first_price"),
            round(last(col("o_totalprice")).over(wFull), 2).as("last_price"),
            round(col("o_totalprice") - first(col("o_totalprice")).over(wFull), 2)
              .as("delta_vs_first"))
          .filter(col("o_custkey") % 40 === 0)
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
             |  round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
             |  round(lead(o_totalprice, 1) OVER w, 2) AS next_price,
             |  round(first_value(o_totalprice) OVER wf, 2) AS first_price,
             |  round(last_value(o_totalprice) OVER wf, 2) AS last_price,
             |  round(o_totalprice - first_value(o_totalprice) OVER wf, 2) AS delta_vs_first
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |QUALIFY o_custkey % 40 = 0
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // R37: UNPIVOT (melt) — the inverse of R31's pivot: wide per-nation
    // measure columns rotate into (nation, measure, value) rows. Spark's
    // native unpivot (Dataset.unpivot, codegen'd expand — one pass, no
    // join) over a nation-level aggregate whose cardinality is bounded
    // by the dimension, so the rotation is metadata-cheap at any corpus
    // size; the heavy work is the map-side-combinable customer groupBy.
    // Measures are rounded BEFORE the rotation (one cross-row double sum,
    // the standard 2dp parity face) and the count casts to double to
    // share the single value column — mirrored literally by the oracle's
    // UNION ALL (the portable UNPIVOT phrasing).
    QDef(
      "q_unpivot",
      (s, d) => {
        val base = T.customer(s, d)
          .join(T.nation(s, d), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(
            count(lit(1)).cast("double").as("n_cust"),
            round(sum("c_acctbal"), 2).as("bal_sum"),
            round(max("c_acctbal"), 2).as("bal_max"))
        base.unpivot(
            Array(col("n_name")),
            Array(col("n_cust"), col("bal_sum"), col("bal_max")),
            "measure", "value")
          .orderBy("n_name", "measure")
      },
      Some("""WITH base AS (
             |  SELECT n_name, CAST(count(*) AS DOUBLE) AS n_cust,
             |    round(sum(c_acctbal), 2) AS bal_sum,
             |    round(max(c_acctbal), 2) AS bal_max
             |  FROM customer JOIN nation ON c_nationkey = n_nationkey
             |  GROUP BY n_name)
             |SELECT n_name, measure, value FROM (
             |  SELECT n_name, 'n_cust' AS measure, n_cust AS value FROM base
             |  UNION ALL
             |  SELECT n_name, 'bal_sum', bal_sum FROM base
             |  UNION ALL
             |  SELECT n_name, 'bal_max', bal_max FROM base)
             |ORDER BY n_name, measure""".stripMargin)),

    // R38: explicit GROUPING SETS — arbitrary grouping-set lattices
    // beyond the rollup (R17) / cube (R23) shorthands: here
    // ((status, pri), (status), (pri), ()) — the rollup is NOT this set
    // (it lacks the (pri)-only slice). grouping_id disambiguates a
    // SET-projected null from a real null in the data; Spark's native
    // groupingSets + DuckDB GROUPING follow the same standard bit order
    // (first listed column = most significant). One expand + one
    // shuffle, the same plan class as rollup/cube — no per-set rescans.
    QDef(
      "q_grouping_sets",
      (s, d) => {
        val o = T.orders(s, d)
        o.groupingSets(
            Seq(
              Seq(col("o_orderstatus"), col("o_orderpriority")),
              Seq(col("o_orderstatus")),
              Seq(col("o_orderpriority")),
              Seq.empty[org.apache.spark.sql.Column]),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            grouping_id().as("gid"),
            count(lit(1)).as("n"),
            // exact cent sums (see q1_agg: double-sum drift at sf10 scale)
            round(sum(round(col("o_totalprice") * 100).cast("long")) / 100.0, 2)
              .as("total"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
            col("gid"), col("n"), col("total"))
          .orderBy("gid", "status", "pri")
      },
      Some("""SELECT coalesce(o_orderstatus,'ALL') AS status,
             |  coalesce(o_orderpriority,'ALL') AS pri,
             |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
             |  count(*) AS n,
             |  round(CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
             |    / 100.0, 2) AS total
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
             |  (o_orderstatus), (o_orderpriority), ())
             |ORDER BY gid, status, pri""".stripMargin)),

    // R39: semi-structured JSON access — a REAL JSON parse of the
    // events.props payload (from_json with a declared schema — Jackson
    // under Spark's codegen'd JsonToStructs — vs DuckDB's JSON
    // extension), not the regexp shortcut of R19: malformed/missing
    // keys become NULLs on both engines (from_json null field ≡
    // json_extract_string miss), aggregated per event_type. Integer
    // sums/extrema only — no float parity surface at all. The schema-on
    // -read shape: at 100 TB the parse is one codegen'd map pass and the
    // aggregation is the usual map-side-combinable shuffle.
    QDef(
      "q_json_extract",
      (s, d) => {
        val k = from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))).getField("k")
        T.events(s, d)
          .select(col("event_type"), k.as("k"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            count(col("k")).as("n_with_k"),
            sum("k").as("k_sum"),
            min("k").as("k_min"),
            max("k").as("k_max"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
             |  count(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
             |  CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
             |  min(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
             |  max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
             |FROM events
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // R40: bivariate statistical aggregates — corr / covar_samp /
    // regr_slope / regr_intercept of (l_quantity, l_extendedprice) per
    // return flag (the OLS fit every profiling layer exposes; Presto
    // ships the same regr_/corr family). Each is one map-side-combinable
    // co-moment aggregation (Tungsten's declarative central-moment
    // updates — n, Σx, Σy, co-moments merged associatively), so the
    // whole query is a single shuffle of 3 groups at any scale. Doubles
    // rounded (corr to 4dp — it lives in [-1,1]; the rest to 2dp): the
    // engines accumulate co-moments in different orders, so parity is
    // by rounding distance, same as q_stats (§5).
    QDef(
      "q_corr_regr",
      (s, d) =>
        T.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("r"),
            round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov"),
            round(regr_slope(col("l_extendedprice"), col("l_quantity")), 2).as("slope"),
            round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2).as("icept"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(*) AS n,
             |  round(corr(l_quantity, l_extendedprice), 4) AS r,
             |  round(covar_samp(l_quantity, l_extendedprice), 2) AS cov,
             |  round(regr_slope(l_extendedprice, l_quantity), 2) AS slope,
             |  round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // R41: date/interval arithmetic — order-to-ship latency per priority
    // (datediff over casted dates; the Presto date_diff family). The
    // join is co-keyed on orderkey (shuffle join, AQE-sized); latency
    // sums are exact integers, each ratio ONE division (§5). Day
    // arithmetic is calendar-exact on both engines (DATE cast strips
    // the time component identically).
    QDef(
      "q_ship_latency",
      (s, d) => {
        val l = T.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
        val o = T.orders(s, d)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderpriority"),
            datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date")).as("dd"))
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            min("dd").cast("long").as("mn_days"),
            max("dd").cast("long").as("mx_days"),
            round(sum("dd").cast("double") / count(lit(1)), 2).as("avg_days"),
            round(sum(when(col("dd") <= 30, 1L).otherwise(0L)).cast("double")
              / count(lit(1)), 4).as("within30"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH j AS (SELECT o_orderpriority,
             |    date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS dd
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
             |SELECT o_orderpriority, count(*) AS n,
             |  CAST(min(dd) AS BIGINT) AS mn_days,
             |  CAST(max(dd) AS BIGINT) AS mx_days,
             |  round(CAST(sum(dd) AS DOUBLE) / count(*), 2) AS avg_days,
             |  round(CAST(sum(CASE WHEN dd <= 30 THEN 1 ELSE 0 END) AS DOUBLE)
             |    / count(*), 4) AS within30
             |FROM j GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // R42: NOT IN vs NOT EXISTS under NULLs — the three-valued-logic
    // trap every SQL engine must honor: a NULL in the NOT IN subquery
    // makes the predicate UNKNOWN for every row (zero survivors), while
    // the NOT EXISTS form anti-joins normally. One query returns both
    // counts side by side, plus the IN count as the control. Declared
    // via spark.sql — Catalyst plans the null-aware anti join natively
    // (a broadcast null-aware single-column NAAJ, not a cartesian).
    QDef(
      "q_not_in_null",
      (s, d) => {
        T.orders(s, d).createOrReplaceTempView("r42_orders")
        T.customer(s, d).createOrReplaceTempView("r42_customer")
        s.sql("""
          |WITH risky AS (
          |  SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END AS k
          |  FROM r42_customer)
          |SELECT
          |  (SELECT count(*) FROM r42_orders WHERE o_custkey NOT IN (SELECT k FROM risky))
          |    AS n_not_in,
          |  (SELECT count(*) FROM r42_orders o
          |     WHERE NOT EXISTS (SELECT 1 FROM risky r WHERE r.k = o.o_custkey))
          |    AS n_not_exists,
          |  (SELECT count(*) FROM r42_orders WHERE o_custkey IN (SELECT k FROM risky))
          |    AS n_in
          |""".stripMargin)
      },
      Some("""WITH risky AS (
             |  SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END AS k
             |  FROM customer)
             |SELECT
             |  (SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT k FROM risky))
             |    AS n_not_in,
             |  (SELECT count(*) FROM orders o
             |     WHERE NOT EXISTS (SELECT 1 FROM risky r WHERE r.k = o.o_custkey))
             |    AS n_not_exists,
             |  (SELECT count(*) FROM orders WHERE o_custkey IN (SELECT k FROM risky))
             |    AS n_in""".stripMargin)),

    // R43: correlated LATERAL join — for every region, the top-2 nations
    // by total customer balance computed by a correlated subquery with
    // its own ORDER BY + LIMIT (the per-outer-row top-k shape Presto
    // runs as CROSS JOIN LATERAL / UNNEST pipelines). Catalyst
    // DECORRELATES the lateral into a join + per-key window rank — one
    // shuffle on the correlation key, never an outer-row-count re-scan
    // of the inner table; the outer side here is a 5-row dim, and the
    // inner aggregate is map-side combinable. Deterministic: the lateral
    // orders by (bal DESC, n_name) with the rounded 2dp balance.
    QDef(
      "q_lateral",
      (s, d) => {
        T.region(s, d).createOrReplaceTempView("r43_region")
        T.nation(s, d).createOrReplaceTempView("r43_nation")
        T.customer(s, d).createOrReplaceTempView("r43_customer")
        s.sql("""
          |SELECT r_name, n_name, bal FROM r43_region,
          |LATERAL (
          |  SELECT n_name, round(sum(c_acctbal), 2) AS bal
          |  FROM r43_nation JOIN r43_customer ON c_nationkey = n_nationkey
          |  WHERE n_regionkey = r_regionkey
          |  GROUP BY n_name ORDER BY bal DESC, n_name LIMIT 2)
          |ORDER BY r_name, bal DESC, n_name
          |""".stripMargin)
      },
      Some("""SELECT r_name, n_name, bal FROM region
             |CROSS JOIN LATERAL (
             |  SELECT n_name, round(sum(c_acctbal), 2) AS bal
             |  FROM nation JOIN customer ON c_nationkey = n_nationkey
             |  WHERE n_regionkey = r_regionkey
             |  GROUP BY n_name ORDER BY bal DESC, n_name LIMIT 2) t
             |ORDER BY r_name, bal DESC, n_name""".stripMargin)),

    // R44: conditional / boolean aggregates — count_if, bool_and,
    // bool_or, and the FILTERed-count idiom (Presto ships the same
    // count_if / bool_and / bool_or family). Each is one
    // map-side-combinable aggregate over exact predicates on exact
    // values (integer thresholds on 2dp doubles never sit on a rounding
    // boundary); the whole query is a single shuffle of 5 groups at any
    // scale. DuckDB phrases count_if as count(*) FILTER — same
    // semantics, NULL predicate rows counted by neither engine.
    QDef(
      "q_cond_agg",
      (s, d) =>
        T.orders(s, d)
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            expr("count_if(o_totalprice > 200000)").as("n_big"),
            expr("count_if(o_orderstatus = 'F')").as("n_fin"),
            expr("bool_and(o_totalprice > 0)").as("all_pos"),
            expr("bool_or(o_totalprice > 400000)").as("any_huge"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS n,
             |  count(*) FILTER (o_totalprice > 200000) AS n_big,
             |  count(*) FILTER (o_orderstatus = 'F') AS n_fin,
             |  bool_and(o_totalprice > 0) AS all_pos,
             |  bool_or(o_totalprice > 400000) AS any_huge
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // R46: INTERSECT ALL / EXCEPT ALL — the BAG-semantic set operations
    // (R23 covers the DISTINCT forms): multiplicities matter, so a user
    // with 3 purchases and 1 click contributes min(3,1)=1 row to
    // INTERSECT ALL and 3-1=2 rows to EXCEPT ALL. Catalyst plans both as
    // one hash aggregate per side + a join on the value (count-based
    // replication, no sort), exactly the standard multiset algebra; the
    // final groupBy collapses to two rows at any scale.
    QDef(
      "q_setops_all",
      (s, d) => {
        val ev = T.events(s, d)
        val buy = ev.filter(col("event_type") === "purchase").select(col("user_id"))
        val click = ev.filter(col("event_type") === "click").select(col("user_id"))
        buy.intersectAll(click).withColumn("src", lit("intersect_all"))
          .unionByName(buy.exceptAll(click).withColumn("src", lit("except_all")))
          .groupBy("src").agg(count(lit(1)).as("n"))
          .orderBy("src")
      },
      Some("""WITH buy AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
             |clk AS (SELECT user_id FROM events WHERE event_type = 'click'),
             |u AS (
             |  SELECT 'intersect_all' AS src, user_id FROM
             |    (SELECT user_id FROM buy INTERSECT ALL SELECT user_id FROM clk)
             |  UNION ALL
             |  SELECT 'except_all', user_id FROM
             |    (SELECT user_id FROM buy EXCEPT ALL SELECT user_id FROM clk))
             |SELECT src, count(*) AS n FROM u GROUP BY src ORDER BY src""".stripMargin)),

    // R45: width_bucket numeric histogram — fixed-grid value histogram
    // of order totals (Presto's width_bucket; the profiling primitive
    // behind every "distribution of X" dashboard). Bucketed on the
    // INTEGER-VALUED floor of the price: an integer-valued double
    // divided by the bucket width is ≥ 2e-5 away from the next integer
    // unless exactly on a boundary (where both engines are exact), so
    // no 1-ulp engine difference can flip a bucket — the §5
    // exactly-representable-derivation rule applied to binning (raw 2dp
    // doubles CAN straddle a boundary ulp). One codegen pass + one
    // shuffle of ≤ 14 groups; the per-bucket total is an exact integer
    // sum. DuckDB has no width_bucket — the oracle replays Spark's
    // definition (below lo → 0, ≥ hi → n+1, else 1 + floor offset).
    QDef(
      "q_histogram",
      (s, d) =>
        T.orders(s, d)
          .withColumn("usd", floor(col("o_totalprice")).cast("double"))
          .withColumn("bucket", expr("width_bucket(usd, 0D, 600000D, 12)"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), sum(col("usd")).cast("long").as("total_usd"))
          .orderBy("bucket"),
      Some("""WITH b AS (
             |  SELECT CAST(floor(o_totalprice) AS DOUBLE) AS usd,
             |    CASE WHEN floor(o_totalprice) < 0 THEN 0
             |         WHEN floor(o_totalprice) >= 600000 THEN 13
             |         ELSE 1 + CAST(floor(CAST(floor(o_totalprice) AS DOUBLE) / 50000.0) AS BIGINT)
             |    END AS bucket
             |  FROM orders)
             |SELECT bucket, count(*) AS n, CAST(sum(usd) AS BIGINT) AS total_usd
             |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // R47: quantified subqueries (> ALL, < ANY) — expressed Spark-first
    // as their standard decorrelations, checked against DuckDB's NATIVE
    // ALL/ANY syntax so the rewrites are proven semantics-equivalent:
    //   x > ALL S  ⇔  S empty OR x > max(S)   (S null-free here)
    //   x < ANY S_corr ⇔ x < max(S_corr) with the correlation as a join
    // The uncorrelated branch broadcasts a 1-row (max,count) aggregate
    // (no shuffle of `part`); the correlated branch pre-aggregates
    // customer to 25 nation rows and broadcasts — at 100 TB both sides
    // stay a scan + broadcast-hash-join, never a per-row subquery. An
    // empty correlated set (nation with no customers) is FALSE under
    // `< ANY`, matching the inner join's drop. Membership pinned by
    // exact key sums, not just counts.
    QDef(
      "q_any_all",
      (s, d) => {
        val part = T.part(s, d)
        val sub = part.filter(col("p_brand") === "Brand#23")
          .agg(max(col("p_retailprice")).as("mx"), count(lit(1)).as("cnt"))
        // crossJoin of a broadcast 1-ROW aggregate — plans as a BNLJ
        // whose build side is a single row by construction (a
        // constant-key equi-join does not help: Catalyst constant-folds
        // the foldable keys and degenerates it to the same BNLJ);
        // allowlisted in PlanAuditSpec with the ANN probe sets
        val allGt = part.crossJoin(broadcast(sub))
          .filter(col("cnt") === 0 || col("p_retailprice") > col("mx"))
          .agg(count(lit(1)).as("n"), sum(col("p_partkey")).as("key_sum"))
          .select(lit("all_gt").as("src"), col("n"), col("key_sum"))
        val natMax = T.customer(s, d)
          .groupBy("c_nationkey").agg(max("c_acctbal").as("cmx"))
        val anyLt = T.supplier(s, d)
          .join(broadcast(natMax), col("s_nationkey") === col("c_nationkey"))
          .filter(col("s_acctbal") < col("cmx"))
          .agg(count(lit(1)).as("n"), sum(col("s_suppkey")).as("key_sum"))
          .select(lit("any_lt").as("src"), col("n"), col("key_sum"))
        allGt.unionByName(anyLt).orderBy("src")
      },
      Some("""SELECT * FROM (
             |  SELECT 'all_gt' AS src, count(*) AS n,
             |    CAST(sum(p_partkey) AS BIGINT) AS key_sum
             |  FROM part
             |  WHERE p_retailprice > ALL
             |    (SELECT p_retailprice FROM part WHERE p_brand = 'Brand#23')
             |  UNION ALL
             |  SELECT 'any_lt', count(*), CAST(sum(s_suppkey) AS BIGINT)
             |  FROM supplier s
             |  WHERE s_acctbal < ANY
             |    (SELECT c_acctbal FROM customer c
             |     WHERE c.c_nationkey = s.s_nationkey))
             |ORDER BY src""".stripMargin)),

    // R48: window VALUE functions — first_value / last_value /
    // nth_value over an explicit full frame (the default frame stops at
    // CURRENT ROW, where last_value degenerates to the row itself) plus
    // first_value(... IGNORE NULLS) skipping non-urgent orders. The
    // order (o_orderdate, o_orderkey) is a total order (unique key), so
    // every reading is deterministic; the frame-constant results
    // collapse to one row per customer via min(). One shuffle on
    // o_custkey; per-customer partitions are bounded (≤ 25 orders), so
    // no hot-key wall at scale.
    QDef(
      "q_first_last",
      (s, d) => {
        val wf = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        T.orders(s, d)
          .withColumn("urgent_price",
            when(col("o_orderpriority") === "1-URGENT", col("o_totalprice")))
          .select(col("o_custkey").as("cust"),
            first(col("o_totalprice")).over(wf).as("fp"),
            last(col("o_totalprice")).over(wf).as("lp"),
            nth_value(col("o_totalprice"), 2).over(wf).as("sp"),
            first(col("urgent_price"), ignoreNulls = true).over(wf).as("fu"))
          .groupBy("cust")
          .agg(round(min("fp"), 2).as("first_price"),
            round(min("lp"), 2).as("last_price"),
            round(min("sp"), 2).as("second_price"),
            round(min("fu"), 2).as("first_urgent"))
          .orderBy("cust")
      },
      Some("""WITH w AS (
             |  SELECT o_custkey AS cust,
             |    first_value(o_totalprice) OVER win AS fp,
             |    last_value(o_totalprice) OVER win AS lp,
             |    nth_value(o_totalprice, 2) OVER win AS sp,
             |    first_value(CASE WHEN o_orderpriority = '1-URGENT'
             |                     THEN o_totalprice END IGNORE NULLS)
             |      OVER win AS fu
             |  FROM orders
             |  WINDOW win AS (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
             |SELECT cust, round(min(fp), 2) AS first_price,
             |  round(min(lp), 2) AS last_price,
             |  round(min(sp), 2) AS second_price,
             |  round(min(fu), 2) AS first_urgent
             |FROM w GROUP BY cust ORDER BY cust""".stripMargin)),

    // R49: correlated SCALAR subquery in the select list — each
    // customer's balance against THEIR nation's average (the per-row
    // lookup shape; R47 covers the quantified-filter shape). Spark-first
    // it decorrelates to one 25-row aggregate broadcast-joined back —
    // never a per-row rescan. §5 parity: balances floor to
    // integer-valued doubles, so the per-nation sum is exact under any
    // partitioning and avg/diff are single IEEE ops both engines.
    QDef(
      "q_scalar_subquery",
      (s, d) => {
        val c = T.customer(s, d)
          .withColumn("bal", floor(col("c_acctbal")).cast("double"))
        val natAvg = c.groupBy("c_nationkey")
          .agg((sum("bal") / count(lit(1))).as("nat_avg"))
        c.join(broadcast(natAvg), Seq("c_nationkey"))
          .withColumn("above", col("bal") > col("nat_avg") + lit(500.0))
          .groupBy(col("c_nationkey").as("nation"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("above"), 1L).otherwise(0L)).as("n_above"),
            sum(when(col("above"), col("c_custkey"))).as("above_keys"),
            round(min("nat_avg"), 2).as("nat_avg"))
          .orderBy("nation")
      },
      Some("""SELECT c_nationkey AS nation, count(*) AS n,
             |  CAST(sum(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
             |  CAST(sum(CASE WHEN above THEN c_custkey END) AS BIGINT) AS above_keys,
             |  round(min(nat_avg), 2) AS nat_avg
             |FROM (
             |  SELECT c_custkey, c_nationkey,
             |    (SELECT CAST(sum(floor(c2.c_acctbal)) AS DOUBLE) / count(*)
             |     FROM customer c2
             |     WHERE c2.c_nationkey = c.c_nationkey) AS nat_avg,
             |    floor(c_acctbal) > (SELECT CAST(sum(floor(c2.c_acctbal)) AS DOUBLE)
             |        / count(*) + 500.0
             |      FROM customer c2
             |      WHERE c2.c_nationkey = c.c_nationkey) AS above
             |  FROM customer c)
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // R50: count-of-counts (frequency-of-frequency histogram) — the
    // distribution of per-customer order counts: a two-level aggregation
    // (groupBy → groupBy of the counts). Both levels are map-side-
    // combinable integer counts; level 2's key space is ≤ max orders
    // per customer (~25), so the second shuffle is trivially small at
    // any scale. Membership pinned by exact key sums.
    QDef(
      "q_count_of_counts",
      (s, d) =>
        T.orders(s, d)
          .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
          .groupBy("n_orders")
          .agg(count(lit(1)).as("customers"), sum("o_custkey").as("key_sum"))
          .orderBy("n_orders"),
      Some("""SELECT n_orders, count(*) AS customers,
             |  CAST(sum(o_custkey) AS BIGINT) AS key_sum
             |FROM (SELECT o_custkey, count(*) AS n_orders
             |      FROM orders GROUP BY o_custkey)
             |GROUP BY n_orders ORDER BY n_orders""".stripMargin)),

    // R51: percent-of-total (ratio_to_report) — each nation's share of
    // its region's customer balance via a window sum over the grouped
    // frame (Presto/Oracle's RATIO_TO_REPORT shape). The window runs
    // over 25 GROUPED rows, never the base table, so the only
    // full-corpus work is one map-combinable aggregation. §5: balances
    // floored to integer-valued doubles ⇒ group sums exact under any
    // partitioning; the share is one division, rounded.
    QDef(
      "q_pct_of_total",
      (s, d) => {
        val n = T.nation(s, d).select(col("n_nationkey"), col("n_regionkey"))
        val per = T.customer(s, d)
          .withColumn("bal", floor(col("c_acctbal")))
          .groupBy("c_nationkey").agg(sum("bal").cast("double").as("nat_bal"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        per
          .withColumn("reg_bal",
            sum("nat_bal").over(Window.partitionBy("n_regionkey")))
          .select(col("n_regionkey").as("region"), col("c_nationkey").as("nation"),
            round(col("nat_bal"), 2).as("nat_bal"),
            round(col("nat_bal") / col("reg_bal") * lit(100.0), 4).as("pct"))
          .orderBy("region", "nation")
      },
      Some("""WITH per AS (
             |  SELECT n.n_regionkey AS region, c.c_nationkey AS nation,
             |    CAST(sum(floor(c.c_acctbal)) AS DOUBLE) AS nat_bal
             |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
             |  GROUP BY n.n_regionkey, c.c_nationkey)
             |SELECT region, nation, round(nat_bal, 2) AS nat_bal,
             |  round(nat_bal / sum(nat_bal) OVER (PARTITION BY region) * 100.0, 4)
             |    AS pct
             |FROM per ORDER BY region, nation""".stripMargin)),

    // R52: period-over-period growth — monthly order revenue with the
    // previous month's value and the growth rate (the WoW/MoM dashboard
    // shape: aggregate to a calendar series, then lag over it). The lag
    // runs over ≤ tens of MONTH rows; revenue floors to exact integer
    // sums (§5), growth is one subtraction + one division on those
    // exact values, rounded; first month's growth is NULL both engines.
    QDef(
      "q_period_growth",
      (s, d) => {
        val m = T.orders(s, d)
          .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
          .groupBy("month")
          .agg(sum(floor(col("o_totalprice"))).cast("double").as("revenue"))
        val w = Window.orderBy("month")
        m.withColumn("prev", lag(col("revenue"), 1).over(w))
          .select(col("month"), round(col("revenue"), 2).as("revenue"),
            round(col("prev"), 2).as("prev_revenue"),
            round((col("revenue") - col("prev")) / col("prev") * lit(100.0), 4)
              .as("growth_pct"))
          .orderBy("month")
      },
      Some("""WITH m AS (
             |  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
             |    CAST(sum(floor(o_totalprice)) AS DOUBLE) AS revenue
             |  FROM orders GROUP BY 1)
             |SELECT month, round(revenue, 2) AS revenue,
             |  round(lag(revenue) OVER (ORDER BY month), 2) AS prev_revenue,
             |  round((revenue - lag(revenue) OVER (ORDER BY month))
             |      / lag(revenue) OVER (ORDER BY month) * 100.0, 4) AS growth_pct
             |FROM m ORDER BY month""".stripMargin)),

    // R53: TABLESAMPLE BERNOULLI parity (ref: paimon-presto TestPrestoSqlITCase
    // testTableSampleBernoulli). Presto's BERNOULLI(p) is an RNG coin flip
    // per row; the parity form is the deterministic hash-threshold draw
    // (the L14 machinery): keep a row iff polyhash(key) mod 10000 < p*100.
    // Pure function of the data → stable across runs/partitionings/task
    // retries, exactly replayable by DuckDB, and at 100 TB exactly what a
    // reproducible sample needs (a seeded RNG sample changes with the
    // partitioning; this never does). 20% draw, aggregated per returnflag.
    QDef(
      "q_sample_bernoulli",
      (s, d) => {
        val h = pmod(
          graft.functions.HashExpr.polyHash(
            concat(col("l_orderkey").cast("string"), lit(":"),
              col("l_linenumber").cast("string"))),
          lit(10000L))
        T.lineitem(s, d).filter(h < 2000L)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            round(sum("l_quantity"), 2).as("sum_qty"))
          .orderBy("l_returnflag")
      },
      Some(s"""SELECT l_returnflag, count(*) AS n,
              |  round(sum(l_quantity), 2) AS sum_qty
              |FROM lineitem
              |WHERE ${Dedup.polyHashSqlOf(
                 "CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)")} % 10000 < 2000
              |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))
  )
}
