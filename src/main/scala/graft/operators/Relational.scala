package graft.operators

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query surface (SURVEY §2.2, R1–R21) — the SQL semantics the
  * reference's Presto engine runs over a Paimon scan
  * (ref: paimon-presto-common/.../TestPrestoITCase.java). Re-expressed
  * declaratively so Catalyst does pushdown/pruning/join-selection; dims are
  * broadcast explicitly where the optimizer can't know they stay small.
  *
  * Oracle parity rules (SURVEY §5): double aggregates rounded to 2dp on
  * both sides; derived ints cast to BIGINT on both sides; every result
  * deterministically ordered.
  */
object Relational {

  private def ts(s: String) = to_timestamp(lit(s))

  val defs: Seq[QDef] = Seq(
    // R1: TPC-H Q1 shape — grouped agg, map-side partial agg, 1 shuffle.
    // Money sums are EXACT-INTEGER sums of per-row quantized units
    // (cents / 1e-4 units): a raw double sum's last-ulp error is
    // summation-ORDER-dependent, and at 60M rows (the sf10 gate) the
    // accumulated drift crosses the half-cent that round(.,2) absorbs —
    // the two engines then legitimately disagree. The per-row quantize
    // is the same IEEE multiply+round both engines, the BIGINT sum is
    // order-independent, and the closing /scale is one shared division
    // (§5, the QuantizeVec discipline applied to money). l_quantity is
    // integer-valued, so its double sum is already exact at any SF.
    QDef(
      "q1_agg",
      (s, d) =>
        T.lineitem(s, d)
          .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum("l_quantity"), 2).as("sum_qty"),
            round(sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0, 2)
              .as("sum_base"),
            round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
              .cast("long")) / 10000.0, 2).as("sum_disc_price"),
            round(avg("l_quantity"), 2).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity),2) AS sum_qty,
             |  round(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
             |    / 100.0, 2) AS sum_base,
             |  round(CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))
             |    AS BIGINT) / 10000.0, 2) AS sum_disc_price,
             |  round(avg(l_quantity),2) AS avg_qty,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // R2: filter + arithmetic agg (Q6 shape) — fully pushed scan filters.
    QDef(
      "q6_filter_agg",
      (s, d) =>
        T.lineitem(s, d)
          .filter(
            col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
              col("l_shipdate") < ts("1997-01-01 00:00:00") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
          .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
            .as("revenue")),
      Some("""SELECT round(sum(l_extendedprice*l_discount),2) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_discount BETWEEN 0.05 AND 0.07
             |  AND l_quantity < 24""".stripMargin)),

    // R3: 3-way join + agg + top-k (Q3 shape). customer is the small side
    // of the first join at any SF ratio — broadcast it.
    QDef(
      "q3_join_agg",
      (s, d) => {
        val c = T.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val o = T.orders(s, d).filter(col("o_orderdate") < ts("1998-01-01 00:00:00"))
        val l = T.lineitem(s, d).filter(col("l_shipdate") > ts("1996-01-01 00:00:00"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(
            col("l_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_odate"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
          .select("l_orderkey", "revenue", "o_odate")
          .orderBy(desc("revenue"), col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey,
             |  round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
             |  strftime(o_orderdate,'%Y-%m-%d') AS o_odate
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             |  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
             |GROUP BY l_orderkey, o_odate
             |ORDER BY revenue DESC, l_orderkey
             |LIMIT 10""".stripMargin)),

    // R4: 5-table join (Q5 shape); all dims broadcast, one shuffle join
    // lineitem⨝orders, everything else map-side.
    QDef(
      "q5_multi_join",
      (s, d) => {
        val r = T.region(s, d).filter(col("r_name") === "ASIA")
        val n = T.nation(s, d)
        val c = T.customer(s, d)
        val sup = T.supplier(s, d)
        val o = T.orders(s, d).filter(
          col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
            col("o_orderdate") < ts("1997-01-01 00:00:00"))
        val l = T.lineitem(s, d)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(c),
            col("o_custkey") === col("c_custkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy(desc("revenue"), col("n_name"))
      },
      Some("""SELECT n_name,
             |  round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY n_name
             |ORDER BY revenue DESC, n_name""".stripMargin)),

    // R5: left outer join + two-level agg (Q13 shape).
    QDef(
      "q13_outer_join",
      (s, d) => {
        val c = T.customer(s, d)
        val o = T.orders(s, d)
        c.join(o,
            col("c_custkey") === col("o_custkey") &&
              col("o_orderpriority") =!= "1-URGENT",
            "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(desc("custdist"), desc("c_count"))
      },
      Some("""SELECT c_count, count(*) AS custdist
             |FROM (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT OUTER JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |  GROUP BY c_custkey) t
             |GROUP BY c_count
             |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // R6: semi join (EXISTS) — Spark left_semi, no row duplication.
    QDef(
      "q4_semi_join",
      (s, d) => {
        val o = T.orders(s, d).filter(
          col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
            col("o_orderdate") < ts("1997-01-01 00:00:00"))
        val l = T.lineitem(s, d).filter(col("l_quantity") > 45)
          .select(col("l_orderkey"))
        o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // R7: anti join (NOT EXISTS).
    QDef(
      "q_anti_join",
      (s, d) => {
        val c = T.customer(s, d)
        val o = T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey"))
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n
             |FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    // R8: DISTINCT aggregates.
    QDef(
      "q_distinct",
      (s, d) =>
        T.lineitem(s, d)
          .filter(col("l_quantity") > 25)
          .agg(
            countDistinct(col("l_partkey")).as("parts"),
            countDistinct(col("l_suppkey")).as("supps"),
            count(lit(1)).as("n")),
      Some("""SELECT count(DISTINCT l_partkey) AS parts,
             |  count(DISTINCT l_suppkey) AS supps, count(*) AS n
             |FROM lineitem WHERE l_quantity > 25""".stripMargin)),

    // R9: global top-k — Spark TakeOrderedAndProject, no full sort at scale.
    QDef(
      "q_topk",
      (s, d) =>
        T.orders(s, d)
          .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
          .orderBy(desc("price"), col("o_orderkey"))
          .limit(10),
      Some("""SELECT o_orderkey, round(o_totalprice,2) AS price
             |FROM orders ORDER BY price DESC, o_orderkey LIMIT 10""".stripMargin)),

    // R10: window functions — row_number / rank / running sum / lag.
    QDef(
      "q_window",
      (s, d) => {
        val wSeq = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        val wPrice = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
        T.orders(s, d)
          .select(
            col("o_custkey"), col("o_orderkey"),
            row_number().over(wSeq).cast("long").as("rn"),
            rank().over(wPrice).cast("long").as("rnk"),
            round(sum(col("o_totalprice"))
              .over(wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
              .as("run_sum"),
            round(lag(col("o_totalprice"), 1).over(wSeq), 2).as("prev_price"))
          .filter(col("rn") <= 3)
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, rn, rnk,
             |  round(run_sum,2) AS run_sum, round(prev_price,2) AS prev_price
             |FROM (
             |  SELECT o_custkey, o_orderkey,
             |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
             |    rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
             |    sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_sum,
             |    lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
             |  FROM orders) t
             |WHERE rn <= 3
             |ORDER BY o_custkey, rn""".stripMargin)),

    // R11: HAVING.
    QDef(
      "q_having",
      (s, d) =>
        T.lineitem(s, d)
          .groupBy("l_suppkey")
          .agg(sum("l_quantity").as("raw_qty"))
          .filter(col("raw_qty") > 15000)
          .select(col("l_suppkey"), round(col("raw_qty"), 2).as("total_qty"))
          .orderBy("l_suppkey"),
      Some("""SELECT l_suppkey, round(sum(l_quantity),2) AS total_qty
             |FROM lineitem GROUP BY l_suppkey
             |HAVING sum(l_quantity) > 15000
             |ORDER BY l_suppkey""".stripMargin)),

    // R12: CASE WHEN.
    QDef(
      "q_case",
      (s, d) =>
        T.orders(s, d)
          .select(
            when(col("o_totalprice") < 50000, "small")
              .when(col("o_totalprice") < 200000, "mid")
              .otherwise("big").as("bucket"),
            col("o_totalprice"))
          .groupBy("bucket")
          // exact cent sums: the raw double sum's order-dependent drift
          // crosses the half-cent at sf10 row counts (see q1_agg)
          .agg(count(lit(1)).as("n"),
            round(sum(round(col("o_totalprice") * 100).cast("long")) / 100.0, 2).as("s"))
          .orderBy("bucket"),
      Some("""SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
             |            WHEN o_totalprice < 200000 THEN 'mid'
             |            ELSE 'big' END AS bucket,
             |  count(*) AS n,
             |  round(CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
             |    / 100.0, 2) AS s
             |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // R13: LIKE + string functions.
    QDef(
      "q_string",
      (s, d) =>
        T.part(s, d)
          .filter(col("p_name").like("%gear%") || col("p_type").like("SMALL%"))
          .groupBy("p_brand")
          .agg(
            count(lit(1)).as("n"),
            sum(length(col("p_name"))).cast("long").as("chars"),
            min(upper(substring(col("p_name"), 1, 4))).as("pfx"))
          .orderBy("p_brand"),
      Some("""SELECT p_brand, count(*) AS n,
             |  CAST(sum(length(p_name)) AS BIGINT) AS chars,
             |  min(upper(substr(p_name,1,4))) AS pfx
             |FROM part
             |WHERE p_name LIKE '%gear%' OR p_type LIKE 'SMALL%'
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // R14: UNION ALL.
    QDef(
      "q_union",
      (s, d) => {
        val c = T.customer(s, d).groupBy(col("c_nationkey").as("nk"))
          .agg(count(lit(1)).as("n")).select(lit("cust").as("src"), col("nk"), col("n"))
        val sup = T.supplier(s, d).groupBy(col("s_nationkey").as("nk"))
          .agg(count(lit(1)).as("n")).select(lit("supp").as("src"), col("nk"), col("n"))
        c.unionAll(sup).orderBy("src", "nk")
      },
      Some("""SELECT * FROM (
             |  SELECT 'cust' AS src, c_nationkey AS nk, count(*) AS n
             |  FROM customer GROUP BY c_nationkey
             |  UNION ALL
             |  SELECT 'supp' AS src, s_nationkey AS nk, count(*) AS n
             |  FROM supplier GROUP BY s_nationkey) t
             |ORDER BY src, nk""".stripMargin)),

    // R15: correlated subquery (Q17 shape), decorrelated to an agg+join —
    // the per-key avg is itself a distributed agg, then a key-colocated join.
    QDef(
      "q_subquery",
      (s, d) => {
        val l = T.lineitem(s, d)
        val p = T.part(s, d).filter(col("p_brand") === "Brand#23")
          .select(col("p_partkey"))
        val thr = l.groupBy(col("l_partkey").as("t_partkey"))
          .agg((avg("l_quantity") * 0.2).as("thr"))
        l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(thr, col("l_partkey") === col("t_partkey"))
          .filter(col("l_quantity") < col("thr"))
          .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"))
      },
      Some("""SELECT round(sum(l_extendedprice)/7.0, 2) AS avg_yearly
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE p_brand = 'Brand#23'
             |  AND l_quantity < (SELECT 0.2*avg(l_quantity)
             |                    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)""".stripMargin)),

    // R16: grouped top-k per group via window.
    QDef(
      "q_group_topk",
      (s, d) => {
        val o = T.orders(s, d)
        val c = T.customer(s, d)
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(desc("o_totalprice"), col("o_orderkey"))
        o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 2)
          .select(
            col("c_mktsegment"), col("o_orderkey"),
            round(col("o_totalprice"), 2).as("price"), col("rn"))
          .orderBy("c_mktsegment", "rn")
      },
      Some("""SELECT c_mktsegment, o_orderkey, round(o_totalprice,2) AS price, rn
             |FROM (
             |  SELECT c_mktsegment, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY c_mktsegment
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders JOIN customer ON o_custkey = c_custkey) t
             |WHERE rn <= 2
             |ORDER BY c_mktsegment, rn""".stripMargin)),

    // R17: ROLLUP grouping sets.
    QDef(
      "q_rollup",
      (s, d) =>
        T.lineitem(s, d)
          .rollup("l_returnflag", "l_linestatus")
          .agg(round(sum("l_quantity"), 2).as("qty"), count(lit(1)).as("n"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
            coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
            col("qty"), col("n"))
          .orderBy("rf", "ls"),
      Some("""SELECT coalesce(l_returnflag,'ALL') AS rf,
             |  coalesce(l_linestatus,'ALL') AS ls,
             |  round(sum(l_quantity),2) AS qty, count(*) AS n
             |FROM lineitem
             |GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY rf, ls""".stripMargin)),

    // R18: statistical aggregates.
    QDef(
      "q_stats",
      (s, d) =>
        T.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            round(stddev_samp(col("l_extendedprice")), 2).as("sd"),
            round(avg(col("l_extendedprice")), 2).as("mean"),
            round(min(col("l_extendedprice")), 2).as("mn"),
            round(max(col("l_extendedprice")), 2).as("mx"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, round(stddev_samp(l_extendedprice),2) AS sd,
             |  round(avg(l_extendedprice),2) AS mean,
             |  round(min(l_extendedprice),2) AS mn,
             |  round(max(l_extendedprice),2) AS mx
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // R19: semi-structured access (≈ Presto map subscript on props).
    QDef(
      "q_map_access",
      (s, d) =>
        T.events(s, d)
          .select(
            (expr("try_cast(regexp_extract(props, '\"k\": (\\\\d+)', 1) AS BIGINT) % 10")) // try_cast: unmatched props bucket to NULL, not an ANSI cast error
              .as("k_bucket"),
            col("value"))
          .groupBy("k_bucket")
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("s"))
          .orderBy("k_bucket"),
      Some("""SELECT TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) % 10 AS k_bucket,
             |  count(*) AS n, round(sum(value),2) AS s
             |FROM events
             |GROUP BY k_bucket ORDER BY k_bucket""".stripMargin)),

    // R20: timestamp semantics — date_trunc + formatted grouping.
    QDef(
      "q_ts_trunc",
      (s, d) =>
        T.events(s, d)
          .groupBy(
            col("event_type"),
            date_format(date_trunc("DAY", col("ts")), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("s"))
          .orderBy("event_type", "day"),
      Some("""SELECT event_type, strftime(date_trunc('day', ts),'%Y-%m-%d') AS day,
             |  count(*) AS n, round(sum(value),2) AS s
             |FROM events
             |GROUP BY event_type, day
             |ORDER BY event_type, day""".stripMargin)),

    // R21: decimal arithmetic with explicit precision (ref type lattice:
    // PrestoTypeUtils.java decimal mapping).
    QDef(
      "q_decimal",
      (s, d) =>
        T.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(sum(col("l_extendedprice").cast("decimal(12,2)"))
            .cast("decimal(18,2)").as("dec_sum"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS dec_sum
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // S1: projection pruning — scan must read only 3 columns.
    QDef(
      "q_scan_project",
      (s, d) =>
        T.lineitem(s, d)
          .filter(col("l_orderkey") % 997 === 0)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            round(col("l_extendedprice"), 2).as("price"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, round(l_extendedprice,2) AS price
             |FROM lineitem WHERE l_orderkey % 997 = 0
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // S2a: range + IN + <> predicates (ref: PrestoFilterConverter.java).
    QDef(
      "q_filter_range",
      (s, d) =>
        T.lineitem(s, d)
          .filter(
            col("l_quantity").between(10, 20) &&
              col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
              col("l_shipdate") < ts("1999-01-01 00:00:00") &&
              col("l_returnflag") =!= "A" &&
              col("l_suppkey").isin(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L))
          .agg(
            count(lit(1)).as("n"),
            round(sum("l_extendedprice"), 2).as("s"),
            round(min("l_quantity"), 2).as("mn")),
      Some("""SELECT count(*) AS n, round(sum(l_extendedprice),2) AS s,
             |  round(min(l_quantity),2) AS mn
             |FROM lineitem
             |WHERE l_quantity BETWEEN 10 AND 20
             |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
             |  AND l_returnflag <> 'A'
             |  AND l_suppkey IN (1,2,3,4,5,6,7,8,9,10)""".stripMargin)),

    // S2b: IN + NULL semantics (nullif / count skips nulls).
    QDef(
      "q_filter_in_null",
      (s, d) =>
        T.orders(s, d)
          .filter(col("o_orderstatus").isin("O", "F"))
          .groupBy("o_orderstatus")
          .agg(
            count(lit(1)).as("n"),
            count(nullif(col("o_orderpriority"), lit("1-URGENT"))).as("non_urgent"))
          .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  count(nullif(o_orderpriority,'1-URGENT')) AS non_urgent
             |FROM orders
             |WHERE o_orderstatus IN ('O','F')
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // S2c: timestamp range predicates at sub-second precision
    // (ref: TestPrestoITCase.testTimestampPredicate).
    QDef(
      "q_filter_ts",
      (s, d) =>
        T.events(s, d)
          .filter(
            col("ts") >= ts("2024-01-10 00:00:00") &&
              col("ts") < ts("2024-01-20 12:34:56.789"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"))
          .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n
             |FROM events
             |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
             |  AND ts < TIMESTAMP '2024-01-20 12:34:56.789'
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // S2/tz: TIMESTAMP WITH TIME ZONE predicates + named-zone conversion
    // (ref: TestPrestoITCase.testTimestampPredicateWithTimezone:465).
    // Bounds are spelled with explicit offsets (+05:30 / -04:00) and rows
    // group by the hour rendered in Asia/Kolkata (a half-hour zone) —
    // instant-correct on both engines (events.ts is naive UTC).
    QDef(
      "q_filter_tz",
      (s, d) =>
        T.events(s, d)
          .filter(
            col("ts") >= expr("TIMESTAMP '2024-01-10 05:30:00+05:30'") &&
              col("ts") < expr("TIMESTAMP '2024-01-19 20:00:00-04:00'"))
          .groupBy(hour(from_utc_timestamp(col("ts"), "Asia/Kolkata")).cast("long").as("h"))
          .agg(count(lit(1)).as("n"))
          .orderBy("h"),
      Some("""SELECT extract(hour FROM timezone('Asia/Kolkata', timezone('UTC', ts))) AS h,
             |  count(*) AS n
             |FROM events
             |WHERE ts >= (TIMESTAMPTZ '2024-01-10 05:30:00+05:30' AT TIME ZONE 'UTC')
             |  AND ts < (TIMESTAMPTZ '2024-01-19 20:00:00-04:00' AT TIME ZONE 'UTC')
             |GROUP BY 1 ORDER BY h""".stripMargin)),

    // S3: LIMIT pushdown (ref: TestPrestoITCase.testLimitCommon).
    QDef(
      "q_limit",
      (s, d) =>
        T.orders(s, d)
          .select("o_orderkey", "o_custkey")
          .orderBy("o_orderkey")
          .limit(5),
      Some("""SELECT o_orderkey, o_custkey FROM orders
             |ORDER BY o_orderkey LIMIT 5""".stripMargin)),

    // S7 semantics as a query: primary-key merge-on-read = latest row per
    // key by sequence (ref: Paimon deduplicate merge engine). One shuffle
    // on the PK; bucketed layout makes it shuffle-free (GraftTable).
    QDef(
      "q_pk_merge_read",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
        T.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(
            col("user_id"), col("event_id"), col("event_type"),
            round(col("value"), 2).as("value"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_id, event_type, round(value,2) AS value
             |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
             |        ORDER BY ts DESC, event_id DESC) AS rn
             |      FROM events) t
             |WHERE rn = 1
             |ORDER BY user_id""".stripMargin))
  )
}
