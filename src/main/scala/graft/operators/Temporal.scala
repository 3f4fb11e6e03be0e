package graft.operators

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / set operators beyond the reference's own surface
  * (SURVEY §2.2 R22–R24): an as-of join composed from a sorted union +
  * running last-non-null (no custom physical operator needed — one
  * shuffle on the key, same as any keyed window), INTERSECT/EXCEPT, CUBE.
  */
object Temporal {

  /** For each purchase, the latest click by the same user at-or-before
    * the purchase time (ASOF LEFT JOIN). Composition: union both sides
    * tagged, sort within user by (ts, side), carry the last click forward.
    * Scale: one hash shuffle on user_id; no range-explosion, no
    * cartesian — the standard Spark re-expression of as-of semantics. */
  private def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d)
    // one click per (user, ts): keep max event_id so the as-of pick is
    // deterministic under ts ties (mirrored in the oracle)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val tagged = clicks
      .select(col("user_id"), col("ts"), lit(0).as("side"), col("click_id"),
        lit(null).cast("long").as("event_id"))
      .unionByName(purchases
        .select(col("user_id"), col("ts"), lit(1).as("side"),
          lit(null).cast("long").as("click_id"), col("event_id")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("side"), col("click_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_click", last(col("click_id"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("last_click").as("click_id"))
      .orderBy("event_id")
  }

  /** Gap-based sessionization (30-min inactivity): classic event-stream
    * analytics. Two windows over one shuffle on user_id; the comparison
    * runs on integer epoch-micros so both engines use identical
    * arithmetic. */
  private def sessionize(s: SparkSession, d: String): DataFrame = {
    val GapUs = 1800000000L // 30 min
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > GapUs, 1).otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(run))
      .groupBy("user_id", "sess_id")
      .agg(count(lit(1)).as("cnt"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("dur_us"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        max("cnt").as("max_events"),
        sum("dur_us").as("total_dur_us"))
      .orderBy("user_id")
  }

  /** Ordered-funnel analysis (R31): users who signed up, then clicked
    * AFTER the signup, then purchased AFTER that click — the classic
    * behavioral-OLAP query over an event stream. Strictly-ordered
    * stage times via staged conditional-min aggregation: each stage is
    * one groupBy(user) pass + one equality join on user_id (co-
    * partitioned shuffles, no self-join explosion, no window over the
    * whole stream). Timestamp comparisons are integer microseconds —
    * exact both engines. */
  private def funnel(s: SparkSession, d: String): DataFrame = {
    val e = T.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val u1 = e.groupBy("user_id")
      .agg(min(when(col("event_type") === "signup", col("ts"))).as("t1"))
    val u2 = e.join(u1, "user_id").groupBy("user_id")
      .agg(max("t1").as("t1"),
        min(when(col("event_type") === "click" && col("ts") > col("t1"), col("ts"))).as("t2"))
    val u3 = e.join(u2, "user_id").groupBy("user_id")
      .agg(max("t1").as("t1"), max("t2").as("t2"),
        min(when(col("event_type") === "purchase" && col("ts") > col("t2"), col("ts"))).as("t3"))
    u3.agg(
      sum(when(col("t1").isNotNull, 1L).otherwise(0L)).as("signup_users"),
      sum(when(col("t2").isNotNull, 1L).otherwise(0L)).as("clicked_after"),
      sum(when(col("t3").isNotNull, 1L).otherwise(0L)).as("purchased_after"))
  }

  /** D1 retention by signup cohort (R32): cohort = day of a user's
    * FIRST event; retained = any event on cohort day + 1. Two
    * groupBy(user) passes + one join on user_id; day arithmetic on
    * timestamps is exact. */
  private def retention(s: SparkSession, d: String): DataFrame = {
    val e = T.events(s, d).select(col("user_id"), col("ts"))
    val c = e.groupBy("user_id").agg(date_trunc("day", min("ts")).as("d0"))
    e.join(c, "user_id")
      .groupBy("user_id")
      .agg(max("d0").as("d0"),
        max(when(date_trunc("day", col("ts")) === col("d0") + expr("INTERVAL 1 DAY"), 1L)
          .otherwise(0L)).as("ret"))
      .groupBy("d0")
      .agg(count(lit(1)).as("users"), sum("ret").as("retained_d1"))
      .orderBy("d0")
  }

  /** R35: time-series gap fill — daily event counts per event_type with
    * every missing day inside the type's active range zero-filled (the
    * dashboard/downstream-ML shape: models and charts need dense days).
    * Scale: the only pass over the fact table is one map-side-combinable
    * groupBy; the day grid derives from the AGGREGATED frame
    * (sequence+explode per type over its own [min,max] day span), so the
    * grid is calendar-bounded — days × types — regardless of corpus size,
    * and the left join runs grid-vs-aggregate, never touching raw events
    * again. No cross join anywhere (PlanAuditSpec-clean by construction).
    * Integer day arithmetic both engines. */
  private def gapfill(s: SparkSession, d: String): DataFrame = {
    val e = T.events(s, d).select(
      col("event_type"),
      datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day_num"))
    val counts = e.groupBy("event_type", "day_num").agg(count(lit(1)).as("n"))
    val grid = counts.groupBy("event_type")
      .agg(min("day_num").as("lo"), max("day_num").as("hi"))
      .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("day_num"))
    grid.join(counts, Seq("event_type", "day_num"), "left")
      .select(col("event_type"), col("day_num"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("event_type", "day_num")
  }

  val defs: Seq[QDef] = Seq(
    // R35: gap-filled daily series.
    QDef(
      "q_gapfill",
      gapfill,
      Some("""WITH e AS (SELECT event_type,
             |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num
             |  FROM events),
             |counts AS (SELECT event_type, day_num, count(*) AS n
             |  FROM e GROUP BY 1, 2),
             |b AS (SELECT event_type, min(day_num) AS lo, max(day_num) AS hi
             |  FROM counts GROUP BY 1),
             |grid AS (SELECT event_type, unnest(generate_series(lo, hi)) AS day_num
             |  FROM b)
             |SELECT g.event_type, CAST(g.day_num AS BIGINT) AS day_num,
             |  CAST(coalesce(c.n, 0) AS BIGINT) AS n
             |FROM grid g LEFT JOIN counts c USING (event_type, day_num)
             |ORDER BY event_type, day_num""".stripMargin)),

    // R31: ordered funnel.
    QDef(
      "q_funnel",
      funnel,
      Some("""WITH u1 AS (SELECT user_id,
             |    min(CASE WHEN event_type='signup' THEN ts END) t1
             |  FROM events GROUP BY user_id),
             |u2 AS (SELECT e.user_id, max(u1.t1) t1,
             |    min(CASE WHEN e.event_type='click' AND e.ts > u1.t1 THEN e.ts END) t2
             |  FROM events e JOIN u1 USING (user_id) GROUP BY e.user_id),
             |u3 AS (SELECT e.user_id, max(u2.t1) t1, max(u2.t2) t2,
             |    min(CASE WHEN e.event_type='purchase' AND e.ts > u2.t2 THEN e.ts END) t3
             |  FROM events e JOIN u2 USING (user_id) GROUP BY e.user_id)
             |SELECT
             |  CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS signup_users,
             |  CAST(sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after,
             |  CAST(sum(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS purchased_after
             |FROM u3""".stripMargin)),

    // R32: D1 retention by first-event cohort.
    QDef(
      "q_retention",
      retention,
      Some("""WITH c AS (SELECT user_id, date_trunc('day', min(ts)) d0
             |  FROM events GROUP BY user_id),
             |r AS (SELECT e.user_id, max(c.d0) d0,
             |    max(CASE WHEN date_trunc('day', e.ts) = c.d0 + INTERVAL 1 DAY
             |      THEN 1 ELSE 0 END) ret
             |  FROM events e JOIN c USING (user_id) GROUP BY e.user_id)
             |SELECT d0, count(*) AS users, CAST(sum(ret) AS BIGINT) AS retained_d1
             |FROM r GROUP BY d0 ORDER BY d0""".stripMargin)),

    // R25: sessionization.
    QDef(
      "q_sessionize",
      sessionize,
      Some("""WITH g AS (
             |  SELECT user_id, ts, event_id,
             |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
             |  FROM events),
             |m AS (SELECT user_id, ts, event_id,
             |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
             |  FROM g),
             |sess AS (SELECT user_id, ts, event_id,
             |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
             |  FROM m),
             |per AS (SELECT user_id, sess_id, count(*) AS cnt,
             |    max(epoch_us(ts)) - min(epoch_us(ts)) AS dur_us
             |  FROM sess GROUP BY user_id, sess_id)
             |SELECT user_id, count(*) AS n_sessions, max(cnt) AS max_events,
             |  CAST(sum(dur_us) AS BIGINT) AS total_dur_us
             |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // R26: exact percentiles (linear interpolation on both engines)
    // through the reusable Percentiles.exact operator — the fully
    // parallel two-pass order statistic (one range shuffle of scalars,
    // no per-group serial sort; algorithm + scale shape documented on
    // the operator).
    QDef(
      "q_percentile",
      (s, d) => {
        val li = T.lineitem(s, d)
        // long format: both value columns ride the operator's ONE range
        // shuffle (the synthetic `which` key keeps them separate groups)
        val vals = li.select(col("l_returnflag"), lit("qty").as("which"),
            col("l_quantity").cast("double").as("v"))
          .unionAll(li.select(col("l_returnflag"), lit("price").as("which"),
            col("l_extendedprice").cast("double").as("v")))
        val long = Percentiles.exact(vals, Seq("l_returnflag", "which"), "v",
          Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9))
        val names = Seq("p50_qty", "p25_price", "p90_price")
        long
          .withColumn("colname", concat(col("name"), lit("_"), col("which")))
          .filter(col("colname").isin(names: _*))
          .groupBy("l_returnflag").pivot("colname", names)
          .agg(round(first("value"), 4))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
             |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
             |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // R22: as-of join — oracle is DuckDB's native ASOF JOIN.
    QDef(
      "q_asof_join",
      asofJoin,
      Some("""WITH clicks AS (
             |  SELECT user_id, ts, max(event_id) AS click_id
             |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
             |purchases AS (
             |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
             |SELECT p.event_id, p.user_id, c.click_id
             |FROM purchases p
             |ASOF LEFT JOIN clicks c
             |  ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY p.event_id""".stripMargin)),

    // R23: INTERSECT / EXCEPT.
    QDef(
      "q_setops",
      (s, d) => {
        val buyers = T.events(s, d).filter(col("event_type") === "purchase")
          .select(col("user_id")).distinct()
        val errorers = T.events(s, d).filter(col("event_type") === "error")
          .select(col("user_id")).distinct()
        val both = buyers.intersect(errorers).withColumn("src", lit("both"))
        val onlyBuy = buyers.except(errorers).withColumn("src", lit("buy_only"))
        both.unionByName(onlyBuy)
          .groupBy("src").agg(count(lit(1)).as("n")).orderBy("src")
      },
      Some("""WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type='purchase'),
             |errorers AS (SELECT DISTINCT user_id FROM events WHERE event_type='error'),
             |u AS (
             |  SELECT 'both' AS src, user_id FROM (SELECT user_id FROM buyers INTERSECT SELECT user_id FROM errorers)
             |  UNION ALL
             |  SELECT 'buy_only', user_id FROM (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM errorers))
             |SELECT src, count(*) AS n FROM u GROUP BY src ORDER BY src""".stripMargin)),

    // R24: CUBE grouping sets.
    QDef(
      "q_cube",
      (s, d) =>
        T.orders(s, d)
          .cube("o_orderstatus", "o_orderpriority")
          // exact cent sums (see q1_agg: double-sum drift at sf10 scale)
          .agg(count(lit(1)).as("n"),
            round(sum(round(col("o_totalprice") * 100).cast("long")) / 100.0, 2).as("s"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
            col("n"), col("s"))
          .orderBy("st", "pri"),
      Some("""SELECT coalesce(o_orderstatus,'ALL') AS st,
             |  coalesce(o_orderpriority,'ALL') AS pri,
             |  count(*) AS n,
             |  round(CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
             |    / 100.0, 2) AS s
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY st, pri""".stripMargin))
  )
}
