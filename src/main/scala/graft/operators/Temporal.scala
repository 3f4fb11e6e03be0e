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

  val defs: Seq[QDef] = Seq(
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

    // R26: exact percentiles (linear interpolation on both engines).
    // Fully parallel two-pass order statistics — no per-group serial
    // sort, no value-buffering aggregate:
    //   1. range-repartition (group, value) so ONE group spans MANY
    //      partitions, sort within partitions, stamp each row's local
    //      index (monotonically_increasing_id's per-partition counter,
    //      assigned above the sort in the same stage);
    //   2. aggregate per-partition run lengths (P × groups scalars) to
    //      the driver, turn them into global-rank offsets and the two
    //      bracketing target ranks per percentile;
    //   3. one broadcast join re-derives each row's GLOBAL rank from
    //      (partition offset + local index) and keeps only the ≤2
    //      bracketing rows per percentile, which interpolate exactly
    //      like quantile_cont.
    // Scale shape: the only full-data movement is the single range
    // shuffle of (group, value) scalar pairs; every partition sorts
    // rows/P values — at 100× the group no longer funnels through one
    // task the way a partitionBy(group) window sort would.
    QDef(
      "q_percentile",
      (s, d) => {
        val li = T.lineitem(s, d)
        // long format: both value columns ride one pipeline
        val vals = li.select(col("l_returnflag"), lit("qty").as("which"),
            col("l_quantity").cast("double").as("v"))
          .unionAll(li.select(col("l_returnflag"), lit("price").as("which"),
            col("l_extendedprice").cast("double").as("v")))
        val nParts = s.sessionState.conf.numShufflePartitions
        val Mask = (1L << 33) - 1 // monotonically_increasing_id local counter bits
        val parted = vals
          .repartitionByRange(nParts, col("l_returnflag"), col("which"), col("v"))
          .sortWithinPartitions("l_returnflag", "which", "v")
          .select(col("l_returnflag"), col("which"), col("v"),
            spark_partition_id().as("pid"),
            monotonically_increasing_id().bitwiseAND(lit(Mask)).as("lidx"))
          .persist()
        // pass 1: per-(partition, group) run length + start index
        val runs = parted.groupBy("pid", "l_returnflag", "which")
          .agg(count(lit(1)).as("cnt"), min("lidx").as("start"))
          .collect()
          .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
        // driver: offsets = rows of the same group in LOWER partitions
        // (range partitions are ascending in pid, so global order = pid
        // order, then local index order)
        val byGroup = runs.groupBy { case (_, flag, which, _, _) => (flag, which) }
        val offsets = byGroup.toSeq.flatMap { case (_, rs) =>
          val sorted = rs.sortBy(_._1)
          sorted.scanLeft(0L)(_ + _._4).zip(sorted).map { case (off, (pid, flag, which, _, start)) =>
            (pid, flag, which, off, start)
          }
        }
        val wanted = Map("qty" -> Seq("p50_qty" -> 0.5),
          "price" -> Seq("p25_price" -> 0.25, "p90_price" -> 0.9))
        // bracketing global ranks per (group, percentile)
        val targets = byGroup.toSeq.flatMap { case ((flag, which), rs) =>
          val n = rs.map(_._4).sum
          wanted(which).map { case (name, p) =>
            val k = (n - 1) * p
            (flag, which, name, math.floor(k).toLong + 1, math.ceil(k).toLong + 1, k - math.floor(k))
          }
        }
        import s.implicits._
        val offsetsDf = offsets.toDF("pid", "l_returnflag", "which", "goff", "start")
        val targetsDf = targets.toDF("l_returnflag", "which", "name", "lo", "hi", "frac")
        val names = Seq("p50_qty", "p25_price", "p90_price")
        parted
          .join(broadcast(offsetsDf), Seq("pid", "l_returnflag", "which"))
          .withColumn("grank", col("goff") + (col("lidx") - col("start")) + 1)
          .join(broadcast(targetsDf), Seq("l_returnflag", "which"))
          .filter(col("grank") === col("lo") || col("grank") === col("hi"))
          .groupBy("l_returnflag", "name")
          .agg((max(when(col("grank") === col("lo"), col("v"))) +
            first(col("frac")) * (max(when(col("grank") === col("hi"), col("v"))) -
              max(when(col("grank") === col("lo"), col("v"))))).as("pv"))
          .groupBy("l_returnflag").pivot("name", names)
          .agg(round(first("pv"), 4))
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
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("s"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
            col("n"), col("s"))
          .orderBy("st", "pri"),
      Some("""SELECT coalesce(o_orderstatus,'ALL') AS st,
             |  coalesce(o_orderpriority,'ALL') AS pri,
             |  count(*) AS n, round(sum(o_totalprice),2) AS s
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY st, pri""".stripMargin))
  )
}
