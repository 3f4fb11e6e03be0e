package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Exact grouped percentiles with linear interpolation — the semantics of
  * SQL `percentile_cont` / DuckDB `quantile_cont` — as a reusable,
  * fully-parallel two-pass order statistic (no per-group serial sort).
  *
  * Algorithm (the plan q_percentile landed in r6, lifted to a library
  * operator):
  *   1. range-repartition the (group..., value) scalar pairs and sort
  *      within partitions, tagging each row with its partition id and a
  *      local index (monotonically_increasing_id's per-partition counter
  *      assigned above the sort in the same stage) — the ONLY full-data
  *      movement is this single range shuffle of scalars;
  *   2. aggregate per-(partition, group) run lengths (P × groups scalars)
  *      to the driver and turn them into global-rank offsets plus the ≤2
  *      bracketing target ranks per requested percentile;
  *   3. one broadcast join re-derives each row's GLOBAL rank
  *      (partition offset + local index) and keeps only the bracketing
  *      rows, which interpolate exactly like quantile_cont.
  *
  * Scale shape: every partition sorts rows/P values — at 100× the data a
  * group never funnels through one task the way a partitionBy(group)
  * window sort would. Driver state is partitions × groups × 2 scalars
  * (bounded metadata, same class as manifest reads — not data-sized).
  *
  * The big sorted intermediate is persisted between the two passes and
  * UNPERSISTED before returning: the (groups × percentiles)-sized result
  * is materialized eagerly and returned as a local-relation DataFrame, so
  * no cached blocks outlive the call (a bench loop of 60+ queries would
  * otherwise accumulate executor storage memory).
  *
  * Null values are ignored (percentile_cont semantics); null group keys
  * are not supported (they would drop at the broadcast joins).
  *
  * ==Cost contract — exact vs approx==
  * `exact` is inherently a FULL range-shuffle + persist of every value
  * between its two passes: the fastest plan that returns bit-exact
  * percentile_cont, and the right face for oracle parity and small/
  * medium data, but its wall-clock scales with the full value column
  * (measured ~2× every other sf0.1 query; ~17× at sf1). At 100 TB the
  * operator of choice is [[approx]] (KLL sketch, ~1.1× per 10× data,
  * mergeable, bounded memory) — reach for `exact` only when the answer
  * must be exact to the last ULP. q_percentile deliberately benches the
  * exact path; treat its larger reading as this documented band, not a
  * regression (SURVEY §6).
  */
object Percentiles {

  /** @param ps (outputName, fraction in [0,1]) pairs, e.g. ("p50", 0.5).
    * @return long-format result: groupCols..., name STRING, value DOUBLE —
    *         one row per group × requested percentile; empty groups
    *         (after null filtering) yield no rows.
    */
  def exact(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    require(groupCols.nonEmpty, "grouped operator: pass at least one group column")
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      "percentile fractions must lie in [0, 1]")
    val s = df.sparkSession
    val gs = groupCols.map(col)
    val groupFields = groupCols.map(n => df.schema(n))
    val vals = df
      .select(gs :+ col(valueCol).cast("double").as("__v"): _*)
      .filter(col("__v").isNotNull)
    val nParts = s.sessionState.conf.numShufflePartitions
    val Mask = (1L << 33) - 1 // monotonically_increasing_id local counter bits
    val parted = vals
      .repartitionByRange(nParts, gs :+ col("__v"): _*)
      .sortWithinPartitions(groupCols :+ "__v" map col: _*)
      .select(gs :+ col("__v") :+ spark_partition_id().as("__pid") :+
        monotonically_increasing_id().bitwiseAND(lit(Mask)).as("__lidx"): _*)
      .persist()
    try {
      // pass 1: per-(partition, group) run length + start index
      val g = groupCols.size
      val runs: Array[(Int, List[Any], Long, Long)] = parted
        .groupBy(col("__pid") +: gs: _*)
        .agg(count(lit(1)).as("cnt"), min("__lidx").as("start"))
        .collect()
        .map(r => (r.getInt(0), (0 until g).map(i => r.get(1 + i)).toList,
          r.getLong(1 + g), r.getLong(2 + g)))
      val byGroup = runs.groupBy(_._2)
      // offsets: rows of the same group in LOWER partitions (range
      // partitions ascend in pid, so global order = pid, then local idx)
      val offsetRows: Seq[Row] = byGroup.toSeq.flatMap { case (_, rs) =>
        val sorted = rs.sortBy(_._1)
        sorted.scanLeft(0L)(_ + _._3).zip(sorted).map {
          case (off, (pid, key, _, start)) => Row.fromSeq(pid +: key :+ off :+ start)
        }
      }
      // bracketing global ranks per (group, percentile)
      val targetRows: Seq[Row] = byGroup.toSeq.flatMap { case (key, rs) =>
        val n = rs.map(_._3).sum
        ps.map { case (name, p) =>
          val k = (n - 1) * p
          Row.fromSeq(key :+ name :+ (math.floor(k).toLong + 1) :+
            (math.ceil(k).toLong + 1) :+ (k - math.floor(k)))
        }
      }
      val offsetsDf = s.createDataFrame(
        new java.util.ArrayList[Row](offsetRows.asJava),
        StructType(StructField("__pid", IntegerType) +: groupFields :+
          StructField("__goff", LongType) :+ StructField("__start", LongType)))
      val targetsDf = s.createDataFrame(
        new java.util.ArrayList[Row](targetRows.asJava),
        StructType(groupFields :+ StructField("name", StringType) :+
          StructField("__lo", LongType) :+ StructField("__hi", LongType) :+
          StructField("__frac", DoubleType)))
      val out = parted
        .join(broadcast(offsetsDf), "__pid" +: groupCols)
        .withColumn("__grank", col("__goff") + (col("__lidx") - col("__start")) + 1)
        .join(broadcast(targetsDf), groupCols)
        .filter(col("__grank") === col("__lo") || col("__grank") === col("__hi"))
        .groupBy(gs :+ col("name"): _*)
        .agg((max(when(col("__grank") === col("__lo"), col("__v"))) +
          first(col("__frac")) * (max(when(col("__grank") === col("__hi"), col("__v"))) -
            max(when(col("__grank") === col("__lo"), col("__v"))))).as("value"))
      // materialize the (groups × ps)-sized result so the sorted
      // intermediate can be unpersisted before returning
      val rows = out.collect()
      s.createDataFrame(new java.util.ArrayList[Row](rows.toSeq.asJava), out.schema)
    } finally parted.unpersist()
  }

  /** Approximate grouped percentiles via the mergeable multilevel
    * quantile sketch (graft.functions.KllQuantiles) — the sketch is
    * map-side combinable, so ONE ordinary aggregation shuffle moves
    * O(k log(n/k)) bytes per group instead of every (group, value)
    * pair. This is the 100 TB path when ~1% rank error is acceptable;
    * `exact` remains the oracle-exact plan. Same long-format output
    * contract as `exact`: groupCols..., name STRING, value DOUBLE. */
  def approx(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[(String, Double)], k: Int = 256): DataFrame = {
    require(groupCols.nonEmpty, "grouped operator: pass at least one group column")
    import org.apache.spark.sql.graft.Bridge
    val gs = groupCols.map(col)
    val sketch = Bridge.column(
      graft.functions.KllQuantiles(
        Bridge.expression(col(valueCol).cast("double")), k, ps.map(_._2))
        .toAggregateExpression())
    df.filter(col(valueCol).isNotNull)
      .groupBy(gs: _*)
      .agg(sketch.as("__qs"))
      .select(gs :+ posexplode(col("__qs")).as(Seq("__i", "value")): _*)
      .withColumn("name", element_at(typedlit(ps.map(_._1)), col("__i") + 1))
      .select(gs :+ col("name") :+ col("value"): _*)
  }
}
