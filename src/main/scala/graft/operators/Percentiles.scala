package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Exact grouped percentiles with linear interpolation — the semantics of
  * SQL `percentile_cont` / DuckDB `quantile_cont` — as a reusable,
  * fully-parallel TWO-AGGREGATION order statistic: no shuffle of the
  * data, no sort, no persist (r19 optimization; guide §2.3/§2.4 —
  * "shuffle keys and metadata instead of payloads", here shrunk further
  * to "shuffle only map-side-combined histograms").
  *
  * Algorithm (histogram selection; replaces the r6 range-shuffle plan):
  *   1. bucket every value by the TOP 16 BITS of its sign-adjusted IEEE
  *      representation ([[graft.functions.BitsExpr.orderedBits]] —
  *      ascending signed order ≡ ascending double order, so buckets are
  *      rank-correct and need no min/max pre-pass), and aggregate
  *      per-(group, bucket) counts: a map-side-combinable groupBy whose
  *      shuffle is ≤ 65536 × groups scalars, NOT the data;
  *   2. on the driver, walk each group's bucket histogram to locate the
  *      ≤ 2 bracketing ranks per requested percentile (global rank →
  *      (bucket, rank-within-bucket));
  *   3. a second aggregation over ONLY the needed (group, bucket) pairs
  *      (a broadcast semi-join of the base — at most groups × ps × 2
  *      buckets, each ~n/65536 of its group) yields per-value counts;
  *      the driver sorts that bounded value list, picks the bracketing
  *      values, and interpolates `lo + frac * (hi - lo)` — the same
  *      IEEE op sequence as quantile_cont, bit-identical to the old
  *      plan's expression.
  *
  * Scale shape: two scans of the input projected to (group, value) with
  * map-side partial aggregation; shuffled bytes are histogram-sized
  * (≤ 65536 × groups + probed-bucket distinct values), independent of
  * corpus size — where the previous plan range-shuffled, sorted and
  * persisted EVERY (group, value) pair (measured 125 s at sf10 for
  * q_percentile; this plan is scan-bound). Driver state is bounded:
  * the bucket histogram (≤ 65536 × groups counts) plus the probed
  * buckets' distinct values (~n/65536 per probed bucket — a pathological
  * single-value group collapses to ONE distinct value, so duplicates
  * never inflate it).
  *
  * Null values are ignored (percentile_cont semantics); null group keys
  * are dropped (same contract as the previous implementation, where
  * they fell out of the broadcast joins).
  *
  * ==Cost contract — exact vs approx==
  * `exact` now costs two aggregation passes over the input. [[approx]]
  * (KLL sketch, mergeable, bounded memory) remains the single-pass
  * choice when ~1% rank error is acceptable; `exact` is the face for
  * oracle parity and whenever the answer must be exact to the last ULP.
  */
object Percentiles {

  private val BucketShift = 48 // top 16 bits of the sign-adjusted IEEE long

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
    val g = groupCols.size
    val vals = df
      .select(gs :+ col(valueCol).cast("double").as("__v"): _*)
      .filter(col("__v").isNotNull)
      .na.drop(groupCols)
      .withColumn("__b",
        shiftright(graft.functions.BitsExpr.orderedBits(col("__v")), BucketShift)
          .cast("int"))
    // pass 1: per-(group, bucket) counts — map-side combinable, the only
    // full scan that shuffles anything (histogram-sized)
    val hist: Array[(List[Any], Int, Long)] = vals
      .groupBy(gs :+ col("__b"): _*)
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => ((0 until g).map(r.get).toList, r.getInt(g), r.getLong(g + 1)))
    if (hist.isEmpty) {
      return s.createDataFrame(
        new java.util.ArrayList[Row](),
        StructType(groupFields :+ StructField("name", StringType) :+
          StructField("value", DoubleType)))
    }
    // driver: locate the bracketing (bucket, rank-within-bucket) per
    // (group, percentile); ranks are 1-based within the group
    case class Need(key: List[Any], bucket: Int, localRank: Long)
    // (group, name) -> (loNeed, hiNeed, frac)
    val wanted = scala.collection.mutable.ArrayBuffer.empty[(List[Any], String, Need, Need, Double)]
    hist.groupBy(_._1).foreach { case (key, rows) =>
      val buckets = rows.sortBy(_._2) // ascending bucket = ascending value
      val n = buckets.map(_._3).sum
      def locate(rank: Long): Need = {
        var cum = 0L
        var i = 0
        while (i < buckets.length) {
          val c = buckets(i)._3
          if (rank <= cum + c) return Need(key, buckets(i)._2, rank - cum)
          cum += c
          i += 1
        }
        Need(key, buckets.last._2, buckets.last._3) // rank == n fallback
      }
      ps.foreach { case (name, p) =>
        val k = (n - 1) * p
        val lo = locate(math.floor(k).toLong + 1)
        val hi = locate(math.ceil(k).toLong + 1)
        wanted += ((key, name, lo, hi, k - math.floor(k)))
      }
    }
    // pass 2: per-value counts inside ONLY the probed buckets (broadcast
    // semi-join on (group, bucket) — ≤ groups × ps × 2 pairs)
    val neededPairs: Seq[Row] = wanted
      .flatMap(w => Seq(w._3, w._4)).map(nd => Row.fromSeq(nd.key :+ nd.bucket))
      .distinct.toSeq
    val needDf = s.createDataFrame(
      new java.util.ArrayList[Row](neededPairs.asJava),
      StructType(groupFields :+ StructField("__b", IntegerType)))
    val probed: Array[(List[Any], Int, Double, Long)] = vals
      .join(broadcast(needDf), groupCols :+ "__b", "leftsemi")
      .groupBy(gs :+ col("__b") :+ col("__v"): _*)
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => ((0 until g).map(r.get).toList, r.getInt(g), r.getDouble(g + 1),
        r.getLong(g + 2)))
    // driver: sorted distinct values per probed (group, bucket); walk
    // counts to resolve rank-within-bucket → value
    val valuesByBucket: Map[(List[Any], Int), Array[(Double, Long)]] = probed
      .groupBy(r => (r._1, r._2))
      .map { case (k, rs) => k -> rs.map(r => (r._3, r._4)).sortBy(r =>
        graft.functions.BitsExpr.orderedBitsOf(r._1)) }
    def valueAt(nd: Need): Double = {
      val vs = valuesByBucket((nd.key, nd.bucket))
      var cum = 0L
      var i = 0
      while (i < vs.length) {
        if (nd.localRank <= cum + vs(i)._2) return vs(i)._1
        cum += vs(i)._2
        i += 1
      }
      vs.last._1
    }
    val outRows: Seq[Row] = wanted.toSeq.map { case (key, name, lo, hi, frac) =>
      val vLo = valueAt(lo)
      val vHi = valueAt(hi)
      // same IEEE sequence as the previous plan's aggregate expression:
      // lo + frac * (hi - lo)
      Row.fromSeq(key :+ name :+ (vLo + frac * (vHi - vLo)))
    }
    s.createDataFrame(
      new java.util.ArrayList[Row](outRows.asJava),
      StructType(groupFields :+ StructField("name", StringType) :+
        StructField("value", DoubleType)))
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
