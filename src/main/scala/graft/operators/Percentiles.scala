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
  * map-side partial aggregation in the TYPICAL case; shuffled bytes are
  * histogram-sized, independent of corpus size — where the previous
  * plan range-shuffled, sorted and persisted EVERY (group, value) pair
  * (measured 125 s at sf10 for q_percentile; this plan is scan-bound).
  *
  * Driver state is ABSOLUTELY bounded (r20, closing the r19 advice):
  * the 16-bit bucket key is sign+exponent+4 mantissa bits, so only 16
  * level-1 buckets cover each binade and a few-binade column
  * concentrates ~n/(16·binades) distinct values in a probed bucket —
  * collecting those values was a driver-OOM risk the old "~n/65536"
  * rationale understated. Values are therefore collected ONLY when the
  * probed bucket's ROW count (known exactly from the histogram) is
  * ≤ [[CollectCap]]; otherwise the bucket is refined by the NEXT 16
  * bits of the sign-adjusted IEEE long (a semi-join-pruned histogram
  * pass, ≤ 65536 sub-buckets per probed path), descending at most to
  * the full 64 bits — where a "bucket" IS one exact double (resolved by
  * inverting the bit transform, no collect at all). Every driver
  * structure is ≤ paths × max(65536, CollectCap) entries with
  * paths ≤ groups × percentiles × 2, at ANY data distribution.
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

  /** Max ROWS of one probed bucket whose values may be collected to the
    * driver; a bucket above it is refined by the next 16 bits instead.
    * Distinct values ≤ rows, so the per-path driver list is hard-capped
    * regardless of distribution. */
  val CollectCap: Long = 1L << 16

  /** Inverse of [[graft.functions.BitsExpr.orderedBitsOf]]: the exact
    * stored double whose sign-adjusted IEEE bits equal `adj`. */
  private[operators] def fromOrderedBits(adj: Long): Double = {
    val raw = if (adj < 0) adj ^ Long.MaxValue else adj
    java.lang.Double.longBitsToDouble(raw)
  }

  /** @param ps (outputName, fraction in [0,1]) pairs, e.g. ("p50", 0.5).
    * @param collectCap test seam for [[CollectCap]] — forces the
    *        deep-descent path at small sizes; callers keep the default.
    * @return long-format result: groupCols..., name STRING, value DOUBLE —
    *         one row per group × requested percentile; empty groups
    *         (after null filtering) yield no rows.
    */
  def exact(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[(String, Double)], collectCap: Long = CollectCap): DataFrame = {
    require(groupCols.nonEmpty, "grouped operator: pass at least one group column")
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      "percentile fractions must lie in [0, 1]")
    val s = df.sparkSession
    val gs = groupCols.map(col)
    val groupFields = groupCols.map(n => df.schema(n))
    val g = groupCols.size
    // (group..., __adj) — the sign-adjusted IEEE long IS the value
    // (order-isomorphic and invertible), so every histogram level keys
    // off one stored column
    val vals = df
      .select(gs :+ col(valueCol).cast("double").as("__v"): _*)
      .filter(col("__v").isNotNull)
      .na.drop(groupCols)
      .select(gs :+ graft.functions.BitsExpr.orderedBits(col("__v")).as("__adj"): _*)

    // pass 1: per-(group, top-16-bit bucket) counts — map-side
    // combinable, the only FULL scan that shuffles anything
    val hist: Array[(List[Any], Long, Long)] = vals
      .groupBy(gs :+ shiftright(col("__adj"), 48).as("__b"): _*)
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => ((0 until g).map(r.get).toList, r.getLong(g), r.getLong(g + 1)))
    if (hist.isEmpty) {
      return s.createDataFrame(
        new java.util.ArrayList[Row](),
        StructType(groupFields :+ StructField("name", StringType) :+
          StructField("value", DoubleType)))
    }

    // A rank still being located: group key, bucket PATH so far (the
    // value of shiftright(__adj, shift)), rank within that path
    // (1-based), and how many rows the path holds.
    case class Need(key: List[Any], path: Long, localRank: Long, pathRows: Long)

    /** Walk `buckets` (ascending (bucketId, count)) to the bucket
      * holding `rank`; returns (bucketId, rank-within, bucket rows). */
    def locate(buckets: Array[(Long, Long)], rank: Long): (Long, Long, Long) = {
      var cum = 0L
      var i = 0
      while (i < buckets.length) {
        val c = buckets(i)._2
        if (rank <= cum + c) return (buckets(i)._1, rank - cum, c)
        cum += c
        i += 1
      }
      val last = buckets(buckets.length - 1) // rank == n fallback
      (last._1, last._2, last._2)
    }

    // driver: locate the bracketing level-1 (bucket, rank-within) per
    // (group, percentile); ranks are 1-based within the group
    val wanted = scala.collection.mutable.ArrayBuffer
      .empty[(List[Any], String, Need, Need, Double)]
    hist.groupBy(_._1).foreach { case (key, rows) =>
      val buckets = rows.map(r => (r._2, r._3)).sortBy(_._1)
      val n = buckets.map(_._2).sum
      def need(rank: Long): Need = {
        val (b, lr, c) = locate(buckets, rank)
        Need(key, b, lr, c)
      }
      ps.foreach { case (name, p) =>
        val k = (n - 1) * p
        wanted += ((key, name, need(math.floor(k).toLong + 1),
          need(math.ceil(k).toLong + 1), k - math.floor(k)))
      }
    }

    // iterative refinement: at `shift`, each pending Need names a bucket
    // PATH = shiftright(__adj, shift). Small-enough paths (≤ collectCap
    // rows) resolve by collecting their ≤ pathRows distinct values;
    // oversized paths descend 16 more bits (shift == 0 always resolves:
    // the path IS the exact value). Typical data resolves everything at
    // the first shift — the historical two-pass plan, same scan count.
    val resolved = scala.collection.mutable.HashMap.empty[RankKey, Double]
    // parent need → the child need its rank descended into
    val chain = scala.collection.mutable.HashMap.empty[RankKey, RankKey]
    var pending: Seq[Need] =
      wanted.toSeq.flatMap(w => Seq(w._3, w._4)).distinct
    var shift = 48
    while (pending.nonEmpty) {
      if (shift == 0) {
        // a full-64-bit path IS one exact double — no collect needed
        pending.foreach(nd =>
          resolved((nd.key, nd.path, nd.localRank)) = fromOrderedBits(nd.path))
        pending = Seq.empty
      } else {
      val (collectNow, descend) = pending.partition(_.pathRows <= collectCap)

      if (collectNow.nonEmpty) {
        // per-value counts inside ONLY these paths (broadcast semi-join)
        val needDf = s.createDataFrame(
          new java.util.ArrayList[Row](collectNow.map(nd =>
            Row.fromSeq(nd.key :+ nd.path)).distinct.asJava),
          StructType(groupFields :+ StructField("__p", LongType)))
        val probed: Array[(List[Any], Long, Long, Long)] = vals
          .withColumn("__p", shiftright(col("__adj"), shift))
          .join(broadcast(needDf), groupCols :+ "__p", "leftsemi")
          .groupBy(gs :+ col("__p") :+ col("__adj"): _*)
          .agg(count(lit(1)).as("cnt"))
          .collect()
          .map(r => ((0 until g).map(r.get).toList, r.getLong(g), r.getLong(g + 1),
            r.getLong(g + 2)))
        val valuesByPath: Map[(List[Any], Long), Array[(Long, Long)]] = probed
          .groupBy(r => (r._1, r._2))
          .map { case (k, rs) => k -> rs.map(r => (r._3, r._4)).sortBy(_._1) }
        collectNow.foreach { nd =>
          val (adj, _, _) = locate(valuesByPath((nd.key, nd.path)), nd.localRank)
          resolved((nd.key, nd.path << shift, nd.localRank)) = fromOrderedBits(adj)
        }
      }

      if (descend.nonEmpty) {
        val nextShift = shift - 16
        val needDf = s.createDataFrame(
          new java.util.ArrayList[Row](descend.map(nd =>
            Row.fromSeq(nd.key :+ nd.path)).distinct.asJava),
          StructType(groupFields :+ StructField("__p", LongType)))
        // sub-histogram of ONLY the oversized paths: ≤ 65536 sub-buckets
        // per (group, path)
        val sub: Array[(List[Any], Long, Long)] = vals
          .withColumn("__p", shiftright(col("__adj"), shift))
          .join(broadcast(needDf), groupCols :+ "__p", "leftsemi")
          .groupBy(gs :+ shiftright(col("__adj"), nextShift).as("__sb"): _*)
          .agg(count(lit(1)).as("cnt"))
          .collect()
          .map(r => ((0 until g).map(r.get).toList, r.getLong(g), r.getLong(g + 1)))
        val subByPath: Map[(List[Any], Long), Array[(Long, Long)]] = sub
          .groupBy(r => (r._1, r._2 >> 16))
          .map { case (k, rs) => k -> rs.map(r => (r._2, r._3)).sortBy(_._1) }
        val next = descend.map { nd =>
          val (sb, lr, c) = locate(subByPath((nd.key, nd.path)), nd.localRank)
          // remember the resolution key the ORIGINAL need will look up
          (nd, Need(nd.key, sb, lr, c))
        }
        // original needs are keyed by their level-1 (path, rank); track
        // the chain by resolving child → parent after the loop — simpler:
        // resolve parents immediately once children resolve, via aliasing
        pending = next.map(_._2).distinct
        // record the parent→child rank aliasing for final lookup
        next.foreach { case (parent, child) =>
          chain((parent.key, parent.path << shift, parent.localRank)) =
            (child.key, child.path << nextShift, child.localRank)
        }
      } else {
        pending = Seq.empty
      }
      }
      shift -= 16
    }

    def finalValue(key: List[Any], pathShifted: Long, rank: Long): Double = {
      var k = (key, pathShifted, rank)
      while (!resolved.contains(k)) k = chain(k)
      resolved(k)
    }

    val outRows: Seq[Row] = wanted.toSeq.map { case (key, name, lo, hi, frac) =>
      val vLo = finalValue(key, lo.path << 48, lo.localRank)
      val vHi = finalValue(key, hi.path << 48, hi.localRank)
      // same IEEE sequence as the previous plan's aggregate expression:
      // lo + frac * (hi - lo)
      Row.fromSeq(key :+ name :+ (vLo + frac * (vHi - vLo)))
    }
    s.createDataFrame(
      new java.util.ArrayList[Row](outRows.asJava),
      StructType(groupFields :+ StructField("name", StringType) :+
        StructField("value", DoubleType)))
  }

  /** parent-(key, adj-prefix, rank) → child link for multi-level needs. */
  private type RankKey = (List[Any], Long, Long)

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
