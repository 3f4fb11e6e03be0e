package graft

import graft.functions.{HashExpr, SketchState}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.3 L63: persistable sketch columns — binary state / merge /
  * extract for KMV, KLL and MG (the approx_set → merge(HLL) →
  * cardinality rollup pattern of the reference's ITCases). */
class SketchPersistSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lineitem = Tables.lineitem(spark, "/root/testdata/sf0.001")

  test("L63a: KMV merge-of-stored-cells equals the one-pass sketch BIT-FOR-BIT, " +
    "even in the compaction regime (k=16 ≪ distinct)") {
    val h = HashExpr.tokenHash64(col("l_partkey").cast("string"))
    val onePass = lineitem.groupBy("l_returnflag")
      .agg(SketchState.kmvEstimate(SketchState.kmvState(h, 16)).as("est"))
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getLong(1)))
    val cells = lineitem
      .withColumn("cell", col("l_orderkey") % 7)
      .groupBy("l_returnflag", "cell")
      .agg(SketchState.kmvState(h, 16).as("sk"))
    val merged = cells.groupBy("l_returnflag")
      .agg(SketchState.kmvEstimate(SketchState.kmvMerge(col("sk"))).as("est"))
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(merged.toSeq == onePass.toSeq,
      "KMV merged-of-parts must equal one-pass (k-min set is union-stable)")
  }

  test("L63b: KLL state → graft table → merge → quantile equals the direct " +
    "aggregate in the exact regime; binary survives the table round-trip") {
    val k = 2048
    val direct = graft.operators.Percentiles.approx(
        lineitem, Seq("l_returnflag"), "l_quantity", Seq(("p50", 0.5)), k = k)
      .select("l_returnflag", "value")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val cells = lineitem
      .withColumn("cell", col("l_linenumber"))
      .groupBy("l_returnflag", "cell")
      .agg(SketchState.kllState(col("l_quantity"), k).as("sk"))
    // store the binary sketch column in a graft table and read it back
    val t = graft.sources.GraftTable.create(spark,
      TestSpark.tmpDir("skp-kll"), cells.schema)
    t.append(cells)
    val merged = t.read().groupBy("l_returnflag")
      .agg(SketchState.kllQuantile(
        SketchState.kllMerge(col("sk")), 0.5).as("p50"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(merged == direct,
      s"KLL merged-from-table $merged != direct $direct")
  }

  test("L63c: MG state → merge → top equals the direct FreqItems in the exact regime") {
    val direct = graft.operators.Sketches.topItems(
        lineitem.withColumn("item", date_format(col("l_shipdate"), "yyyy-MM")),
        Seq("l_returnflag"), "item", k = 64, topN = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val cells = lineitem
      .withColumn("item", date_format(col("l_shipdate"), "yyyy-MM"))
      .withColumn("cell", col("l_orderkey") % 5)
      .groupBy("l_returnflag", "cell")
      .agg(SketchState.mgState(col("item"), 64).as("sk"))
    val merged = cells.groupBy("l_returnflag")
      .agg(SketchState.mgTop(SketchState.mgMerge(col("sk")), 5).as("top"))
      .select(col("l_returnflag"), posexplode(col("top")).as(Seq("i", "s")))
      .select(col("l_returnflag"), col("s.item"), col("s.cnt"),
        (col("i") + 1).cast("long").as("rn"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(merged == direct, "MG merged-of-parts must equal direct in the exact regime")
  }

  test("L63d: mixed-k merge downgrades to the smallest k; empty groups yield empty sketches") {
    // ≥ 8-char strings so the wrapping poly hash covers the 64-bit
    // space (1-2 char inputs stay tiny and skew the k-th-min estimator)
    val df = Seq.tabulate(500)(i => (i % 2, i.toLong)).toDF("g", "v")
      .withColumn("h", HashExpr.tokenHash64(concat(lit("itemval:"), col("v").cast("string"))))
    val bigK = df.filter($"g" === 0).agg(SketchState.kmvState($"h", 256).as("sk"))
    val smallK = df.filter($"g" === 1).agg(SketchState.kmvState($"h", 32).as("sk"))
    val est = bigK.union(smallK)
      .agg(SketchState.kmvEstimate(SketchState.kmvMerge($"sk")).as("est"))
      .collect().head.getLong(0)
    // the merged sketch is a valid k=32 KMV over all 500 distinct values:
    // estimate within the standard ~1/sqrt(k) band, NOT truncated at 32
    assert(est > 300 && est < 800, s"mixed-k estimate off: $est")
    // merging over an all-null sketch column is an empty sketch → 0
    val empty = Seq.empty[(Int, Array[Byte])].toDF("g", "sk")
      .agg(SketchState.kmvEstimate(SketchState.kmvMerge($"sk")).as("est"))
      .collect().head.getLong(0)
    assert(empty == 0L)
  }

  test("L63e: a persisted KMV sketch column skips manifest min/max stats (opaque bytes)") {
    val cells = lineitem.groupBy("l_returnflag")
      .agg(SketchState.kmvState(
        HashExpr.tokenHash64(col("l_partkey").cast("string")), 64).as("sk"))
    val t = graft.sources.GraftTable.create(spark,
      TestSpark.tmpDir("skp-stats"), cells.schema)
    t.append(cells)
    val metas = t.currentFiles(None)
    assert(metas.nonEmpty)
    // the binary column must have no min/max recorded; the string group
    // column must still carry stats (skipping is per-column, not global)
    assert(metas.forall(f => !f.statsOrEmpty.contains("sk")),
      s"sketch column got stats: ${metas.map(_.statsOrEmpty.keySet)}")
    assert(metas.exists(_.statsOrEmpty.contains("l_returnflag")),
      "scalar column lost its stats")
  }
}
