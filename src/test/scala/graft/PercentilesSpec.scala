package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Percentiles

/** SURVEY §2.2 R26: the reusable exact-percentile operator (two-pass
  * parallel order statistic). Oracle: Spark's own `percentile` aggregate,
  * which computes exact linear-interpolation percentiles (percentile_cont
  * semantics) by buffering values — correct at test sizes, the very plan
  * the operator exists to avoid at scale. */
class PercentilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def check(df: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[(String, Double)]): Unit = {
    val got = Percentiles.exact(df, groupCols, valueCol, ps)
      .collect()
      .map(r => (groupCols.indices.map(r.get).toList, r.getString(groupCols.size)) ->
        r.getDouble(groupCols.size + 1)).toMap
    val oracleAggs = ps.map { case (name, p) =>
      expr(s"percentile($valueCol, $p)").as(name)
    }
    val want = df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*).agg(oracleAggs.head, oracleAggs.tail: _*)
      .collect()
      .flatMap { r =>
        val key = groupCols.indices.map(r.get).toList
        ps.zipWithIndex.map { case ((name, _), i) =>
          (key, name) -> r.getDouble(groupCols.size + i)
        }
      }.toMap
    assert(got.keySet == want.keySet,
      s"group×percentile keys differ: ${got.keySet.diff(want.keySet)} / ${want.keySet.diff(got.keySet)}")
    for ((k, w) <- want)
      assert(math.abs(got(k) - w) <= 1e-9 * math.max(1.0, math.abs(w)),
        s"$k: got ${got(k)} want $w")
  }

  test("R26a: matches Spark's exact percentile across groups, fractions and skew") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // skewed group sizes: one group with 20k rows spans many range
    // partitions; tiny groups (1, 2, 3 rows) hit the bracketing edges
    val rows = Seq.tabulate(20000)(i => ("big", rnd.nextGaussian() * 100)) ++
      Seq(("one", 42.0)) ++
      Seq(("two", 1.0), ("two", 2.0)) ++
      Seq.tabulate(3)(i => ("three", i * 10.0)) ++
      Seq.tabulate(500)(i => ("mid", rnd.nextDouble() * 1e6))
    val df = rows.toDF("g", "v")
    check(df, Seq("g"), "v",
      Seq("p0" -> 0.0, "p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9, "p100" -> 1.0))
  }

  test("R26d: bounded driver collect — deep 16-bit-level descent resolves " +
      "binade-concentrated values and over-cap duplicate runs exactly") {
    import spark.implicits._
    // 5000 distinct values inside ONE level-1 bucket (same binade, top
    // mantissa bits shared) — the r19-advice driver-OOM shape; plus a
    // 1000-row single-value group that stays over-cap down to the full
    // 64 bits (the shift==0 direct resolution); plus a mixed group.
    val rows =
      Seq.tabulate(5000)(i => ("dense", 1.0 + i * 1e-9)) ++
        Seq.fill(1000)(("const", 7.25)) ++
        Seq.tabulate(300)(i => ("mix", if (i % 3 == 0) 5.0 else i * 1.0))
    val df = rows.toDF("g", "v")
    val ps = Seq("p0" -> 0.0, "p37" -> 0.37, "p50" -> 0.5, "p100" -> 1.0)
    val got = Percentiles.exact(df, Seq("g"), "v", ps, collectCap = 64L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val want = Percentiles.exact(df, Seq("g"), "v", ps) // default cap: legacy 2-pass shape
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got == want, s"descent path diverged: got $got want $want")
    val oracle = df.groupBy("g")
      .agg(expr("percentile(v, 0.37)").as("w")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((g, w) <- oracle)
      assert(math.abs(got((g, "p37")) - w) <= 1e-12 * math.max(1.0, math.abs(w)),
        s"$g p37: got ${got((g, "p37"))} want $w")
  }

  test("R26b: multi-column groups, null values ignored, integer input cast") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(5000) { i =>
      (s"a${i % 3}", i % 2, if (i % 17 == 0) None else Some(rnd.nextInt(1000)))
    }
    val df = rows.toDF("g1", "g2", "v")
    check(df, Seq("g1", "g2"), "v", Seq("p10" -> 0.1, "p50" -> 0.5, "p99" -> 0.99))
  }

  test("L22: KLL sketch quantiles — rank error bounded, shuffle-mergeable, " +
    "deterministic, buffer survives serialization") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val n = 60000
    // two distributions per group: gaussian and heavy-tailed
    val rows = Seq.tabulate(n)(i =>
      ("gauss", rnd.nextGaussian() * 100)) ++
      Seq.tabulate(n)(i => ("pareto", math.pow(rnd.nextDouble().max(1e-9), -1.5)))
    val df = rows.toDF("g", "v").repartition(16) // forces partial-buffer serialization + merge
    val ps = Seq("p01" -> 0.01, "p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    val approx = graft.operators.Percentiles.approx(df, Seq("g"), "v", ps, k = 256)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(approx.size == 2 * ps.size)
    // rank-error bound: the rank of the estimate within the exact sorted
    // values must be within 1.5% of n of the target rank (k=256 worst
    // case is far below this; generous for host-independence)
    val exactByGroup = rows.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).sorted.toArray }
    for (((g, name), est) <- approx) {
      val sorted = exactByGroup(g)
      val p = ps.find(_._1 == name).get._2
      val target = p * (sorted.length - 1)
      var rank = java.util.Arrays.binarySearch(sorted, est)
      if (rank < 0) rank = -rank - 1
      assert(math.abs(rank - target) <= 0.015 * sorted.length + 2,
        s"$g/$name: est=$est rank=$rank target=$target")
    }
    // deterministic: no RNG in the sketch, same partitioning → same result
    val again = graft.operators.Percentiles.approx(df, Seq("g"), "v", ps, k = 256)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(approx == again)
    // explicit merge associativity at the buffer level: split-and-merge
    // equals a straight build for the quantile view's error bound
    val vals = exactByGroup("gauss")
    val whole = new graft.functions.QuantileBuffer(128)
    vals.foreach(whole.add)
    val a = new graft.functions.QuantileBuffer(128)
    val b = new graft.functions.QuantileBuffer(128)
    vals.zipWithIndex.foreach { case (v, i) => if (i % 2 == 0) a.add(v) else b.add(v) }
    val ser = graft.functions.QuantileBuffer.deserialize(b.serializeBytes())
    a.mergeIn(ser)
    assert(a.count == whole.count && a.count == vals.length.toLong)
    for (p <- Seq(0.1, 0.5, 0.9)) {
      val est = a.quantile(p)
      var rank = java.util.Arrays.binarySearch(vals, est)
      if (rank < 0) rank = -rank - 1
      assert(math.abs(rank - p * (vals.length - 1)) <= 0.02 * vals.length + 2,
        s"merged buffer p=$p est=$est rank=$rank")
    }
    // SQL surface through the registered function
    graft.GraftExtensions.register(spark)
    df.createOrReplaceTempView("kll_in")
    val sqlRow = spark.sql(
      "SELECT g, kll_quantiles(v, 256, 0.5) AS q FROM kll_in GROUP BY g ORDER BY g").collect()
    assert(sqlRow.length == 2 && sqlRow.forall(_.getSeq[Double](1).length == 1))
  }

  test("R26c: deterministic across invocations and leaves no cached blocks behind") {
    import spark.implicits._
    val df = Seq.tabulate(4000)(i => (s"g${i % 5}", (i * 37 % 997).toDouble)).toDF("g", "v")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val a = Percentiles.exact(df, Seq("g"), "v", Seq("p50" -> 0.5, "p75" -> 0.75))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(after.diff(before).isEmpty, "operator leaked persisted RDDs")
    val b = Percentiles.exact(df, Seq("g"), "v", Seq("p50" -> 0.5, "p75" -> 0.75))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
    assert(a.toSeq == b.toSeq)
  }
}
