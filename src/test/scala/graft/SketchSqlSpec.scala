package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.2 R70: the Presto approx-sketch SQL surface —
  * `approx_set` / `merge` / `cardinality` / `approx_percentile`
  * registered as SQL functions over the L63 KMV/KLL machinery (ref:
  * paimon-presto TestPrestoSqlITCase testApproxSet /
  * testMergeHyperLogLog). The q_approx_set / q_approx_percentile
  * oracles prove the exact regime; this spec pins the SQL-registry
  * faces the oracle can't: the `cardinality` name dispatch (sketch vs
  * collection), the approx-regime error bound, and mixed-k merges.
  */
class SketchSqlSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    GraftExtensions.register(s)
    s
  }
  import spark.implicits._

  test("R70a: cardinality() dispatches — BINARY sketch -> estimate, array/map keep Spark size semantics") {
    // registering the Presto overload must NOT break the builtin faces
    val r = spark.sql(
      "SELECT cardinality(array(1, 2, 3)) AS a, cardinality(map('x', 1)) AS m").head
    assert(r.getInt(0) == 3 && r.getInt(1) == 1)
    val est = spark.sql(
      "SELECT cardinality(approx_set(v)) AS c FROM VALUES (1),(2),(3),(2) t(v)").head.getLong(0)
    assert(est == 3L, "exact regime: 3 distinct below k=256 must be exact")
  }

  test("R70b: approx_set -> store -> merge -> cardinality through SQL equals exact below k") {
    (1 to 500).map(i => (i % 7, s"u${i % 40}")).toDF("g", "u")
      .createOrReplaceTempView("r70_src")
    val got = spark.sql(
      """WITH cells AS (
        |  SELECT g, u IS NOT NULL AND length(u) > 2 AS cell, approx_set(u) sk
        |  FROM r70_src GROUP BY g, 2)
        |SELECT g, cardinality(merge(sk)) c FROM cells GROUP BY g ORDER BY g""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val exact = spark.sql("SELECT g, count(DISTINCT u) c FROM r70_src GROUP BY g")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(got == exact)
  }

  test("R70c: approx regime — estimate within the KMV error envelope, merge order-independent") {
    (1 to 20000).map(i => s"v$i").toDF("u").createOrReplaceTempView("r70_big")
    val est = spark.sql("SELECT cardinality(approx_set(u, 256)) FROM r70_big").head.getLong(0)
    // KMV stderr ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert(math.abs(est - 20000) < 20000 * 0.25, s"estimate $est too far from 20000")
    // merging per-cell sketches must reproduce the one-pass estimate
    // bit-for-bit (union-stable k-min set), regardless of cell split
    val merged = spark.sql(
      """WITH cells AS (
        |  SELECT crc32(u) % 13 cell, approx_set(u, 256) sk FROM r70_big GROUP BY 1)
        |SELECT cardinality(merge(sk)) FROM cells""".stripMargin).head.getLong(0)
    assert(merged == est)
  }

  test("R70e: NULL inputs are skipped — with-nulls, only-nulls and null-group faces " +
    "(ref PrestoDistributedQueryTest testApproxSetGroupByWithNulls/OnlyNulls)") {
    // Presto: approx_set skips NULLs like COUNT(DISTINCT); a group of
    // only NULLs yields an EMPTY sketch (Presto returns NULL — our
    // sketch is non-null but must estimate 0)
    Seq((1, Option("a")), (1, Option("b")), (1, None), (2, None), (2, None))
      .toDF("g", "u").createOrReplaceTempView("r70_nulls")
    val got = spark.sql(
      """SELECT g, cardinality(approx_set(u)) c FROM r70_nulls GROUP BY g ORDER BY g""")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == Seq((1, 2L), (2, 0L)),
      s"NULLs must not count as a distinct element: $got")
    // grouping BY a nullable key: the NULL group aggregates like any other
    Seq((Option("x"), "a"), (None, "a"), (None, "b"), (None, "b"))
      .toDF("g", "u").createOrReplaceTempView("r70_nullgrp")
    val byGrp = spark.sql(
      """SELECT g, cardinality(approx_set(u)) c FROM r70_nullgrp
        |GROUP BY g ORDER BY g NULLS FIRST""".stripMargin)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSeq
    assert(byGrp == Seq((None, 2L), (Some("x"), 1L)))
    // and the stored→merge flow preserves the skip (merge of an
    // only-nulls cell's sketch adds nothing)
    val merged = spark.sql(
      """WITH cells AS (
        |  SELECT g, approx_set(u) sk FROM r70_nulls GROUP BY g)
        |SELECT cardinality(merge(sk)) FROM cells""".stripMargin).head.getLong(0)
    assert(merged == 2L)
  }

  test("R70f: approx_set(x, maxError) — Presto's fractional second argument maps to k") {
    // maxError 0.0325 → k = ceil((1.04/0.0325)^2) = 1024: 1000 distinct
    // values sit BELOW k, so the estimate must be exact — proving the
    // adapter produced a sketch at least that large
    (1 to 1000).map(i => s"v$i").toDF("u").createOrReplaceTempView("r70_me")
    val est = spark.sql(
      "SELECT cardinality(approx_set(u, 0.0325D)) FROM r70_me").head.getLong(0)
    assert(est == 1000L, s"maxError=0.0325 must yield k>=1024 (exact at 1000): $est")
    // default Presto error (no argument) stays the k=256 default;
    // out-of-range maxError fails loudly like Presto's
    val e = intercept[Exception](
      spark.sql("SELECT cardinality(approx_set(u, 0.5D)) FROM r70_me").head)
    assert(e.getMessage.contains("maxError"), s"wrong error: ${e.getMessage}")
  }

  test("R70g: cardinality() on a non-sketch BINARY fails loudly, never decodes garbage") {
    val e = intercept[Exception](
      spark.sql("SELECT cardinality(CAST('not a sketch!!' AS BINARY))").head)
    assert(e.getMessage.contains("KMV sketch"),
      s"expected the sketch-vs-collection dispatch message: ${e.getMessage}")
  }

  test("P4a: p4_approx_set — bigint/double/varchar faces, group-by, accuracy envelope " +
    "(ref testP4ApproxSetBigint/Double/Varchar/GroupBy :809-858)") {
    (1 to 20000).map(i => (i % 4, i.toLong, i / 7.0, s"v$i")).toDF("g", "b", "d", "s")
      .createOrReplaceTempView("p4_src")
    // each typed face estimates within the p=12 envelope (1.04/sqrt(4096)
    // ≈ 1.6%; allow 4 sigma ≈ 6.5%)
    for (c <- Seq("b", "d", "s")) {
      val est = spark.sql(s"SELECT cardinality(p4_approx_set($c)) FROM p4_src").head.getLong(0)
      assert(math.abs(est - 20000) < 20000 * 0.065, s"$c: estimate $est too far from 20000")
    }
    // group-by: per-group estimates track per-group exact counts
    val got = spark.sql(
      "SELECT g, cardinality(p4_approx_set(s)) c FROM p4_src GROUP BY g")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    for (g <- 0 to 3)
      assert(math.abs(got(g) - 5000) < 5000 * 0.09, s"group $g: ${got(g)}")
    // the sketch is the FIXED-SIZE register file: 5-byte header + 2^12
    val bytes = spark.sql("SELECT p4_approx_set(s) FROM p4_src").head.getAs[Array[Byte]](0)
    assert(bytes.length == 5 + 4096, s"dense layout size: ${bytes.length}")
  }

  test("P4b: dense null faces + store->merge->cardinality; smaller maxError = bigger registers " +
    "(ref testP4ApproxSetWithNulls/OnlyNulls/GroupByWithNulls)") {
    Seq((1, Option("a")), (1, Option("b")), (1, None), (2, None), (2, None))
      .toDF("g", "u").createOrReplaceTempView("p4_nulls")
    // NULLs skipped; only-nulls group → empty sketch → 0 (small-range
    // linear counting returns exactly 0 when every register is 0)
    val got = spark.sql(
      "SELECT g, cardinality(p4_approx_set(u)) c FROM p4_nulls GROUP BY g ORDER BY g")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == Seq((1, 2L), (2, 0L)), s"$got")
    // stored sketches re-merge through the SAME merge() as KMV (header
    // dispatch), reproducing the one-pass estimate bit-for-bit
    (1 to 9000).map(i => s"w$i").toDF("u").createOrReplaceTempView("p4_big")
    val one = spark.sql("SELECT cardinality(p4_approx_set(u, 0.026D)) FROM p4_big").head.getLong(0)
    val merged = spark.sql(
      """WITH cells AS (
        |  SELECT crc32(u) % 7 cell, p4_approx_set(u, 0.026D) sk FROM p4_big GROUP BY 1)
        |SELECT cardinality(merge(sk)) FROM cells""".stripMargin).head.getLong(0)
    assert(merged == one, s"dense merge must be register-max exact: $merged vs $one")
    // maxError 0.026 → m=1600 → p=11 (2048 registers)
    val sz = spark.sql("SELECT p4_approx_set(u, 0.026D) FROM p4_big").head.getAs[Array[Byte]](0).length
    assert(sz == 5 + 2048, s"maxError→p mapping: $sz")
    // mixing the two families in one merge() group fails loudly
    val e = intercept[Exception](spark.sql(
      """SELECT cardinality(merge(sk)) FROM (
        |  SELECT approx_set(u) sk FROM p4_big
        |  UNION ALL SELECT p4_approx_set(u) FROM p4_big)""".stripMargin).head)
    assert(e.getMessage.contains("families") || Option(e.getCause).exists(_.getMessage.contains("families")),
      s"wrong error: ${e.getMessage}")
  }

  test("R70d: approx_percentile through SQL matches the exact percentile in the exact regime") {
    (1 to 999).map(i => (i % 3, i.toDouble)).toDF("g", "x")
      .createOrReplaceTempView("r70_pct")
    val got = spark.sql(
      """SELECT g, approx_percentile(x, 0.5D, 2048) p50 FROM r70_pct
        |GROUP BY g ORDER BY g""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    val exact = spark.sql(
      """SELECT g, percentile(x, 0.5D) p50 FROM r70_pct GROUP BY g ORDER BY g""")
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(got.toSeq == exact.toSeq)
  }
}
