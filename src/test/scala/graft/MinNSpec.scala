package graft

import graft.functions.{HashExpr, MinNAgg}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY L28 supporting aggregate: bounded min-N-by-(ord,id) summary ≡
  * the row_number window formulation, under any partitioning. */
class MinNSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("MinNSummary ≡ row_number window on the documents corpus, any partitioning") {
    val h = HashExpr.polyHash(
      concat(col("doc_id").cast("string"), lit(":"), col("source")))
    val win = Tables.documents(spark, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(h, col("doc_id"))))
      .groupBy("source")
      .agg(count(lit(1)).as("total"),
        sum(when(col("rn") <= 10, 1L).otherwise(0L)).as("kept"),
        sum(when(col("rn") <= 10, col("n_chars")).otherwise(0L)).as("kept_chars"))
      .orderBy("source").collect().map(_.toString).toSeq
    for (parts <- Seq(1, 7, 31)) {
      val agg = Tables.documents(spark, dir).repartition(parts)
        .groupBy("source")
        .agg(count(lit(1)).as("total"),
          MinNAgg.minNSummary(h, col("doc_id"), col("n_chars"), 10).as("s"))
        .select(col("source"), col("total"),
          col("s.kept").as("kept"), col("s.payload_sum").as("kept_chars"))
        .orderBy("source").collect().map(_.toString).toSeq
      assert(agg == win, s"mismatch at $parts partitions")
    }
  }

  test("SQL surface: vec_quantize and min_n_summary registered and correct") {
    GraftExtensions.register(spark)
    val q = spark.sql(
      "SELECT vec_quantize(array(CAST(0.0012 AS DOUBLE), CAST(-0.0015 AS DOUBLE)), 1000.0) v")
      .collect().head.getSeq[Double](0)
    assert(q == Seq(1.0, -2.0), s"got $q") // half away from zero
    val s = spark.sql(
      """SELECT k, min_n_summary(ord, id, p, 2) s FROM VALUES
        |  ('a', 3L, 1L, 10L), ('a', 1L, 2L, 20L), ('a', 2L, 3L, 30L)
        |  AS t(k, ord, id, p) GROUP BY k""".stripMargin)
      .selectExpr("s.kept", "s.payload_sum").collect().head
    assert(s.getLong(0) == 2 && s.getLong(1) == 50, // ords 1,2 → payloads 20+30
      s"got ${s.toString}")
  }

  test("hot key: 100k rows on one key through 64 partitions — exact n smallest survive") {
    import spark.implicits._
    // ord = a permuted hash of i; the true 5 smallest are known by sort
    val rows = (0L until 100000L).map(i => ("hot", i * 2654435761L % 1000003L, i, 1L))
    val df = rows.toDF("k", "ord", "id", "p").repartition(64)
    val got = df.groupBy("k")
      .agg(MinNAgg.minNSummary(col("ord"), col("id"), col("p"), 5).as("s"))
      .select(col("s.kept"), col("s.payload_sum")).collect().head
    assert(got.getLong(0) == 5 && got.getLong(1) == 5)
    // cross-check the selected set via the driver
    val want = rows.sortBy(r => (r._2, r._3)).take(5).map(_._4).sum
    assert(got.getLong(1) == want)
    // ties on ord resolve by id: duplicate ords must not drop entries
    val tied = (0L until 1000L).map(i => ("t", 7L, i, i)).toDF("k", "ord", "id", "p")
      .repartition(16)
    val t = tied.groupBy("k")
      .agg(MinNAgg.minNSummary(col("ord"), col("id"), col("p"), 5).as("s"))
      .select(col("s.kept"), col("s.payload_sum")).collect().head
    assert(t.getLong(0) == 5 && t.getLong(1) == (0L + 1 + 2 + 3 + 4))
  }

  test("MinNRows ≡ row_number window (composite desc/asc order + payload), any partitioning") {
    import spark.implicits._
    // synthetic (lang, term, ldf, cdf) frame with score ties that the
    // term tie-break must resolve deterministically
    val rows = for {
      lang <- Seq("de", "en", "fr"); i <- 0 until 500
    } yield (lang, f"t$i%04d", (i % 7 + 1).toLong, (i % 11 + 2).toLong)
    val base = rows.toDF("lang", "term", "ldf", "cdf")
      .withColumn("score", col("ldf").cast("double") / col("cdf"))
    val win = base
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(desc("score"), desc("ldf"), col("term"))))
      .filter(col("rn") <= 5)
      .select(col("lang"), col("rn").cast("long").as("rn"), col("term"),
        col("ldf"), col("cdf"), round(col("score"), 4).as("score"))
      .orderBy("lang", "rn").collect().map(_.toString).toSeq
    for (parts <- Seq(1, 7, 31)) {
      val agg = base.repartition(parts)
        .groupBy("lang")
        .agg(MinNAgg.minNRows(5,
          Seq(("score", col("score"), true), ("ldf", col("ldf"), true),
            ("term", col("term"), false)),
          Seq(("cdf", col("cdf")))).as("t"))
        .select(col("lang"), posexplode(col("t")))
        .select(col("lang"), (col("pos") + 1).cast("long").as("rn"),
          col("col.term").as("term"), col("col.ldf").as("ldf"),
          col("col.cdf").as("cdf"), round(col("col.score"), 4).as("score"))
        .orderBy("lang", "rn").collect().map(_.toString).toSeq
      assert(agg == win, s"mismatch at $parts partitions")
    }
  }

  test("MinNRows single-column mode emits a sorted plain array on a hot key") {
    import spark.implicits._
    // 100k-row hot term: the window form would sort all of it in one
    // task; the aggregate keeps ≤ 20 per partition. Permuted ids so
    // arrival order ≠ sorted order.
    val df = (0L until 100000L).map(i => ("hot", i * 2654435761L % 1000003L))
      .toDF("term", "doc_id").repartition(64)
    val got = df.groupBy("term")
      .agg(MinNAgg.minNRows(20, Seq(("doc_id", col("doc_id"), false))).as("h"))
      .select(org.apache.spark.sql.functions.array_join(
        col("h").cast("array<string>"), ",").as("s"))
      .collect().head.getString(0)
    val want = (0L until 100000L).map(i => i * 2654435761L % 1000003L)
      .sorted.take(20).mkString(",")
    assert(got == want)
  }
}
