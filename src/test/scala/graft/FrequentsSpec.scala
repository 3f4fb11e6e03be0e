package graft

import graft.functions.FreqBuffer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.3 L23: mergeable Misra–Gries frequent-items sketch. */
class FrequentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("L23a: exact regime — distinct <= 2k gives exact counts through the full operator") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // 40 distinct items per group, k=32 (2k=64 > 40): never compacts
    val rows = Seq.tabulate(30000) { i =>
      (s"g${i % 3}", s"item${rnd.nextInt(40)}")
    }
    val df = rows.toDF("g", "item").repartition(8) // force real merges
    val got = operators.Sketches.topItems(df, Seq("g"), "item", k = 32, topN = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val want = df.groupBy("g", "item").count()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(desc("count"), col("item"))).cast("long"))
      .filter(col("rn") <= 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.sorted.toSeq == want.sorted.toSeq)
  }

  test("L23b: MG guarantees on a high-cardinality skewed stream (cardinality >> k)") {
    val k = 64
    val buf = new FreqBuffer(k)
    val rnd = new scala.util.Random(5)
    // heavy hitters h1 (20k), h2 (10k), h3 (5k) buried in 200k singleton-ish tail
    val stream = scala.util.Random.javaRandomToRandom(new java.util.Random(9)).shuffle(
      Seq.fill(20000)("h1") ++ Seq.fill(10000)("h2") ++ Seq.fill(5000)("h3") ++
        Seq.tabulate(200000)(i => s"t${rnd.nextInt(150000)}"))
    stream.foreach(buf.add)
    val n = stream.size.toLong
    assert(buf.n == n)
    // the cumulative-decrement bound the analysis promises
    assert(buf.err <= n / (k + 1), s"err ${buf.err} exceeds n/(k+1) ${n / (k + 1)}")
    val top = buf.top(10).toMap
    // any item with true freq > n/(k+1) ≈ 3615 must survive
    for ((h, true_) <- Seq(("h1", 20000L), ("h2", 10000L), ("h3", 5000L))) {
      assert(top.contains(h), s"heavy hitter $h lost (top=${buf.top(10)})")
      // estimates never overcount and undercount by at most err
      assert(top(h) <= true_ && top(h) >= true_ - buf.err,
        s"$h: est ${top(h)} true $true_ err ${buf.err}")
    }
    // and the heaviest item ranks first
    assert(buf.top(1).head._1 == "h1")
  }

  test("L23c: merge tree equals single-pass in the exact regime; bounds hold when compacting") {
    val rnd = new scala.util.Random(17)
    val items = Seq.tabulate(9000)(_ => s"i${rnd.nextInt(100)}") // 100 distinct
    // exact regime (k=64, 2k=128 >= 100): 3-way split+merge == single pass
    def build(k: Int, xs: Seq[String]): FreqBuffer = {
      val b = new FreqBuffer(k); xs.foreach(b.add); b
    }
    val whole = build(64, items)
    val merged = new FreqBuffer(64)
    items.grouped(3000).foreach(chunk => merged.mergeIn(build(64, chunk)))
    assert(merged.top(100) == whole.top(100) && merged.err == 0 && whole.err == 0)
    // compacting regime (k=8): the survival + undercount bounds still hold
    val small = new FreqBuffer(8)
    val skewed = rnd.shuffle(Seq.fill(5000)("big") ++ Seq.tabulate(20000)(i => s"u$i"))
    skewed.grouped(5000).foreach(chunk => small.mergeIn(build(8, chunk)))
    assert(small.err <= skewed.size / 9)
    val est = small.top(8).toMap
    assert(est.contains("big") && est("big") <= 5000 && est("big") >= 5000 - small.err)
  }

  test("L23e: empty-sketch and uniform-tail edge cases — absent group, never fabricated counts") {
    // exactly 2k+1 equal singletons: the compaction threshold equals
    // every count and the sketch deterministically EMPTIES — top() is
    // empty, and through the operator the group would yield no rows
    // ("no provably frequent item"), not fabricated ones
    val b = new FreqBuffer(8)
    (0 until 17).foreach(i => b.add(s"x$i"))
    assert(b.top(8).isEmpty && b.n == 17 && b.err == 1)
    // operator level on a uniform-singleton group: residual
    // post-compaction stragglers may surface, but every reported count
    // must be a true UNDERcount (est ≤ true = 1... + err slack never
    // inflates a count) and the dominant item of a mixed group wins
    import spark.implicits._
    val rows = Seq.tabulate(600)(i => ("u", s"one$i")) ++
      Seq.fill(300)(("s", "hot")) ++ Seq.tabulate(100)(i => ("s", s"cold$i"))
    val got = operators.Sketches.topItems(rows.toDF("g", "item"), Seq("g"), "item",
        k = 8, topN = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    got.filter(_._1 == "u").foreach { case (_, item, cnt) =>
      assert(cnt <= 1L, s"uniform singleton $item overcounted: $cnt") // MG never overcounts
    }
    val sTop = got.filter(_._1 == "s")
    assert(sTop.head._2 == "hot" && sTop.head._3 <= 300L)
  }

  test("L23d: serialization round-trips and the SQL surface works") {
    val b = new FreqBuffer(16)
    Seq("a", "b", "a", "c", "a", "b").foreach(b.add)
    val r = FreqBuffer.deserialize(b.serializeBytes())
    assert(r.n == b.n && r.err == b.err && r.top(16) == b.top(16) && r.k == b.k)

    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(("x", "m"), ("x", "m"), ("x", "o")).toDF("g", "i").createOrReplaceTempView("fi_t")
    val rows = spark.sql(
      "SELECT g, freq_items(i, 16, 2) AS f FROM fi_t GROUP BY g").collect()
    assert(rows.length == 1)
    val arr = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(arr.map(x => (x.getString(0), x.getLong(1))) == Seq(("m", 2L), ("o", 1L)))
  }
}
