package graft

import graft.functions.{HashExpr, SimHash64Impl}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom Catalyst expressions: codegen path vs interpreted reference. */
class HashExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refPoly(s: String, mult: Long, mod: Long): Long = {
    var acc = 0L
    s.codePoints().forEach { cp =>
      acc = acc * mult + cp
      if (mod > 0) acc %= mod
    }
    acc
  }

  test("PolyHash64 (codegen) matches the interpreted reference") {
    // includes a supplementary-plane char: the fold is over CODE POINTS
    // (= DuckDB ord()), not UTF-16 units
    val inputs = Seq("", "a", "hello world", "the fast key order sort", "Ünïcödé", "a😀b")
    val got = inputs.toDF("s").select(HashExpr.polyHash(col("s"))).collect().map(_.getLong(0))
    assert(got.toSeq == inputs.map(refPoly(_, 31L, 1000000007L)))
    val got64 = inputs.toDF("s").select(HashExpr.tokenHash64(col("s"))).collect().map(_.getLong(0))
    assert(got64.toSeq == inputs.map(refPoly(_, 1099511628211L, 0L)))
  }

  test("R73: key_sampling_percent — [0,1) range, rate, join-chain consistency, error face") {
    GraftExtensions.register(spark)
    // deterministic + in range + matches the documented integer rule
    val v = spark.sql("SELECT key_sampling_percent('k42')").head.getDouble(0)
    val h = refPoly("k42", 31L, 1000000007L)
    assert(v == ((h * 2654435761L) % 4294967296L).toDouble / 4294967296.0)
    // ~10% sample rate over 4000 NEAR-IDENTICAL keys: the Fibonacci
    // mix is what keeps the rate honest — the raw poly fold of
    // consecutive keys is sequential and would sample a contiguous run
    val keys = (1 to 4000).map(i => s"o$i").toDF("k")
    val kept = keys.filter(expr("key_sampling_percent(k) < 0.1")).count()
    assert(math.abs(kept - 400L) < 120, s"rate off: $kept/4000 at 10%")
    // CONSISTENCY (the :979 join-chain property): the same keys survive
    // the filter applied independently on two different frames
    val a = keys.filter(expr("key_sampling_percent(k) < 0.1"))
      .collect().map(_.getString(0)).toSet
    val b = keys.sample(1.0, seed = 7).filter(expr("key_sampling_percent(k) < 0.1"))
      .collect().map(_.getString(0)).toSet
    assert(a == b)
    // stays inside whole-stage codegen (scan-side predicate at 100 TB);
    // a range-backed frame so Catalyst can't fold the local rows away
    val plan = spark.range(4000)
      .select(concat(lit("o"), col("id")).as("k"))
      .filter(expr("key_sampling_percent(k) < 0.1"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*(1)"), plan)
    // error face (ref testKeyBasedSamplingFunctionError): a non-string
    // key fails analysis loudly instead of hashing raw internals
    val e = intercept[Exception](
      spark.sql("SELECT key_sampling_percent(42)").head)
    assert(e.getMessage.contains("STRING"), e.getMessage)
  }

  test("PolyHash64 stays inside whole-stage codegen") {
    // a range source (not a local relation, which constant-folds) so the
    // physical plan actually runs codegen
    val df = spark.range(5).select(HashExpr.polyHash(col("id").cast("string")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*(1)"), plan)
  }

  test("SimHash64 of identical token sets is identical; near sets are near") {
    val df = Seq(
      ("a", "spark fast join merge table"),
      ("b", "spark fast join merge table"),
      ("c", "completely different words entirely here")).toDF("id", "t")
    val sims = df.select(col("id"),
      HashExpr.simHash(transform(split(col("t"), " "), w => HashExpr.tokenHash64(w))).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sims("a") == sims("b"))
    assert(SimHash64Impl.hamming(sims("a"), sims("c")) > 3)
  }

  test("SimHashWords (fused codegen) equals SimHash64 over transformed token hashes") {
    val texts = Seq("spark fast join merge table", "one", "",
      "the quick brown fox jumps over the lazy dog", "Ünïcödé wörds 😀 here")
    val df = texts.toDF("t").select(split(col("t"), " ").as("w"))
    val fused = df.select(HashExpr.simHashWords(col("w"))).collect().map(_.getLong(0))
    val hof = df.select(
      HashExpr.simHash(transform(col("w"), w => HashExpr.tokenHash64(w))))
      .collect().map(_.getLong(0))
    assert(fused.toSeq == hof.toSeq)
    // and it stays inside whole-stage codegen
    val plan = spark.range(5)
      .select(HashExpr.simHashWords(split(col("id").cast("string"), " ")))
    plan.collect()
    val p = plan.queryExecution.executedPlan.toString
    assert(p.contains("WholeStageCodegen") || p.contains("*(1)"), p)
  }

  test("Md5Bits60 ≡ CAST(conv(substr(md5(s),1,15),16,10) AS BIGINT), codegen, nulls") {
    import graft.functions.BitsExpr
    val inputs = Seq("", "a", "hello|world|1|2", "Ünïcödé 😀", "42|9|1992-03-14|N")
    val got = inputs.toDF("s")
      .select(BitsExpr.md5Bits60(col("s")).as("f"),
        expr("CAST(conv(substr(md5(s),1,15),16,10) AS BIGINT)").as("r"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    got.foreach(r => assert(r.getLong(0) >= 0L)) // 60 bits, never negative
    // stays inside whole-stage codegen
    val df = spark.range(5).select(BitsExpr.md5Bits60(col("id").cast("string")))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WholeStageCodegen") || p.contains("*(1)"), p)
    // null propagation
    val n = Seq[Option[String]](None, Some("x")).toDF("s")
      .select(BitsExpr.md5Bits60(col("s"))).collect()
    assert(n(0).isNullAt(0) && !n(1).isNullAt(0))
  }

  test("DoubleBits ordering: sign-adjusted bits preserve double order") {
    import graft.functions.BitsExpr
    val vals = Seq(Double.NegativeInfinity, -1.5e300, -2.0, -1.0, -1e-300,
      -0.0, 0.0, 1e-300, 0.5, 1.0, 2.0, 1.5e300, Double.PositiveInfinity)
    val ord = vals.toDF("v").select(BitsExpr.orderedBits(col("v")))
      .collect().map(_.getLong(0))
    assert(ord.toSeq == ord.sorted.toSeq, s"not monotone: ${ord.mkString(",")}")
    // driver mirror agrees with the expression
    val drv = vals.map(BitsExpr.orderedBitsOf)
    assert(ord.toSeq == drv)
  }

  test("null propagation") {
    val got = Seq[Option[String]](None, Some("x")).toDF("s")
      .select(HashExpr.polyHash(col("s"))).collect()
    assert(got(0).isNullAt(0) && !got(1).isNullAt(0))
  }

  test("CharStats (codegen) matches an interpreted reference, incl. non-ASCII and empty") {
    import graft.functions.CharStatsExpr
    def ref(s: String): (Long, Long, Int) = {
      val counts = s.codePoints().toArray.groupBy(identity).view.mapValues(_.length.toLong)
      val coll = counts.values.map(c => c * (c - 1)).sum
      (coll, s.codePointCount(0, s.length).toLong, counts.size)
    }
    val inputs = Seq("", "a", "aaab", "hello world", "Ünïcödé", "a😀😀b", "日本日本語")
    val got = inputs.toDF("s")
      .select(CharStatsExpr.charStats(col("s")).as("cs"))
      .select(col("cs.coll"), col("cs.n"), col("cs.dchars"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == inputs.map(ref))
    // hand-checked anchor: "aaab" → a:3 b:1 ⇒ coll=3·2=6, n=4, dchars=2
    assert(got(2) == ((6L, 4L, 2)))
    // codegen, not interpreted fallback
    val df = spark.range(5).select(CharStatsExpr.charStats(concat(col("id").cast("string"), lit("aa"))))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WholeStageCodegen") || p.contains("*(1)"), p)
    // null propagation
    val n = Seq[Option[String]](None, Some("x")).toDF("s")
      .select(CharStatsExpr.charStats(col("s"))).collect()
    assert(n(0).isNullAt(0) && !n(1).isNullAt(0))
  }

  test("L69 HashedWeightSum: reference parity, empty array, codegen path") {
    import graft.functions.{HashExpr, PolyHash64Impl}
    import org.apache.spark.unsafe.types.UTF8String
    def ref(words: Seq[String]): Long = words.map { w =>
      val slot = PolyHash64Impl.hash(UTF8String.fromString(w), 31L, 1000000007L) % 64
      (slot * 37 + 11) % 21 - 10
    }.sum
    val inputs = Seq(Seq("the", "quick", "fox"), Seq(""), Seq.empty[String],
      Seq("a", "a", "a"), Seq("Ünïcödé", "日本語"))
    val got = inputs.toDF("ws")
      .select(HashExpr.hashedScore(col("ws"))).collect().map(_.getLong(0))
    assert(got.toSeq == inputs.map(ref))
    assert(ref(Seq.empty) == 0L)
    // duplicates accumulate with multiplicity (bag, not set)
    assert(ref(Seq("a", "a", "a")) == 3 * ref(Seq("a")))
    // stays inside whole-stage codegen
    val df = spark.range(5)
      .select(HashExpr.hashedScore(split(col("id").cast("string"), "-")))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WholeStageCodegen") || p.contains("*(1)"), p)
  }

  test("L69 learned weights: table scoring routes through the trained table") {
    import graft.functions.{HashExpr, PolyHash64Impl}
    import org.apache.spark.unsafe.types.UTF8String
    // the default pseudo-schedule expressed AS a table must reproduce
    // hashedScore exactly — the learned surface is a strict superset
    val schedule = (0 until 64).map(s => ((s.toLong * 37 + 11) % 21 - 10)).toSeq
    val inputs = Seq(Seq("the", "quick", "fox"), Seq.empty[String],
      Seq("a", "a", "b"), Seq("Ünïcödé", "日本語"))
    val both = inputs.toDF("ws")
      .select(HashExpr.hashedScore(col("ws")).as("s1"),
        HashExpr.hashedScoreWeights(col("ws"), schedule).as("s2"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    // a one-hot table proves the lookup routes by slot: only the probe
    // word's slot carries weight, so score = multiplicity × weight
    val probeSlot =
      (PolyHash64Impl.hash(UTF8String.fromString("probe"), 31L, 1000000007L) % 64).toInt
    val oneHot = Seq.tabulate(64)(s => if (s == probeSlot) 5L else 0L)
    val got = Seq(Seq("probe", "probe", "other")).toDF("ws")
      .select(HashExpr.hashedScoreWeights(col("ws"), oneHot)).collect().head.getLong(0)
    val otherSlot =
      (PolyHash64Impl.hash(UTF8String.fromString("other"), 31L, 1000000007L) % 64).toInt
    assert(got == (if (otherSlot == probeSlot) 15L else 10L))
    // train a trivial table distributed and verify it separates the
    // training classes when scored THROUGH the expression. Vocabulary
    // is picked slot-disjoint across classes (collisions fold a pos and
    // neg word into one slot and are a property of the 64-slot model,
    // not of the trainer) — a real filter uses more slots than classes'
    // vocabulary for the same reason.
    def slotOf(w: String): Int =
      (PolyHash64Impl.hash(UTF8String.fromString(w), 31L, 1000000007L) % 64).toInt
    val vocab = Iterator.from(0).map(i => s"w$i")
      .scanLeft((Seq.empty[String], Set.empty[Int])) { case ((ws, slots), w) =>
        if (slots(slotOf(w))) (ws, slots) else (ws :+ w, slots + slotOf(w))
      }.find(_._1.size == 20).get._1
    val (posV, negV) = vocab.splitAt(10)
    val docs = ((0 until 40).map(i =>
      ((0 until 5).map(j => posV((i + j) % 10)).mkString(" "), true)) ++
      (0 until 40).map(i =>
        ((0 until 5).map(j => negV((i + j) % 10)).mkString(" "), false)))
      .toDF("text", "label")
    val w = graft.operators.TextOps.trainLinearWeights(docs, "text", "label")
    val scored = docs.select(col("label"),
      HashExpr.hashedScoreWeights(graft.functions.Text.words(col("text")), w.toSeq).as("s"))
      .collect()
    val correct = scored.count(r => (r.getLong(1) > 0) == r.getBoolean(0))
    assert(correct == 80, s"learned table separates only $correct/80")
    // learned-table scoring stays inside whole-stage codegen
    val dfw = spark.range(5)
      .select(HashExpr.hashedScoreWeights(split(col("id").cast("string"), "-"), schedule))
    dfw.collect()
    val pw = dfw.queryExecution.executedPlan.toString
    assert(pw.contains("WholeStageCodegen") || pw.contains("*(1)"), pw)
  }
}
