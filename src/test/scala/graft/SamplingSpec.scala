package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.3 L14: stratified data-mixture sampling. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("L14: hash-threshold mixture hits targets within Bernoulli tolerance, deterministically") {
    val totals = Tables.documents(spark, dir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = SparkEntry.queries("q_sample_mixture")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fractions = Map("en" -> 0.8, "de" -> 0.5, "fr" -> 0.5, "es" -> 0.25, "zh" -> 0.1)
    for ((lang, f) <- fractions) {
      val n = totals(lang).toDouble
      val got = out.getOrElse(lang, 0L).toDouble
      val sd = math.sqrt(n * f * (1 - f))
      assert(math.abs(got - n * f) <= 4 * sd + 1,
        s"$lang: got $got expected ~${n * f} (±${4 * sd})")
    }
    // seed-stable: same seed, same sample
    val again = SparkEntry.queries("q_sample_mixture")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == again)
  }
}
