package graft

import graft.functions.TryCastExpr
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TryCastLong (non-throwing try_cast to BIGINT) must match Spark's own
  * `try_cast(s AS BIGINT)` bit-for-bit — value AND nullness — over
  * adversarial strings: signs, whitespace vintages, decimals (the
  * legacy-accepted/exact-rejected corner), overflow boundaries, unicode,
  * empties. Checked through a DataFrame (codegen path) and via direct
  * eval (interpreted path). */
class TryCastSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val adversarial = Seq(
    "0", "1", "42", "-7", "+9", " 12 ", "\t13\n", "12a", "a12", "",
    " ", "+", "-", "--5", "++5", "9223372036854775807",
    "9223372036854775808", "-9223372036854775808", "-9223372036854775809",
    "3.7", "3.0", "3.", ".5", "-2.9", "0.0", "1e3", "0x1F", "¹²³",
    "١٢٣", "12 34", "NaN", "Infinity", "null", "12 ", "　99　",
    "000123", "-000", "+000", "9999999999999999999999999", "A", "N", "R")

  test("try_cast_long ≡ try_cast(s AS BIGINT): codegen path") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val alphabet = "0123456789+-. e\tXy "
    val fuzz = (0 until 1000).map(_ =>
      (0 until rng.nextInt(22)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    val df = (adversarial ++ fuzz).toDF("s")
    val bad = df.select(col("s"),
        TryCastExpr.tryCastLong(col("s")).as("f"),
        expr("try_cast(s AS BIGINT)").as("c"))
      .filter(!(col("f") <=> col("c")))
      .collect()
    assert(bad.isEmpty,
      s"native/builtin mismatch: ${bad.take(8).map(r => s"'${r.getString(0)}' -> ${r.get(1)} vs ${r.get(2)}").mkString("; ")}")
  }

  test("try_cast_long interpreted eval matches the builtin too") {
    import spark.implicits._
    val want = adversarial.toDF("s")
      .select(expr("try_cast(s AS BIGINT)")).collect().map(r =>
        if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0)))
    adversarial.zip(want).foreach { case (s, w) =>
      val got = graft.functions.TryCastLongImpl.parse(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(got == w, s"'$s': interpreted $got vs builtin $w")
    }
    // null input stays null through the expression's own eval
    val e = graft.functions.TryCastLong(
      org.apache.spark.sql.catalyst.expressions.Literal(null,
        org.apache.spark.sql.types.StringType))
    assert(e.eval(org.apache.spark.sql.catalyst.InternalRow.empty) == null)
  }
}
