package graft

import graft.functions.TextStatsExpr
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TextStats (fused one-pass ntok/alnum/len) must match the composed
  * builtins it replaces BIT-FOR-BIT — including the whitespace corner
  * cases (tabs/newlines surviving trim, trailing separators kept by
  * split's limit -1, multi-byte chars, empty strings). */
class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("text_stats ≡ size(split(trim)) / length(regexp_replace) / length") {
    import spark.implicits._
    val adversarial = Seq(
      "", " ", "  ", "\t", "\n", "a", " a ", "a b", "  a  b  ",
      "\ta b", "a b\t", "a b\n", "ab", "a\f\rb", "tab\tsep",
      "многоязычный текст тут", "汉字 没有 空格", "mixé café 42",
      "a1B2c3", "!!!", "a  \t\n  b", " nbsp not ws ",
      " leading", "trailing ", "\r\n", "x\r\ny", "0", "ends with tab\t")
    val rng = new scala.util.Random(42)
    val alphabet = "ab XY09\t\n\f\r汉é!.-_ "
    val fuzz = (0 until 500).map(_ =>
      (0 until rng.nextInt(40)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    val df = (adversarial ++ fuzz).toDF("text")
    val st = TextStatsExpr.textStats(col("text"))
    val bad = df.select(
        col("text"),
        st.getField("ntok").as("f_ntok"),
        st.getField("alnum").as("f_alnum"),
        st.getField("len").as("f_len"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("c_ntok"),
        length(regexp_replace(col("text"), "[^A-Za-z0-9]", "")).cast("long").as("c_alnum"),
        length(col("text")).cast("long").as("c_len"))
      .filter(col("f_ntok") =!= col("c_ntok") ||
        col("f_alnum") =!= col("c_alnum") || col("f_len") =!= col("c_len"))
      .collect()
    assert(bad.isEmpty, s"fused/composed mismatch on: ${bad.take(5).mkString("; ")}")
  }

  test("text_stats interpreted eval matches codegen path") {
    import spark.implicits._
    val df = Seq("a b\tc", "", " x ").toDF("text")
    val expr = graft.functions.TextStats(
      org.apache.spark.sql.graft.Bridge.expression(col("text")))
    val rows = df.collect().map { r =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0))
      graft.functions.TextStatsImpl.compute(u)
    }
    val viaDf = df.select(TextStatsExpr.textStats(col("text")).as("s"))
      .select("s.ntok", "s.alnum", "s.len").collect()
    rows.zip(viaDf).foreach { case (ir, row) =>
      assert(ir.getLong(0) == row.getLong(0))
      assert(ir.getLong(1) == row.getLong(1))
      assert(ir.getLong(2) == row.getLong(2))
    }
    assert(expr.dataType == graft.functions.TextStatsImpl.Schema)
  }
}
