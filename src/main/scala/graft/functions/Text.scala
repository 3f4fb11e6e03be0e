package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks (SURVEY §2.3 L8–L11), written as
  * codegen'd Column expressions (no UDFs) with exact DuckDB-SQL mirrors
  * so the driver oracle can verify them value-for-value.
  */
object Text {

  def words(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct 3-word shingles over an ALREADY-MATERIALIZED words column.
    * Mirrors DuckDB `list_transform(range(1, greatest(len(w)-1,1)),
    * i -> w[i:i+2] joined)`.
    *
    * Take an attribute, not `words(text)` inline: this expression
    * references its input ~5× (size twice + 3 element_at), and inlining
    * would re-run the regex split per reference per shingle — measured
    * 17× slower at sf0.1. Callers project `words(text)` in a separate
    * select; CollapseProject keeps non-cheap multi-referenced aliases in
    * their own projection, so the split runs once per row. */
  def shingles3FromWords(w: Column): Column =
    when(size(w) >= 3,
      array_distinct(transform(sequence(lit(1), size(w) - 2), i =>
        concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))))
      .otherwise(array().cast("array<string>"))

  /** Shingle → 31-poly hash mod 1e9+7, same arithmetic as the oracle's
    * list_reduce. Uses the higher-order aggregate (codegen'd) rather than
    * the native expression so the SQL mirror is line-for-line. */
  def polyHashHof(c: Column): Column =
    aggregate(split(c, ""), lit(0L), (acc, ch) =>
      (acc * 31 + ascii(ch)) % 1000000007L)

  // language-marker regexes (fixed priority zh > de > en > es > fr on ties)
  val LangMarkers: Seq[(String, String)] = Seq(
    "de" -> "\\b(der|die|das|und|ist|nicht|mit)\\b",
    "en" -> "\\b(the|and|of|to|in|is|for)\\b",
    "es" -> "\\b(el|los|las|una|es|en|por)\\b",
    "fr" -> "\\b(le|la|les|et|est|dans|pour)\\b")
  // \x{hhhh} form parses in both Java regex (Spark) and RE2 (DuckDB);
  // RE2 does not understand \uhhhh.
  val ZhPattern = "[\\x{4e00}-\\x{9fff}]"

  private def markerCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Heuristic language guess with deterministic tie-break. */
  def langGuess(text: Column): Column = {
    val zh = markerCount(text, ZhPattern)
    val s = LangMarkers.toMap.view.mapValues(p => markerCount(text, p)).toMap
    when(zh > 0, "zh")
      .when(s("de") >= s("en") && s("de") >= s("es") && s("de") >= s("fr"), "de")
      .when(s("en") >= s("es") && s("en") >= s("fr"), "en")
      .when(s("es") >= s("fr"), "es")
      .otherwise("fr")
  }

  /** DuckDB mirror of [[langGuess]]. */
  def langGuessSql(textCol: String): String = {
    def cnt(p: String) = s"len(regexp_extract_all($textCol, '$p'))"
    val m = LangMarkers.toMap
    s"""CASE WHEN ${cnt(ZhPattern)} > 0 THEN 'zh'
       | WHEN ${cnt(m("de"))} >= ${cnt(m("en"))} AND ${cnt(m("de"))} >= ${cnt(m("es"))} AND ${cnt(m("de"))} >= ${cnt(m("fr"))} THEN 'de'
       | WHEN ${cnt(m("en"))} >= ${cnt(m("es"))} AND ${cnt(m("en"))} >= ${cnt(m("fr"))} THEN 'en'
       | WHEN ${cnt(m("es"))} >= ${cnt(m("fr"))} THEN 'es'
       | ELSE 'fr' END""".stripMargin.replace("\n", " ")
  }

  val PunctPattern = "[.,;:!?]"
  val BpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  /** PII patterns, restricted to the Java-regex ∩ RE2 subset (no
    * backrefs/lookaround) so Spark and the DuckDB oracle match
    * identically. The phone shape is rigid on purpose: greedy-quantifier
    * edge behavior is the one place the two engines could diverge. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+1 \\(555\\) [0-9]{3}-[0-9]{4}"

  /** Quality score in [0,1]: length saturation + stopword ratio +
    * punctuation sanity. */
  def quality(text: Column): Column = {
    val wc = size(words(text)).cast("double")
    val stops = markerCount(text, LangMarkers.toMap.apply("en")).cast("double")
    val punct = markerCount(text, PunctPattern).cast("double")
    val chars = length(text).cast("double")
    // greatest(..,1) guards ANSI division-by-zero on empty text (Spark 4
    // ANSI mode throws on x/0 even for doubles; DuckDB returns NULL)
    round(
      least(wc / 100.0, lit(1.0)) * 0.4 +
        (stops / greatest(wc, lit(1.0))) * 0.3 +
        (lit(1.0) - punct / greatest(chars, lit(1.0))) * 0.3,
      4)
  }

  /** DuckDB mirror of [[quality]]. */
  def qualitySql(t: String): String =
    s"""round(least(CAST(len(regexp_split_to_array(trim($t),'\\s+')) AS DOUBLE)/100.0, 1.0)*0.4
       | + (CAST(len(regexp_extract_all($t, '${LangMarkers.toMap.apply("en")}')) AS DOUBLE)
       |    / greatest(CAST(len(regexp_split_to_array(trim($t),'\\s+')) AS DOUBLE), 1.0))*0.3
       | + (1.0 - CAST(len(regexp_extract_all($t, '$PunctPattern')) AS DOUBLE)
       |    / greatest(CAST(length($t) AS DOUBLE), 1.0))*0.3, 4)""".stripMargin.replace("\n", " ")
}
