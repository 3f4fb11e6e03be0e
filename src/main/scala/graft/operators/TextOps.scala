package graft.operators

import graft.{QDef, Tables => T}
import graft.functions.{HashExpr, Text}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` (SURVEY §2.3 L8–L11).
  * All are single-pass scans with map-side partial aggregation — linear
  * at 100 TB, no shuffle beyond the final small groupBy.
  */
object TextOps {

  val defs: Seq[QDef] = Seq(
    // L10: token counting — whitespace words + BPE-ish regex tokens.
    QDef(
      "q_text_tokens",
      (s, d) =>
        T.documents(s, d)
          .select(
            col("lang"),
            size(Text.words(col("text"))).cast("long").as("ws"),
            size(regexp_extract_all(col("text"), lit(Text.BpeishPattern), lit(0)))
              .cast("long").as("re"))
          .groupBy("lang")
          .agg(
            sum("ws").as("ws_tokens"),
            sum("re").as("re_tokens"),
            count(lit(1)).as("n_docs"))
          .orderBy("lang"),
      Some(s"""SELECT lang,
              |  CAST(sum(len(regexp_split_to_array(trim(text),'\\s+'))) AS BIGINT) AS ws_tokens,
              |  CAST(sum(len(regexp_extract_all(text, '${Text.BpeishPattern}'))) AS BIGINT) AS re_tokens,
              |  count(*) AS n_docs
              |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // L8: language ID — confusion matrix of heuristic vs labeled lang.
    QDef(
      "q_text_langid",
      (s, d) =>
        T.documents(s, d)
          .select(col("lang"), Text.langGuess(col("text")).as("guess"))
          .groupBy("lang", "guess")
          .agg(count(lit(1)).as("n"))
          .orderBy("lang", "guess"),
      Some(s"""SELECT lang, ${Text.langGuessSql("text")} AS guess, count(*) AS n
              |FROM documents GROUP BY lang, guess ORDER BY lang, guess""".stripMargin)),

    // L9: quality scoring per source.
    QDef(
      "q_text_quality",
      (s, d) =>
        T.documents(s, d)
          .select(col("source"), Text.quality(col("text")).as("q"))
          .groupBy("source")
          .agg(
            round(avg("q"), 3).as("avg_q"),
            round(min("q"), 4).as("min_q"),
            round(max("q"), 4).as("max_q"),
            count(lit(1)).as("n"))
          .orderBy("source"),
      Some(s"""SELECT source,
              |  round(avg(q),3) AS avg_q, round(min(q),4) AS min_q,
              |  round(max(q),4) AS max_q, count(*) AS n
              |FROM (SELECT source, ${Text.qualitySql("text")} AS q FROM documents) t
              |GROUP BY source ORDER BY source""".stripMargin)),

    // L11: document fingerprint via the native rolling-hash expression
    // (PolyHash64, whole-stage codegen); oracle mirrors the polynomial
    // with list_reduce over ord(char).
    QDef(
      "q_text_fingerprint",
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"), HashExpr.polyHash(col("text")).as("fp"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  list_reduce(list_cat([CAST(0 AS BIGINT)],
             |    list_transform(string_split(text,''), c -> CAST(ord(c) AS BIGINT))),
             |    (a, c) -> (a*31 + c) % 1000000007) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
