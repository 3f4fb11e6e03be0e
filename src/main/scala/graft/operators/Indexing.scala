package graft.operators

import graft.{QDef, Tables => T}
import graft.functions.Text
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index construction over the documents corpus (SURVEY §2.3
  * L24) — the retrieval-side complement of decontamination (L20): term →
  * document frequency + head-of-posting-list, df-banded.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - TWO passes, not one. Pass 1 computes df per term — a map-side-
  *    combinable count of scalar pairs, no lists anywhere. The df band
  *    (floor drops hapax noise; ceiling drops stopwords, defined
  *    corpus-relatively as "in > 90% of documents" with N from parquet
  *    footer metadata — driver-side, zero Spark jobs) filters THAT
  *    result, and only then does pass 2 materialize postings, for
  *    surviving terms only. A one-aggregation plan would build the full
  *    posting array of every stopword before dropping it — unbounded
  *    per-group state, the classic index-build OOM.
  *  - Posting materialization itself is BOUNDED: a row_number window
  *    (sort-based, spillable) keeps the 20 smallest doc_ids per term
  *    before any array exists, so no task ever holds an array longer
  *    than the cap — full postings at scale would be written sharded,
  *    exactly this plan per shard.
  *
  * The oracle replays the band (scalar-subquery ceiling — SF-portable),
  * the ranked head, and the list ordering exactly; integer/string
  * semantics only, so no float-divergence risk anywhere.
  */
object Indexing {

  private val MinDf = 5
  private val HeadLen = 20
  private val Top = 200

  val defs: Seq[QDef] = Seq(
    QDef(
      "q_inverted_index",
      (s, d) => {
        val maxDf = T.metadataRowCount(s, d, "documents") * 9 / 10
        val pairs = T.documents(s, d)
          .select(col("doc_id"), explode(Text.words(col("text"))).as("term"))
          .distinct() // presence, not tf: one (doc, term) pair each
        val kept = pairs.groupBy("term").agg(count(lit(1)).as("df"))
          .filter(col("df") >= MinDf && col("df") <= maxDf)
        val w = Window.partitionBy("term").orderBy("doc_id")
        pairs.join(kept, "term")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= HeadLen)
          .groupBy("term", "df")
          // head rendered as a comma-joined STRING, not array<long>: the
          // driver's oracle harness hashes result cells via pandas, which
          // cannot hash ndarray cells — oracle-checked outputs must be
          // scalar columns only (r8 verdict #1). sort_array is numeric
          // (on longs) and the array<string> cast preserves that order.
          .agg(array_join(sort_array(collect_list("doc_id")).cast("array<string>"), ",")
            .as("postings_head"))
          .orderBy(desc("df"), col("term"))
          .limit(Top)
      },
      Some(s"""WITH pairs AS (SELECT DISTINCT doc_id, term FROM (
              |    SELECT doc_id, unnest(string_split_regex(trim(text),'\\s+')) AS term
              |    FROM documents) t),
              |d AS (SELECT term, count(*) AS df FROM pairs GROUP BY term),
              |k AS (SELECT term, df FROM d
              |      WHERE df >= $MinDf AND df <= (SELECT count(*)*9//10 FROM documents)),
              |r AS (SELECT k.term, k.df, pairs.doc_id,
              |        row_number() OVER (PARTITION BY k.term ORDER BY pairs.doc_id) AS rn
              |      FROM pairs JOIN k USING (term)),
              |p AS (SELECT term, df,
              |        array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY doc_id), ',')
              |          AS postings_head
              |      FROM r WHERE rn <= $HeadLen GROUP BY term, df)
              |SELECT term, df, postings_head FROM p
              |ORDER BY df DESC, term LIMIT $Top""".stripMargin))
  )
}
