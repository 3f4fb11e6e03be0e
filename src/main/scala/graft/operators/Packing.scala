package graft.operators

import graft.{QDef, Tables => T}
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Token-aware sequence packing (SURVEY §2.3 L16): greedy next-fit of
  * documents into fixed-token-budget packs — the batch-construction step
  * of an LLM training pipeline (maximize tokens per sequence, preserve
  * document order).
  *
  * Scale design: documents are assigned to fixed doc_id blocks (a
  * deterministic partitioning, unlike sampled range partitioning), each
  * block packs independently via flatMapGroups, and pack ids are
  * (block, local) — embarrassingly parallel, no global sort, no driver
  * state. Block size bounds the per-task memory.
  */
object Packing {

  val TokenBudget = 512
  val BlockSize = 100L
  /** ≥ max packs per block (one per doc) + 1 ⇒ pack ids never collide
    * across blocks, regardless of BlockSize tuning. */
  val PackStride: Long = BlockSize + 1

  final case class PackedDoc(doc_id: Long, tokens: Long, block: Long, pack_id: Long)

  def packDocuments(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    T.documents(s, d)
      .select(col("doc_id"),
        size(Text.words(col("text"))).cast("long").as("tokens"))
      // NULL-safe token count; FLOOR division in integer arithmetic
      // (float division mis-rounds past 2^53; `div` truncates toward
      // zero, which would let a negative-id block span 2*BlockSize docs
      // and overflow the pack-id stride)
      .withColumn("tokens", coalesce(col("tokens"), lit(0L)))
      .withColumn("block", expr(
        s"(doc_id div $BlockSize) - (CASE WHEN doc_id % $BlockSize < 0 THEN 1 ELSE 0 END)"))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroups { (block: Long, docs: Iterator[(Long, Long, Long)]) =>
        // greedy next-fit in doc_id order (only the currently-open pack
        // is considered); oversized docs get their own pack
        val sorted = docs.toSeq.sortBy(_._1)
        var local = 0L
        var used = TokenBudget + 1L // force a new pack for the first doc
        sorted.iterator.map { case (docId, tokens, _) =>
          if (used + tokens > TokenBudget) { local += 1; used = 0L }
          used += tokens
          PackedDoc(docId, tokens, block, block * PackStride + local)
        }
      }
      .toDF()
  }

  /** DuckDB reproduction: the per-block greedy next-fit is sequential,
    * so the oracle walks each block with a recursive CTE carrying the
    * (open-pack, used-tokens) state — one recursion step per document
    * rank inside its block, exactly the Scala loop. */
  private def PackingOracle: String =
    s"""WITH RECURSIVE docs AS (
       |  SELECT doc_id,
       |    coalesce(len(string_split_regex(trim(text),'\\s+')), 0) AS tokens,
       |    (doc_id // $BlockSize) - (CASE WHEN doc_id % $BlockSize < 0 THEN 1 ELSE 0 END) AS block,
       |    row_number() OVER (
       |      PARTITION BY (doc_id // $BlockSize) - (CASE WHEN doc_id % $BlockSize < 0 THEN 1 ELSE 0 END)
       |      ORDER BY doc_id) AS rn
       |  FROM documents),
       |walk(block, rn, doc_id, tokens, lcl, used) AS (
       |  SELECT block, rn, doc_id, tokens, CAST(1 AS BIGINT), tokens
       |  FROM docs WHERE rn = 1
       |  UNION ALL
       |  SELECT d.block, d.rn, d.doc_id, d.tokens,
       |    CASE WHEN w.used + d.tokens > $TokenBudget THEN w.lcl + 1 ELSE w.lcl END,
       |    CASE WHEN w.used + d.tokens > $TokenBudget THEN d.tokens ELSE w.used + d.tokens END
       |  FROM walk w JOIN docs d ON d.block = w.block AND d.rn = w.rn + 1)
       |SELECT block * $PackStride + lcl AS pack_id,
       |  count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS pack_tokens
       |FROM walk GROUP BY 1 ORDER BY pack_id""".stripMargin

  val defs: Seq[QDef] = Seq(
    // L16: greedy packing per fixed doc_id block; the oracle replays the
    // sequential next-fit with a recursive CTE (PackingSpec additionally
    // checks budget/coverage/maximality invariants).
    QDef(
      "q_pack_sequences",
      (s, d) =>
        packDocuments(s, d)
          .groupBy("pack_id")
          .agg(count(lit(1)).as("n_docs"), sum("tokens").as("pack_tokens"))
          .orderBy("pack_id"),
      Some(PackingOracle))
  )
}
