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
    // L67: deterministic training-shard export — the final pipeline
    // step: assign every document to a shard by SEEDED hash (stable
    // under any partitioning, retry, or corpus re-read — an epoch is
    // reproducible bit-for-bit from the corpus alone) and order within
    // the shard by an independent hash (the global shuffle training
    // wants, without a corpus-wide sort: ordering is per-shard). The
    // report per shard: doc/token mass (balance check) + first/last doc
    // under the shuffle order (order determinism pinned end-to-end).
    // The within-shard order key composes (hash, doc_id) injectively:
    // hash < 2^30 (polyhash mod 1e9+7), so hash·2^20 + doc_id is
    // collision-free while doc_id < 2^20 — documents ids are dense from
    // 0, so this holds far past sf1; a production export would widen
    // the key, not the idea. One map pass + one 8-group shuffle.
    QDef(
      "q_train_shards",
      (s, d) =>
        T.documents(s, d)
          .select(
            col("doc_id"),
            size(Text.words(col("text"))).cast("long").as("tok"),
            pmod(graft.functions.HashExpr.polyHash(
              concat(lit("shard:"), col("doc_id").cast("string"))), lit(8L)).as("shard"),
            (graft.functions.HashExpr.polyHash(
              concat(lit("ord:"), col("doc_id").cast("string"))) * 1048576L +
              col("doc_id")).as("ok"))
          .groupBy("shard")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("tok").as("tok_sum"),
            min_by(col("doc_id"), col("ok")).as("first_doc"),
            max_by(col("doc_id"), col("ok")).as("last_doc"))
          .orderBy("shard"),
      Some(s"""WITH t AS (SELECT doc_id,
              |    len(regexp_split_to_array(trim(text),'\\s+')) AS tok,
              |    ${Dedup.polyHashSqlOf("'shard:' || CAST(doc_id AS VARCHAR)")} % 8 AS shard,
              |    ${Dedup.polyHashSqlOf("'ord:' || CAST(doc_id AS VARCHAR)")} * 1048576 + doc_id AS ok
              |  FROM documents)
              |SELECT shard, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS tok_sum,
              |  arg_min(doc_id, ok) AS first_doc, arg_max(doc_id, ok) AS last_doc
              |FROM t GROUP BY shard ORDER BY shard""".stripMargin)),

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
      Some(PackingOracle)),

    // L36: RAG-style document chunking — fixed W-token windows advanced
    // by stride S (W-S tokens of overlap) so retrieval context never
    // splits mid-thought at a hard boundary. Emits the window GEOMETRY
    // (chunk_id, start token, token count) plus an md5 of the rendered
    // chunk text, so the oracle verifies both the arithmetic and the
    // content byte-for-byte. Scale shape: pure codegen per row
    // (split + sequence/explode + slice/array_join — no HOF, no shuffle
    // until the final presentation sort); chunk fan-out per doc is
    // len/S, linear in corpus tokens. Integer/string semantics only.
    // The doc_id % 20 slice bounds the oracle diff; every window class
    // (single-chunk doc, full mid-chunks, short tail) appears in it.
    QDef(
      "q_chunk_docs",
      (s, d) => {
        val W = 32
        val S = 24
        val docs = T.documents(s, d)
          .filter(col("doc_id") % 20 === 0)
          .select(col("doc_id"), Text.words(col("text")).as("w"))
          .withColumn("nw", size(col("w")).cast("long"))
          .withColumn("n_chunks", expr(
            s"CASE WHEN nw <= $W THEN CAST(1 AS BIGINT) " +
              s"ELSE ((nw - $W + ${S - 1}) div $S) + 1 END"))
        docs
          .select(col("doc_id"), col("w"), col("nw"), col("n_chunks"),
            explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
          .withColumn("start_tok", col("chunk_id") * S + 1)
          .withColumn("piece",
            slice(col("w"), (col("chunk_id") * S + 1).cast("int"), lit(W)))
          .select(
            col("doc_id"), col("nw"), col("n_chunks"), col("chunk_id"),
            col("start_tok"),
            size(col("piece")).cast("long").as("n_tok"),
            md5(array_join(col("piece"), " ")).as("chunk_md5"))
          .orderBy("doc_id", "chunk_id")
      },
      Some("""WITH dw AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
             |  FROM documents WHERE doc_id % 20 = 0),
             |d2 AS (
             |  SELECT doc_id, w, len(w) AS nw,
             |    CASE WHEN len(w) <= 32 THEN 1
             |         ELSE ((len(w) - 32 + 23) // 24) + 1 END AS n_chunks
             |  FROM dw),
             |ch AS (
             |  SELECT doc_id, w, nw, n_chunks,
             |    unnest(range(n_chunks)) AS chunk_id
             |  FROM d2)
             |SELECT doc_id, CAST(nw AS BIGINT) AS nw,
             |  CAST(n_chunks AS BIGINT) AS n_chunks,
             |  CAST(chunk_id AS BIGINT) AS chunk_id,
             |  CAST(chunk_id * 24 + 1 AS BIGINT) AS start_tok,
             |  CAST(len(list_slice(w, chunk_id * 24 + 1, chunk_id * 24 + 32)) AS BIGINT) AS n_tok,
             |  md5(array_to_string(list_slice(w, chunk_id * 24 + 1, chunk_id * 24 + 32), ' ')) AS chunk_md5
             |FROM ch ORDER BY doc_id, chunk_id""".stripMargin))
  )
}
