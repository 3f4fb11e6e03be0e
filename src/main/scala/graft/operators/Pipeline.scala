package graft.operators

import graft.{QDef, Tables => T}
import graft.functions.Text
import org.apache.spark.sql.functions._

/** The full training-data curation pipeline as ONE composed,
  * oracle-checked query (SURVEY §2.3 L27): exact dedup → near-dup drop →
  * benchmark exclusion + decontamination → quality gate → per-lang
  * corpus stats. This is the end-to-end shape a user of the engine
  * actually runs before export; the individual stages (L1, L2/L13, L20,
  * L21) are its diagnostics.
  *
  * Composition semantics (and what the oracle replays): the drop SETS
  * are computed against the FULL corpus — the staged near-dup pair table
  * and the contamination report are corpus-level artifacts shared with
  * their diagnostic queries (literally the same persisted pair frame,
  * Dedup.jaccardPairsStaged) — then applied in one pass together with
  * the per-row quality rules. Stage order therefore cannot change the
  * result; only set membership matters.
  *
  * Scale shape: inherits each stage's own audited plan (PPJoin-banded
  * pairs, broadcast bench side, single-pass integer quality rules);
  * the final application is one anti-join pass over the corpus. Every
  * derived quantity is integer arithmetic (containment threshold as
  * hits·2 ≥ bsz, the Jaccard threshold as the same deterministic
  * division both engines compute) — no float-divergence risk.
  */
object Pipeline {

  val defs: Seq[QDef] = Seq(
    QDef(
      "q_pipeline_curate",
      (s, d) => {
        val docs = T.documents(s, d)
        // stage 1: exact dedup — keep the min doc_id per content key.
        // groupBy+min, NOT min().over(Window.partitionBy(k)): k is the
        // duplicate-CLUSTER key, so a boilerplate mega-cluster (10M
        // copies of one page) would pin every copy onto the one task
        // that sorts the window partition. The aggregate form is
        // map-side combinable and AQE-skew-splittable — identical
        // result (the keeper IS the per-key min), the q_dedup_exact
        // shape (Dedup.scala L1).
        val dupKey = md5(concat_ws(" ", slice(Text.words(col("text")), 1, 8)).cast("binary"))
        val keepers = docs.select(col("doc_id"), dupKey.as("k"))
          .groupBy("k").agg(min("doc_id").as("doc_id"))
          .select("doc_id")
        // stage 2: near-dup drop set (the SAME staged pair table the
        // diagnostic queries use)
        val nearDrop = Dedup.jaccardPairsStaged(s, d)
          .select(col("d2").as("doc_id")).distinct()
        // stage 3: benchmark exclusion + decontamination (containment
        // hits·2 ≥ bsz against the bench slice, integers only). Consumes
        // the SAME persisted shingle stage as the dedup/decontamination
        // diagnostics — the tokenize+shingle pass is the expensive text
        // pass and must not be re-executed inside this plan (r8 verdict
        // #2: rebuilding it here ran it ~3× per query).
        val sh = Dedup.docsWithShingles(s, d)
        // The contamination check runs through the SHARED capped+hashed
        // containmentHits stage (r19: the uncapped string-keyed
        // broadcast join spilled >54 GB and died at sf100 — DfCap drops
        // the Zipfian boilerplate shingles that made it quadratic, and
        // the oracle replays the cap verbatim). Train side is the FULL
        // corpus explosion, identical to the oracle's CTE: the former
        // survivor-only restriction (an r16 mega-cluster mitigation the
        // cap subsumes) would give the two engines DIFFERENT df bases
        // for the cap and diverge exactly where it bites.
        val ex = sh.select(col("doc_id"), explode(col("sh")).as("g"))
        val bench = sh.filter(col("doc_id") % 97 === 0)
        val benchSizes = bench.select(col("doc_id").as("bench_id"), size(col("sh")).as("bsz"))
        val benchEx = bench.select(col("doc_id").as("bench_id"), explode(col("sh")).as("g"))
        val contaminated = Dedup.containmentHits(ex, benchEx)
          .join(benchSizes, Seq("bench_id"))
          .filter(col("hits") * 2 >= col("bsz"))
          .select("doc_id").distinct()
        // stage 4: per-row quality rules (L21's exact integer gates)
        val nw = size(Text.words(col("text"))).cast("long")
        val cns = length(regexp_replace(col("text"), "\\s+", "")).cast("long")
        val sym = (length(col("text")) -
          length(regexp_replace(col("text"), "[^A-Za-z0-9 ]", ""))).cast("long")
        val quality = nw >= 10 && nw <= 5000 &&
          cns >= nw * 2 && cns <= nw * 12 &&
          sym * 10 <= length(col("text")).cast("long")
        docs
          .join(keepers, "doc_id")
          .join(nearDrop, Seq("doc_id"), "left_anti")
          .filter(col("doc_id") % 97 =!= 0)
          .join(contaminated, Seq("doc_id"), "left_anti")
          .filter(quality)
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
            sum("n_chars").as("chars"),
            sum(nw).as("ws_tokens"))
          .orderBy("lang")
      },
      Some(s"""WITH w AS (SELECT doc_id, ${Dedup.ShSql} sh FROM documents),
              |e AS (SELECT doc_id, unnest(sh) g FROM w),
              |${Dedup.PrefixCandSql},
              |${Dedup.jrCtesSql("jv")},
              |dropd AS (SELECT DISTINCT d2 FROM jv WHERE jr >= ${Dedup.Tau}),
              |k0 AS (SELECT doc_id,
              |  md5(array_to_string(string_split_regex(trim(text),'\\s+')[1:8],' ')) k
              |  FROM documents),
              |keep AS (SELECT min(doc_id) doc_id FROM k0 GROUP BY k),
              |bw AS (SELECT doc_id bench_id, len(sh) bsz FROM w WHERE doc_id % 97 = 0),
              |be AS (SELECT doc_id bench_id, unnest(sh) g FROM w WHERE doc_id % 97 = 0),
              |${Dedup.containHitsSql("e", "be")},
              |cont AS (SELECT DISTINCT h.doc_id
              |  FROM hitsc h JOIN bw ON h.bench_id = bw.bench_id
              |  WHERE h.hits * 2 >= bw.bsz),
              |m AS (SELECT doc_id,
              |  CAST(len(string_split_regex(trim(text),'\\s+')) AS BIGINT) AS nw,
              |  CAST(length(regexp_replace(text,'\\s+','','g')) AS BIGINT) AS cns,
              |  CAST(length(text) - length(regexp_replace(text,'[^A-Za-z0-9 ]','','g')) AS BIGINT) AS sym,
              |  CAST(length(text) AS BIGINT) AS chars
              |  FROM documents),
              |kept AS (SELECT d.lang, d.n_chars, m.nw
              |  FROM documents d
              |  JOIN keep ON d.doc_id = keep.doc_id
              |  JOIN m ON d.doc_id = m.doc_id
              |  WHERE d.doc_id NOT IN (SELECT d2 FROM dropd)
              |    AND d.doc_id % 97 <> 0
              |    AND d.doc_id NOT IN (SELECT doc_id FROM cont)
              |    AND m.nw >= 10 AND m.nw <= 5000
              |    AND m.cns >= m.nw*2 AND m.cns <= m.nw*12
              |    AND m.sym*10 <= m.chars)
              |SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars,
              |  CAST(sum(nw) AS BIGINT) AS ws_tokens
              |FROM kept GROUP BY lang ORDER BY lang""".stripMargin))
  )
}
