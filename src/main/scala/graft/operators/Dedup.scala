package graft.operators

import graft.{QDef, Tables => T}
import graft.functions.{HashExpr, ShingleExpr, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (SURVEY §2.3 L1–L4).
  *
  * Scale design: nothing here is O(n²). Candidate pairs always come from
  * an equality join on a bounded-fan-out key (prefix shingle, minhash
  * band, simhash chunk), so the shuffle is linear in corpus size and the
  * pairwise work is bounded per bucket. The exact-Jaccard candidates use
  * PPJoin-style prefix filtering (Chaudhuri/Xiao et al.): order each
  * doc's shingles by ascending global frequency and emit only the first
  * `sz - ceil(τ·sz) + 1`; any pair with J ≥ τ must collide on a prefix
  * token, so the candidate set is COMPLETE, and prefix tokens are the
  * globally rarest ⇒ bucket fan-out stays small.
  */
object Dedup {

  /** L14 mixture thresholds in basis points of 10000 (en 80%, de/fr 50%,
    * es 25%, zh 10%) — shared by the Spark impl, the oracle, and
    * SamplingSpec. */
  val SampleBps: Seq[(String, Int)] =
    Seq("en" -> 8000, "de" -> 5000, "fr" -> 5000, "es" -> 2500, "zh" -> 1000)
  /** Near-dup threshold on 3-gram Jaccard. */
  val Tau = 0.8

  /** PPJoin document-frequency cap: shingles appearing in more than
    * DfCap documents are dropped from candidate GENERATION (never from
    * verification sets) — prefix filtering only needs RARE shingles,
    * and a shingle with df D creates up to D² candidate pairs through
    * the prefix self-join (stopword-saturated boilerplate shingles are
    * the quadratic hot keys at 100 TB). Chosen ABOVE every df at the
    * driver-oracle SFs (max observed: 25 at sf0.1), so local pair sets
    * are bit-identical with or without the cap — and the DuckDB oracle
    * replays the cap (PrefixCandSql), so parity holds even at scales
    * where it bites. */
  val DfCap = 100L

  // 12 minhash permutations in 4 bands × 3 rows; p = 2^31-1.
  val P = 2147483647L
  val A: Seq[Long] = Seq(1859374103L, 1500450271L, 2038074743L, 1203391511L,
    1527893977L, 1816928051L, 1070777737L, 1315423911L, 1999999943L,
    1732584193L, 1412376911L, 1106459317L)
  val B: Seq[Long] = Seq(105943L, 305927L, 508921L, 710899L, 912839L,
    1114823L, 1316801L, 1518787L, 1720763L, 1922741L, 2124737L, 2326721L)
  val Bands = 4
  val RowsPerBand = 3

  /** LSH band-bucket cap — the banding analogue of [[DfCap]]: a band
    * value shared by more than BandCap docs generates only a linear STAR
    * of candidates (each doc paired with the bucket's min doc_id) instead
    * of the full s(s-1)/2 self-join. A "boilerplate family" of
    * sub-threshold-similar docs (J ≈ 0.2, BELOW Tau) shares band values
    * at rate ~J^RowsPerBand per band — so family buckets grow linearly
    * with family size and uncapped candidates QUADRATICALLY (measured:
    * sf1→sf10 bench ratio 26× at 10× data; at sf10, 91% of all 4.25M
    * candidate pairs came from >16-doc buckets, max bucket 240). True
    * near-dup pairs (J ≥ Tau) collide in buckets of ~2 + chance
    * cohabitants, far below the cap. The star (rather than dropping the
    * bucket outright, the r17 rule) keeps a TRUE mega-duplicate cluster
    * of N > BandCap exact copies connected: all N copies share every band
    * bucket, each pairs with the representative, verification passes
    * (J = 1), and connected-components recovers the full cluster from
    * the N−1 star edges — recall on the largest duplicate families
    * survives at O(s) pairs per bucket (ADVICE r17; asserted by
    * SkewMinhashProbe's mega-corpus recall check). Chosen ABOVE every
    * bucket size at the driver-oracle SFs (max observed: 4 at sf0.1), so
    * local pair sets are bit-identical with or without the cap — and the
    * DuckDB oracle replays the star rule, so parity holds at scales
    * where it bites. */
  val BandCap = 16L

  /** Shared LSH candidate generation under [[BandCap]]: full self-join
    * within small buckets, linear star-to-representative within over-cap
    * buckets. `bands0` must be (doc_id, band); every join keys on `band`,
    * so the bucket-stat aggregate, the semi-join and the self-join all
    * co-partition on one shuffle key. Used by the L3 batch path and the
    * L68 persisted-index path (same oracle fragment: [[bandCandSql]]).
    *
    * The band frame is persisted EAGERLY for the build (the standard
    * multi-branch discipline): FOUR consumers reference it (bucket
    * stats, the semi-join, the self-join pair, the star join), and
    * unpersisted they would each recompute the signature aggregation
    * upstream (measured 1.5× on the sf0.1 bench when the star branch
    * grew the consumer count from 2 to 4). The returned candidate frame
    * is STAGED (persist + count) under `owner` before the bands cache
    * is released, so no consumer ever recomputes the subtree. */
  private[operators] def bandCandidates(owner: String, bands0: DataFrame): DataFrame = {
    val bands = bands0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bands.count()
    try {
      val stats = bands.groupBy("band")
        .agg(count(lit(1)).as("bn"), min(col("doc_id")).as("rep"))
      val keep = bands.join(
        stats.filter(col("bn") <= lit(BandCap)).select("band"),
        Seq("band"), "left_semi")
      val small = keep.as("a")
        .join(keep.as("b"),
          col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      val star = bands.join(
        stats.filter(col("bn") > lit(BandCap)).select("band", "rep"),
        Seq("band"))
        .filter(col("doc_id") > col("rep"))
        .select(col("rep").as("d1"), col("doc_id").as("d2"))
      stageCandTracked(owner, small.union(star).distinct())
    } finally { bands.unpersist(blocking = false); () }
  }

  /** DuckDB mirror of [[bandCandidates]]: expects a CTE `er(doc_id, g)`
    * (one row per doc × band value) and emits `bsz`/`erk`/`cand` CTE
    * text producing `cand(d1, d2)`. */
  private[operators] val bandCandSql: String =
    s"""bsz AS (SELECT g, count(*) bn, min(doc_id) mn FROM er GROUP BY g),
       |erk AS (SELECT er.doc_id, er.g FROM er JOIN bsz USING (g) WHERE bsz.bn <= $BandCap),
       |cand AS (SELECT DISTINCT d1, d2 FROM (
       |  SELECT a.doc_id d1, b.doc_id d2
       |    FROM erk a JOIN erk b ON a.g = b.g AND a.doc_id < b.doc_id
       |  UNION ALL
       |  SELECT bsz.mn d1, er.doc_id d2
       |    FROM er JOIN bsz USING (g)
       |    WHERE bsz.bn > $BandCap AND er.doc_id > bsz.mn))""".stripMargin

  /** DuckDB expr: distinct 3-word shingles of `text`. */
  private[operators] val ShSql =
    """list_distinct(list_transform(
      |  range(1, greatest(len(string_split_regex(trim(text),'\s+'))-1, 1)),
      |  i -> array_to_string(string_split_regex(trim(text),'\s+')[i:i+2],' ')))""".stripMargin

  /** DuckDB mirror of HashExpr.polyHash over an arbitrary SQL string
    * expression — THE single source for the `(a*31 + c) % 1e9+7`
    * char-fold on the oracle side (Dedup L3/L14, Curation L28/L31,
    * KMeansOp seeds all parameterize this; a drifted copy would break
    * parity only for the queries using it). */
  private[operators] def polyHashSqlOf(strExpr: String): String =
    s"""list_reduce(list_cat([CAST(0 AS BIGINT)],
       |  list_transform(string_split($strExpr,''), c -> CAST(ord(c) AS BIGINT))),
       |  (a,c) -> (a*31 + c) % 1000000007)""".stripMargin

  /** DuckDB expr: polynomial hash of a shingle g (mirrors Text.polyHashHof). */
  private val PolySql = polyHashSqlOf("g")

  /** (doc_id, shingles) — the tokenize→shingle stage is the expensive
    * text pass and feeds candidate generation, verification sizes and the
    * minhash signatures, so it is computed once per (session, dir) and
    * persisted. At 100 TB this is the stage a pipeline materializes to a
    * staged table; here the same sharing is an in-memory persist. */
  private val shingleCache = scala.collection.concurrent.TrieMap[String, DataFrame]()
  private[graft] def docsWithShingles(s: SparkSession, d: String): DataFrame =
    shingleCache.getOrElseUpdate(cacheKey(s, d), {
      val df = T.documents(s, d)
        .select(col("doc_id"), Text.words(col("text")).as("w"))
        .select(col("doc_id"), ShingleExpr.shingles3(col("w")).as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // materialize EAGERLY: the cascade references this frame from
      // several branches of ONE action (prefix, verify semi-join, sizes);
      // a lazy persist lets those branches race-compute the shingle pass
      // in parallel before any block lands in the cache (measured ~2× on
      // the cold pair build) — one up-front pass pins it.
      df.count()
      df
    })

  /** The verified Jaccard pair set is a STAGED intermediate: the pair
    * diagnostics (q_dedup_jaccard) and the apply operator (q_dedup_apply)
    * both consume it, so it is computed once per (session, dir) and
    * persisted — the in-memory analogue of materializing the candidate
    * table between pipeline stages at 100 TB scale, where re-running the
    * shingle/candidate/verify cascade per consumer would double the cost. */
  /** Cache key: application id + session identity + dir. Entries live for
    * the JVM (one persisted DF per benchmarked dir — bounded and small);
    * the app-id component keeps a restarted SparkContext from colliding
    * with a dead session's entries. */
  private def cacheKey(s: SparkSession, d: String): String =
    s"${s.sparkContext.applicationId}:${System.identityHashCode(s)}:$d"

  private val pairsCache = scala.collection.concurrent.TrieMap[String, DataFrame]()
  private[operators] def jaccardPairsStaged(s: SparkSession, d: String): DataFrame =
    pairsCache.getOrElseUpdate(cacheKey(s, d),
      jaccardPairs(s, d).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Exact Jaccard on prefix-filtered candidate pairs.
    *
    * Completeness: J(A,B) ≥ τ with |B| ≥ τ|A| implies
    * |A∩B| ≥ ⌈τ·|A|⌉, so if the pair shared no token in A's first
    * `|A| - ⌈τ|A|⌉ + 1` (rarest-first order), the whole intersection
    * would fit in the remaining ⌈τ|A|⌉ - 1 — contradiction. The size
    * filter 4·max ≤ 5·min (τ = 4/5 in exact integer arithmetic) is also
    * necessary for J ≥ τ, so no qualifying pair is dropped.
    */
  private def jaccardPairs(s: SparkSession, d: String): DataFrame = {
    val docs = docsWithShingles(s, d)
    verifyJaccard(stageCandTracked(s"ppjoin:${cacheKey(s, d)}",
      jaccardCandidates(docs)), docs)
  }

  /** The PPJoin candidate stage alone (exposed for scale probes). */
  private[graft] def jaccardCandidates(docs: DataFrame): DataFrame = {
    // Shingle document frequency as a map-side-combinable groupBy joined
    // back on g, NOT count().over(Window.partitionBy("g")): shingle df is
    // Zipfian, and a window puts EVERY occurrence of the hottest shingle
    // into one task's buffer — an unbounded straggler at 100 TB. The
    // groupBy is partial-aggregated before the shuffle and AQE's skew
    // handling splits the join back (it cannot split window partitions).
    // Per-doc size is size(sh) directly (shingles are distinct per doc).
    // Candidate generation keys on the md5-60-bit HASH of the shingle,
    // not the shingle string: the exploded frame (corpus × ~40 shingles)
    // crosses three shuffles (df groupBy, join-back, prefix self-join),
    // and an 8-byte key vs a ~30-byte string cuts that volume ~3× — at
    // sf100 the string formulation exhausted 58 GB of single-box spill.
    // Verification still compares full shingle SETS, and the oracle
    // keys on the identical hash (R67's cross-engine md5 rendering), so
    // parity is by construction; 60-bit space keeps collisions
    // negligible (~10⁻²) up to billions of distinct shingles, unlike
    // the 30-bit polyhash.
    val ex = docs.select(col("doc_id"), size(col("sh")).cast("long").as("sz"),
      explode(col("sh")).as("g"))
      .select(col("doc_id"), col("sz"),
        graft.functions.BitsExpr.md5Bits60(col("g")).as("hg"))
    // PPJoin df-cap: hot shingles never enter the join-back (cuts the
    // skew-join volume) nor the prefix self-join (cuts the D² candidate
    // blowup). See DfCap for why this is lossless at the oracle SFs.
    val dfreq = ex.groupBy("hg").agg(count(lit(1)).as("c"))
      .filter(col("c") <= lit(DfCap))
    val prefix = ex.join(dfreq, "hg")
      .withColumn("rn",
        row_number().over(Window.partitionBy("doc_id").orderBy("c", "hg")))
      .filter(col("rn") <= col("sz") - expr("(sz*4+4) div 5") + 1)
      .select("doc_id", "hg", "sz")
    prefix.as("a")
      .join(prefix.as("b"),
        col("a.hg") === col("b.hg") && col("a.doc_id") < col("b.doc_id") &&
          greatest(col("a.sz"), col("b.sz")) * 4 <= least(col("a.sz"), col("b.sz")) * 5)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }

  /** Materialize a candidate-pair frame before verification: verify
    * references it three times (the id semi-join twice, the
    * intersection join once) inside ONE action, so an unmaterialized
    * subtree re-runs the whole candidate cascade per reference. This is
    * the in-memory analogue of writing the candidate table between
    * pipeline stages at 100 TB (candidates ≪ corpus by construction). */
  private[operators] def stageCand(cand: DataFrame): DataFrame = {
    val c = cand.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    c.count()
    c
  }

  /** [[stageCand]] with per-owner tracking: staging a new frame under an
    * owner key unpersists the owner's PREVIOUS staged frame, so callers
    * that re-stage per invocation (DedupIndex.pairs — a long-lived
    * session verifying after every index refresh) hold at most ONE
    * staged block set per owner instead of accumulating MEMORY_AND_DISK
    * blocks unboundedly (ADVICE r15). Unpersisting the superseded frame
    * is always safe: a straggling consumer recomputes, never misreads. */
  private val stagedByOwner =
    scala.collection.concurrent.TrieMap[String, DataFrame]()
  private[operators] def stageCandTracked(owner: String, cand: DataFrame): DataFrame = {
    val c = stageCand(cand)
    stagedByOwner.put(owner, c).foreach(_.unpersist(blocking = false))
    c
  }

  /** Exact-Jaccard verification as a distributed set-similarity join:
    * |A∩B| is a count over the exploded shingle table restricted to
    * candidate pairs, |A∪B| = |A|+|B|-|A∩B|. No per-pair array
    * materialization — at 100 TB the shuffle is (pairs × avg-set-size)
    * rows of (long,long,string), never whole documents. Same value as
    * the array formulation (the oracle keeps the array form). */
  private[graft] def verifyJaccard(cand: DataFrame, docs: DataFrame): DataFrame = {
    // verification is CANDIDATE-ONLY all the way down: semi-join the
    // corpus to the candidate id set BEFORE exploding — otherwise the
    // whole exploded corpus shuffles into the d1 join just to be
    // filtered there (measured 8.8x of the sf1 pair stage; at 100 TB
    // candidates ≪ corpus is the whole point of candidate generation)
    val ids = cand.select(col("d1").as("doc_id"))
      .union(cand.select(col("d2").as("doc_id"))).distinct()
    val cdocs = docs.join(ids, Seq("doc_id"), "left_semi")
    // Intersection via per-doc HASHED-shingle sets + codegen'd
    // array_intersect, NOT a pair × shingles explode-join: candidates ×
    // ~shingles-per-doc rows (20M × 63 = 1.26 BILLION at sf100) through
    // two sort-joins exhausted 58 GB of single-box spill — the set
    // formulation ships each pair's two ~8B/element arrays exactly once.
    // Both engines intersect the SAME md5-60-bit hashes (set semantics
    // on both — Spark array_intersect and DuckDB list_intersect dedup),
    // so parity is by construction; |union| = sz1 + sz2 − |∩| with the
    // string-distinct sizes, identical arithmetic both sides.
    val hset = cdocs.select(col("doc_id"), size(col("sh")).as("sz"),
        explode(col("sh")).as("g"))
      .select(col("doc_id"), col("sz"),
        graft.functions.BitsExpr.md5Bits60(col("g")).as("hg"))
      .groupBy("doc_id", "sz").agg(collect_list("hg").as("hs"))
    cand
      .join(hset.select(col("doc_id").as("d1"), col("sz").as("sz1"),
        col("hs").as("hs1")), "d1")
      .join(hset.select(col("doc_id").as("d2"), col("sz").as("sz2"),
        col("hs").as("hs2")), "d2")
      .withColumn("inter", size(array_intersect(col("hs1"), col("hs2"))).cast("long"))
      .withColumn("jr",
        col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")))
      .filter(col("jr") >= Tau)
      .select(col("d1"), col("d2"), round(col("jr"), 4).as("jac"))
      .orderBy("d1", "d2")
  }

  /** DuckDB: prefix-filtered candidate CTEs (expects `w` and `e`).
    * Mirrors [[jaccardPairs]] exactly: same rarest-first (c, g) order,
    * same integer-arithmetic prefix length and size filter. */
  private[operators] val PrefixCandSql =
    s"""eh AS (SELECT doc_id,
      |    ('0x' || substr(md5(g), 1, 15))::BIGINT hg FROM e),
      |p0 AS (SELECT doc_id, hg,
      |    count(*) OVER (PARTITION BY hg) c,
      |    count(*) OVER (PARTITION BY doc_id) sz
      |  FROM eh),
      |p AS (SELECT doc_id, hg, sz,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY c, hg) rn
      |  FROM p0 WHERE c <= $DfCap),
      |pr AS (SELECT doc_id, hg, sz FROM p WHERE rn <= sz - ((sz*4+4)//5) + 1),
      |cand AS (SELECT DISTINCT a.doc_id d1, b.doc_id d2
      |  FROM pr a JOIN pr b ON a.hg = b.hg AND a.doc_id < b.doc_id
      |    AND 4*greatest(a.sz, b.sz) <= 5*least(a.sz, b.sz))""".stripMargin

  /** DuckDB: verified-pair CTE pair — splice as `${jrCtesSql("j")}`;
    * expects `cand`(d1,d2) and `w`(doc_id, sh) in scope and defines
    * `whs` (per-doc hashed shingle sets — md5 ONCE per (doc, shingle),
    * never per pair side) plus `<name>`(d1, d2, jr). Intersects the
    * md5-60-bit shingle HASHES and derives |union| as sz1 + sz2 − |∩| —
    * the verbatim mirror of verifyJaccard's hashed-set formulation, so
    * parity holds by construction even in the (2⁻⁶⁰) collision case.
    * THE single source for every oracle that verifies Jaccard pairs. */
  /** Shared containment-hit stage (L20 q_decontaminate, L27
    * q_pipeline_curate): per (train doc, bench doc) pair, the number of
    * distinct shared shingles. Scale discipline, both r19 sf100-sweep
    * findings folded in:
    *  - keys on the md5-60-bit HASH of the shingle (L2's rule — 8-byte
    *    keys through the shuffles, not ~30-byte strings);
    *  - the TRAIN side drops shingles whose train-side df exceeds
    *    [[DfCap]] — a shingle in D train docs and B bench docs emits
    *    D·B join rows, and the Zipfian head made the uncapped join
    *    spill >54 GB and die at sf100 (boilerplate shingles carry no
    *    decontamination signal; the same PPJoin rationale as L2). The
    *    oracle replays the cap ([[containHitsSql]]) so parity holds at
    *    every SF; below-cap SFs are bit-identical to the uncapped form.
    *  - the bench side joins by SHUFFLE, not broadcast: a 1/97 slice of
    *    a 100 TB corpus is not broadcastable.
    *
    * @param trainEx (doc_id, g) exploded train-side shingles (distinct
    *                per doc); also the df base for the cap
    * @param benchEx (bench_id, g) exploded bench-side shingles
    * @return (doc_id, bench_id, hits) with hits >= 1
    */
  private[operators] def containmentHits(trainEx: DataFrame, benchEx: DataFrame): DataFrame = {
    // r19: fused md5→60-bit expression (no hex render / substr / conv
    // parse, thread-local MessageDigest) — same value bit-for-bit
    def h(c: String) = graft.functions.BitsExpr.md5Bits60(col(c))
    val t = trainEx.select(col("doc_id"), h("g").as("hg"))
    val b = benchEx.select(col("bench_id"), h("g").as("hg"))
    val rare = t.groupBy("hg").agg(count(lit(1)).as("c"))
      .filter(col("c") <= lit(DfCap)).select("hg")
    t.join(rare, "hg")
      .join(b, "hg")
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy("doc_id", "bench_id")
      .agg(countDistinct(col("hg")).as("hits"))
  }

  /** DuckDB CTE chain replaying [[containmentHits]] verbatim: expects
    * `$train`(doc_id, g) and `$bench`(bench_id, g) in scope, defines
    * `hitsc`(doc_id, bench_id, hits). */
  private[operators] def containHitsSql(train: String, bench: String): String =
    s"""thc AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT hg FROM $train),
       |bhc AS (SELECT bench_id, ('0x' || substr(md5(g), 1, 15))::BIGINT hg FROM $bench),
       |rarec AS (SELECT hg FROM (SELECT hg, count(*) c FROM thc GROUP BY hg) WHERE c <= $DfCap),
       |tcc AS (SELECT doc_id, hg FROM thc JOIN rarec USING (hg)),
       |hitsc AS (SELECT tcc.doc_id, bhc.bench_id, count(DISTINCT tcc.hg) AS hits
       |  FROM tcc JOIN bhc ON tcc.hg = bhc.hg AND tcc.doc_id <> bhc.bench_id
       |  GROUP BY tcc.doc_id, bhc.bench_id)""".stripMargin

  private[operators] def jrCtesSql(name: String): String =
    s"""whs AS (SELECT doc_id, len(sh) sz,
       |    list_transform(sh, g -> ('0x' || substr(md5(g), 1, 15))::BIGINT) hs
       |  FROM w),
       |$name AS (SELECT d1, d2, CAST(hin AS DOUBLE) / (sz1 + sz2 - hin) jr FROM (
       |  SELECT d1, d2, len(list_intersect(s1.hs, s2.hs)) hin, s1.sz sz1, s2.sz sz2
       |  FROM cand JOIN whs s1 ON d1 = s1.doc_id JOIN whs s2 ON d2 = s2.doc_id))""".stripMargin

  /** DuckDB: exact-Jaccard verification tail (expects `cand` and `w`). */
  private val JaccardVerifySql =
    s"""${jrCtesSql("j")}
       |SELECT d1, d2, round(jr,4) AS jac FROM j WHERE jr >= $Tau
       |ORDER BY d1, d2""".stripMargin

  /** MinHash signatures + LSH banding, then exact-Jaccard verification of
    * band-collision candidates. Deterministic permutations ⇒ the DuckDB
    * oracle reproduces the exact candidate set. */
  private def minhashPairs(s: SparkSession, d: String): DataFrame = {
    val docs = docsWithShingles(s, d).filter(size(col("sh")) > 0)
    // explode + hash each shingle ONCE, then 12 cheap min-aggregates —
    // the HOF formulation would inline the (interpreted) hash fold into
    // every one of the 12 signature columns.
    val exh = docs.select(col("doc_id"), explode(col("sh")).as("g"))
      .withColumn("h", HashExpr.polyHash(col("g")))
    val aggs = (0 until Bands * RowsPerBand).map(j =>
      min((col("h") * A(j) + B(j)) % P).as(s"mh$j"))
    val sig = exh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    // band keys travel as 8-byte md5-60bit longs, not ~30-byte rendered
    // strings: the band frame feeds FOUR co-partitioned shuffles in
    // bandCandidates (stats, semi-join, self-join, star) — the r19
    // q_source_overlap key discipline (guide §2.3), with the DuckDB
    // oracle replaying the identical hash so the candidate set matches
    // by construction (60-bit collisions stay negligible to billions of
    // distinct bands).
    val bandCols = (0 until Bands).map { b =>
      val ms = (0 until RowsPerBand).map(r => col(s"mh${b * RowsPerBand + r}"))
      graft.functions.BitsExpr.md5Bits60(concat_ws("_", lit(b) +: ms: _*))
    }
    val bands = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
    // BandCap star rule: small buckets self-join, crowded buckets emit a
    // linear star to the bucket representative (see the val doc);
    // bandCandidates stages the returned frame under the owner key
    verifyJaccard(bandCandidates(s"minhash:${cacheKey(s, d)}", bands), docs)
  }

  private[operators] def minhashOracle: String = {
    val mhExprs = (0 until Bands * RowsPerBand).map { j =>
      s"list_min(list_transform(H, x -> (x*${A(j)} + ${B(j)}) % $P))"
    }
    val bandExprs = (0 until Bands).map { b =>
      val parts = (0 until RowsPerBand).map(r => s"mh[${b * RowsPerBand + r + 1}]")
      s"'${b}_' || ${parts.mkString(" || '_' || ")}"
    }
    s"""WITH w AS (SELECT doc_id, $ShSql sh FROM documents),
       |h AS (SELECT doc_id, sh, list_transform(sh, g -> $PolySql) H
       |      FROM w WHERE len(sh) > 0),
       |sig AS (SELECT doc_id, sh, [${mhExprs.mkString(", ")}] mh FROM h),
       |er0 AS (SELECT doc_id, unnest([${bandExprs.mkString(", ")}]) g0 FROM sig),
       |er AS (SELECT doc_id, ('0x' || substr(md5(g0), 1, 15))::BIGINT AS g FROM er0),
       |$bandCandSql,
       |$JaccardVerifySql""".stripMargin
  }

  /** SimHash near-dup: 64-bit simhash of token hashes, candidates via
    * 16-bit chunk collision, verified by exact hamming. With 4 chunks,
    * pigeonhole guarantees a shared-chunk witness for hamming ≤ 3 (4+
    * differing bits could touch every chunk), so the radius is 3.
    * Completeness holds whenever SOME witness bucket is ≤ [[BandCap]];
    * over-cap buckets emit the linear star instead of the quadratic
    * clique (r18 — the uncapped self-join measured 101× at sf10→sf100's
    * 10× data), so mega-duplicate groups stay CONNECTED (hd(rep, m) = 0
    * verifies) while crowded-bucket pair lists are no longer exhaustive
    * — the L3 contract, pinned by DedupSpec L4's three-way assertion. */
  private def simhashPairs(s: SparkSession, d: String): DataFrame = {
    val MaxHam = 3
    val docs = T.documents(s, d).select(col("doc_id"),
      HashExpr.simHashWords(Text.words(col("text"))).as("sim"))
    // chunk buckets are LSH band buckets in every way that matters, so
    // candidate generation reuses bandCandidates — including the
    // BandCap star rule: chunk buckets grow linearly with corpus size
    // (5M docs × 4 chunks over 4×65536 values = ~76 docs/bucket at
    // sf100) and the uncapped self-join is QUADRATIC in bucket size
    // (measured: the sf10→sf100 bench ratio was 101× at 10× data —
    // n²/chunk-space). The star keeps true identical-simhash families
    // connected (hamming(rep, member) = 0 passes verification); chance
    // 16-bit cohabitants of crowded buckets fail the hamming gate
    // exactly as their self-join pairs would have. Candidate IDs only —
    // sims re-attach in the verification joins (candidates ≪ corpus).
    val chunks = docs.select(col("doc_id"),
      explode(array((0 until 4).map(c =>
        concat_ws("_", lit(c), shiftright(col("sim"), 16 * c).bitwiseAND(0xFFFFL))): _*))
        .as("band"))
    val cand = bandCandidates(s"simhash:${cacheKey(s, d)}", chunks)
    cand
      .join(docs.select(col("doc_id").as("d1"), col("sim").as("s1")), Seq("d1"))
      .join(docs.select(col("doc_id").as("d2"), col("sim").as("s2")), Seq("d2"))
      .select(col("d1"), col("d2"),
        bit_count(col("s1").bitwiseXOR(col("s2"))).cast("long").as("hd"))
      .filter(col("hd") <= MaxHam)
      .orderBy("d1", "d2")
  }

  /** DuckDB reproduction of the SimHash pipeline (see the L4 QDef). */
  private def SimhashOracle: String = {
    val two64 = "18446744073709551616"
    // 2^b weights for bit assembly, 2^(16c) divisors for chunk extraction
    val weights = (0 until 64).map(b => s"($b, ${BigInt(1) << b})").mkString(", ")
    val chunkDiv = (0 until 4).map(c => s"($c, ${BigInt(1) << (16 * c)})").mkString(", ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text),'\\s+')) AS w FROM documents),
       |th AS (SELECT doc_id,
       |  list_reduce(list_cat([CAST(0 AS HUGEINT)],
       |    list_transform(string_split(w,''), c -> CAST(ord(c) AS HUGEINT))),
       |    (a,c) -> (a * 1099511628211 + c) % $two64) AS h
       |  FROM tok),
       |pw(b, w) AS (VALUES $weights),
       |bits AS (SELECT th.doc_id, pw.b, pw.w,
       |    sum(CASE WHEN (th.h // pw.w) % 2 = 1 THEN 1 ELSE -1 END) AS cnt
       |  FROM th CROSS JOIN pw GROUP BY th.doc_id, pw.b, pw.w),
       |sim AS (SELECT doc_id,
       |    CAST(sum(CASE WHEN cnt >= 0 THEN w ELSE CAST(0 AS HUGEINT) END) AS HUGEINT) AS s
       |  FROM bits GROUP BY doc_id),
       |cd(c, dv) AS (VALUES $chunkDiv),
       |er AS (SELECT doc_id,
       |    CAST(cd.c AS VARCHAR) || '_' || CAST((s // cd.dv) % 65536 AS VARCHAR) AS g
       |  FROM sim CROSS JOIN cd),
       |$bandCandSql,
       |sh AS (SELECT d1, d2,
       |    CAST(bit_count(xor(
       |      CAST(CASE WHEN a.s >= $two64/2 THEN a.s - $two64 ELSE a.s END AS BIGINT),
       |      CAST(CASE WHEN b.s >= $two64/2 THEN b.s - $two64 ELSE b.s END AS BIGINT))) AS BIGINT) hd
       |  FROM cand JOIN sim a ON a.doc_id = cand.d1 JOIN sim b ON b.doc_id = cand.d2)
       |SELECT d1, d2, hd FROM sh WHERE hd <= 3 ORDER BY d1, d2""".stripMargin
  }

  /** Connected components over an undirected pair graph by min-label
    * propagation: each round every node takes the min label among itself
    * and its neighbors — one equality-join shuffle per round, converging
    * in O(component diameter) rounds (near-dup clusters are
    * near-cliques: 2-3; DedupSpec exercises a diameter-9 path). Per-round
    * driver work is one scalar convergence count, never data.
    *
    * Each round's label frame is cut over via `localCheckpoint` — NOT
    * plain persist: persist caches the data but leaves the logical plan
    * growing by one join+aggregate per round, so Catalyst
    * analysis/optimization cost compounds per iteration (measured: a
    * diameter-9 path hung the 20-round loop for minutes on 16 rows).
    * localCheckpoint truncates the lineage to the materialized blocks —
    * the standard iterative-algorithm discipline; the result is
    * materialized to EXECUTOR-SIDE scratch parquet (tmpRoot) so the
    * checkpoint blocks can be freed before returning. It is NEVER
    * collected: the result is pair-graph-NODE-sized — at a web corpus'
    * typical 25-40% duplication rate that is O(corpus) rows, a driver
    * OOM at 100 TB (r18 verdict). The scratch write is one distributed
    * action; the returned frame re-reads the parquet lazily.
    * Freeing goes through the UNDERLYING RDDs (Bridge.checkpointRdd):
    * Dataset.unpersist routes through the CacheManager, which does not
    * track localCheckpoint blocks, so a Dataset-level unpersist here
    * would be a silent no-op and long sessions would accumulate
    * MEMORY_AND_DISK blocks until the ContextCleaner GC'd the RDDs.
    *
    * @param pairs two numeric columns (a, b), one row per undirected edge
    * @return (doc_id, cluster_id = min id in component, csize) for every
    *         node appearing in `pairs`, ordered by doc_id
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 50): DataFrame = {
    val s = pairs.sparkSession
    // free a localCheckpoint'd frame's blocks NOW (the frame must no
    // longer be needed: the checkpoint is its only copy)
    def free(df: DataFrame): Unit =
      org.apache.spark.sql.graft.Bridge.checkpointRdd(df)
        .foreach(_.unpersist(blocking = false))
    val Seq(c1, c2) = pairs.columns.toSeq.take(2).map(col)
    val edges = pairs.select(c1.as("src"), c2.as("dst"))
      .union(pairs.select(c2.as("src"), c1.as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxRounds) {
      val nbr = edges.join(labels.select(col("id").as("dst"), col("label")), "dst")
        .select(col("src").as("id"), col("label"))
      val next = nbr.union(labels.select(col("id"), col("label")))
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint(true)
      val changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.label") =!= col("o.label")).count()
      free(labels)
      labels = next
      converged = changed == 0
      iter += 1
    }
    // a silent non-converged exit would return plausible-looking but
    // WRONG labels (one true component reported as several) — fail loud
    require(converged,
      s"connectedComponents did not converge in $maxRounds rounds — " +
        "component diameter exceeds the cap; raise maxRounds")
    // cluster sizes via groupBy + join-back, NOT a window partitioned by
    // the cluster label: a window sorts every row of a key inside one
    // task, the exact hot-key shape PlanAuditSpec bans — a mega-cluster
    // (DfCap keeps them out of the pair graph today, but this code must
    // not depend on that) would serialize on a single task
    val sizes = labels.groupBy(col("label"))
      .agg(count(lit(1)).cast("long").as("csize"))
    val out = labels.join(sizes, "label")
      .select(col("id").as("doc_id"), col("label").as("cluster_id"), col("csize"))
    // materialize to executor-side scratch so the checkpoint blocks can
    // be released before returning — NOT a collect: the result is
    // pair-graph-node-sized, O(corpus) at real duplication rates, and a
    // driver collect here is the textbook 100 TB scale-killer. The
    // parquet write is fully distributed; callers wanting an ordering
    // apply their own orderBy (re-sorting a re-read frame is free until
    // an action runs).
    val scratch = GraftQueries.tmpRoot("ccout")
    out.write.mode("overwrite").parquet(scratch)
    free(edges)
    free(labels)
    s.read.parquet(scratch).orderBy("doc_id")
  }

  val defs: Seq[QDef] = Seq(
    // L1: exact dedup by normalized-prefix hash, keep-first.
    QDef(
      "q_dedup_exact",
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"),
            md5(concat_ws(" ", slice(Text.words(col("text")), 1, 8)).cast("binary")).as("k"))
          .groupBy("k")
          .agg(count(lit(1)).as("dups"), min("doc_id").as("keeper"))
          .filter(col("dups") > 1)
          .orderBy("k"),
      Some("""SELECT k, count(*) AS dups, min(doc_id) AS keeper
             |FROM (SELECT doc_id,
             |        md5(array_to_string(string_split_regex(trim(text),'\s+')[1:8],' ')) k
             |      FROM documents) t
             |GROUP BY k HAVING count(*) > 1 ORDER BY k""".stripMargin)),

    // L2: n-gram Jaccard near-dup on prefix-filtered candidates.
    QDef(
      "q_dedup_jaccard",
      jaccardPairsStaged,
      Some(s"""WITH w AS (SELECT doc_id, $ShSql sh FROM documents),
              |e AS (SELECT doc_id, unnest(sh) g FROM w),
              |$PrefixCandSql,
              |$JaccardVerifySql""".stripMargin)),

    // L3: MinHash + LSH banding, oracle reproduces the permutations.
    QDef("q_dedup_minhash", minhashPairs, Some(minhashOracle)),

    // L4: SimHash hamming near-dup. DedupSpec cross-checks vs brute-force
    // hamming; the oracle reproduces the whole pipeline — wrapping 64-bit
    // token fold (HUGEINT mod 2^64), per-bit majority vote (ties set the
    // bit, as SimHash64Impl), 16-bit chunk candidates, exact hamming.
    QDef("q_dedup_simhash", simhashPairs, Some(SimhashOracle)),

    // L13: APPLY the dedup — materialize the cleaned corpus (keep the
    // smallest doc_id of every near-dup pair, anti-join the rest away).
    // This is the operator a training-data pipeline actually runs; the
    // pair queries above are its diagnostics.
    QDef(
      "q_dedup_apply",
      (s, d) => {
        val drop = jaccardPairsStaged(s, d).select(col("d2").as("doc_id")).distinct()
        T.documents(s, d)
          .join(drop, Seq("doc_id"), "left_anti")
          .groupBy("lang")
          .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
          .orderBy("lang")
      },
      Some(s"""WITH w AS (SELECT doc_id, $ShSql sh FROM documents),
              |e AS (SELECT doc_id, unnest(sh) g FROM w),
              |$PrefixCandSql,
              |${jrCtesSql("j")},
              |dropd AS (SELECT DISTINCT d2 FROM j WHERE jr >= $Tau)
              |SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
              |FROM documents WHERE doc_id NOT IN (SELECT d2 FROM dropd)
              |GROUP BY lang ORDER BY lang""".stripMargin)),

    // L20: benchmark decontamination — flag training docs whose shingle
    // set CONTAINS a benchmark document (containment = fraction of the
    // benchmark doc's distinct shingles found in the train doc ≥ 0.5),
    // the standard eval-set leak check a training pipeline runs before
    // export. The benchmark side (here the deterministic doc_id % 97
    // slice; in production the eval sets) is orders of magnitude smaller
    // than the corpus, so its exploded shingles BROADCAST and the corpus
    // side stays one linear pass over the shared persisted shingle
    // stage — no shuffle of the 100 TB side, no all-pairs product.
    QDef(
      "q_decontaminate",
      (s, d) => {
        val docs = docsWithShingles(s, d)
        val ex = docs.select(col("doc_id"), explode(col("sh")).as("g"))
        val bench = docs.filter(col("doc_id") % 97 === 0)
        val benchSizes = bench.select(col("doc_id").as("bench_id"), size(col("sh")).as("bsz"))
        val benchEx = bench.select(col("doc_id").as("bench_id"), explode(col("sh")).as("g"))
        // capped + hashed containment stage (containmentHits) — the
        // uncapped string-keyed broadcast join spilled >54 GB and died
        // at sf100 (r19 full-set sweep); bsz stays the FULL shingle-set
        // size, so containment is the capped-hit fraction of the doc
        containmentHits(ex, benchEx)
          .join(benchSizes, Seq("bench_id"))
          .withColumn("containment", col("hits").cast("double") / col("bsz"))
          // leak report: the top-20 most-contaminated (train, bench)
          // pairs — a pipeline drops everything above its threshold;
          // the ranked head is the always-non-empty diagnostic
          .select(col("doc_id"), col("bench_id"), round(col("containment"), 4).as("containment"))
          .orderBy(desc("containment"), col("doc_id"), col("bench_id"))
          .limit(20)
      },
      Some(s"""WITH w AS (SELECT doc_id, $ShSql sh FROM documents),
              |e AS (SELECT doc_id, unnest(sh) g FROM w),
              |bw AS (SELECT doc_id bench_id, len(sh) bsz FROM w WHERE doc_id % 97 = 0),
              |be AS (SELECT doc_id bench_id, unnest(sh) g FROM w WHERE doc_id % 97 = 0),
              |${containHitsSql("e", "be")},
              |c AS (SELECT h.doc_id, h.bench_id,
              |    CAST(h.hits AS DOUBLE) / bw.bsz AS containment
              |  FROM hitsc h JOIN bw ON h.bench_id = bw.bench_id)
              |SELECT doc_id, bench_id, round(containment, 4) AS containment
              |FROM c ORDER BY 3 DESC, doc_id, bench_id LIMIT 20""".stripMargin)),

    // L72: exact n-gram decontamination WASH (the GPT-3/PaLM appendix
    // rule, distinct from L20's containment FRACTION): drop every train
    // doc sharing ANY 13-gram with an eval doc — the conservative wash
    // labs run before training, where a single long verbatim overlap is
    // disqualifying regardless of the doc's size. Native ShinglesN
    // windowing (one codegen pass); the eval side (%97 slice standing
    // in for the eval sets) is orders smaller than the corpus, so its
    // distinct gram set BROADCASTS and the train side is one linear
    // pass — no shuffle of the 100 TB side. Exact string equality;
    // per-lang washed-doc and hit-gram counts (sparse by design on this
    // corpus: only true near-dup pairs share 13-word runs).
    QDef(
      "q_decontaminate_13g",
      (s, d) => {
        val N = 13
        val docs = T.documents(s, d).select(col("doc_id"), col("lang"),
          ShingleExpr.shinglesN(Text.words(col("text")), N).as("gs"))
        val bench = docs.filter(col("doc_id") % 97 === 0)
          .select(explode(col("gs")).as("g")).distinct()
        val train = docs.filter(col("doc_id") % 97 =!= 0)
        val hits = train.select(col("doc_id"), col("lang"), explode(col("gs")).as("g"))
          .join(broadcast(bench), "g")
          .groupBy("lang")
          .agg(countDistinct("doc_id").as("washed"),
            countDistinct("g").as("hit_grams"))
        train.groupBy("lang").agg(count(lit(1)).as("train_docs"))
          .join(hits, Seq("lang"), "left")
          .select(col("lang"), col("train_docs"),
            coalesce(col("washed"), lit(0L)).as("washed"),
            coalesce(col("hit_grams"), lit(0L)).as("hit_grams"))
          .orderBy("lang")
      },
      Some("""WITH w AS (SELECT doc_id, lang,
             |    string_split_regex(trim(text),'\s+') AS t FROM documents),
             |g AS (SELECT doc_id, lang, unnest(list_distinct(list_transform(
             |    range(1, greatest(len(t)-11, 1)),
             |    i -> array_to_string(t[i:i+12], ' ')))) AS g
             |  FROM w WHERE len(t) >= 13),
             |bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
             |train AS (SELECT doc_id, lang, g FROM g WHERE doc_id % 97 <> 0),
             |hits AS (SELECT t.lang,
             |    CAST(count(DISTINCT t.doc_id) AS BIGINT) AS washed,
             |    CAST(count(DISTINCT t.g) AS BIGINT) AS hit_grams
             |  FROM train t JOIN bench b ON t.g = b.g GROUP BY t.lang)
             |SELECT d.lang, count(*) AS train_docs,
             |  coalesce(any_value(h.washed), 0) AS washed,
             |  coalesce(any_value(h.hit_grams), 0) AS hit_grams
             |FROM documents d LEFT JOIN hits h ON d.lang = h.lang
             |WHERE d.doc_id % 97 <> 0
             |GROUP BY d.lang ORDER BY d.lang""".stripMargin)),

    // L25: duplicate-CLUSTER resolution — connected components over the
    // verified near-dup pair graph. Pairwise dedup (L13) keeps d1 of
    // every pair independently, which over-deletes on chains (a~b, b~c:
    // b and c both drop though b was c's only witness); cluster
    // resolution groups transitively-connected docs and keeps ONE
    // representative (the min doc_id) per component. The oracle replays
    // the closure with a recursive CTE: min reachable id ≡ min
    // component label.
    QDef(
      "q_dedup_clusters",
      (s, d) => connectedComponents(jaccardPairsStaged(s, d).select("d1", "d2")),
      Some(s"""WITH RECURSIVE w AS MATERIALIZED (SELECT doc_id, $ShSql sh FROM documents),
              |e AS (SELECT doc_id, unnest(sh) g FROM w),
              |$PrefixCandSql,
              |${jrCtesSql("jv")},
              |pp AS MATERIALIZED (SELECT d1, d2 FROM jv WHERE jr >= $Tau),
              |nodes AS MATERIALIZED (SELECT d1 AS id FROM pp UNION SELECT d2 FROM pp),
              |ed AS MATERIALIZED (SELECT d1 a, d2 b FROM pp UNION ALL SELECT d2 a, d1 b FROM pp),
              |reach(id, r) AS (
              |  SELECT id, id FROM nodes
              |  UNION
              |  SELECT e2.b, reach.r FROM reach JOIN ed e2 ON e2.a = reach.id),
              |cc AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)
              |SELECT doc_id, cluster_id,
              |  count(*) OVER (PARTITION BY cluster_id) AS csize
              |FROM cc ORDER BY doc_id""".stripMargin)),

    // L14: stratified sampling for data-mixture construction.
    // Deterministic hash-threshold draw (keep iff
    // poly_hash64(doc_id ':' lang) mod 10000 < per-stratum threshold)
    // instead of an RNG sampleBy: the sample is a pure function of the
    // data — stable across runs, partitionings, and task retries, which
    // is what a 100 TB pipeline needs for reproducible mixtures — and
    // exactly replayable by the DuckDB oracle.
    QDef(
      "q_sample_mixture",
      (s, d) => {
        val bps = SampleBps // lang -> threshold in basis points of 10000
        val h = pmod(
          graft.functions.HashExpr.polyHash(
            concat(col("doc_id").cast("string"), lit(":"), col("lang"))),
          lit(10000L))
        val thr = bps.foldLeft(lit(0L)) { case (acc, (l, t)) =>
          when(col("lang") === l, lit(t.toLong)).otherwise(acc)
        }
        T.documents(s, d).filter(h < thr)
          .groupBy("lang").agg(count(lit(1)).as("n"))
          .orderBy("lang")
      },
      Some(s"""WITH h AS (SELECT lang,
              |  ${polyHashSqlOf("CAST(doc_id AS VARCHAR) || ':' || lang")} % 10000 AS hv,
              |  CASE lang ${SampleBps.map { case (l, t) => s"WHEN '$l' THEN $t" }.mkString(" ")}
              |    ELSE 0 END AS thr
              |  FROM documents)
              |SELECT lang, count(*) AS n FROM h WHERE hv < thr
              |GROUP BY lang ORDER BY lang""".stripMargin))
  )
}
