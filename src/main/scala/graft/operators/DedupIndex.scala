package graft.operators

import graft.QDef
import graft.functions.{HashExpr, ShingleExpr, Text}
import graft.sources.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** L68: persisted, incrementally-maintained MinHash/LSH dedup index —
  * the dedup sibling of the L62 ANN index.
  *
  * The per-query MinHash path (L3 `q_dedup_minhash`) re-tokenizes,
  * re-shingles and re-hashes the WHOLE corpus on every run. At 100 TB
  * the signatures are the artifact a pipeline owns: ~4 short band
  * strings per document (a few hundred bytes) against megabytes of
  * text, maintained as documents arrive — never recomputed for the
  * already-indexed 99.9% of the corpus. Here they live as one graft
  * table under the index root:
  *
  *   `<root>/signatures`  PK table `doc_id → b0..b{Bands-1}`
  *
  * [[build]] signs the source's current rows. [[refresh]] reads ONLY
  * the rows appended since the recorded snapshot watermark (the S33
  * `incremental-between` read), signs the delta in one pass and upserts
  * — existing documents are untouched. [[pairs]] generates candidates
  * by band-equality self-join OVER THE PERSISTED SIGNATURES and
  * verifies exact Jaccard against the candidate documents only (the
  * literally shared [[Dedup.verifyJaccard]]).
  *
  * `q_dedup_index` proves index-served pairs ≡ the fresh L3 path
  * against the VERBATIM `q_dedup_minhash` oracle: the signature math
  * (shingle → polyhash → 12 affine min-hashes → band strings) is the
  * same expression tree, so a half-built-then-refreshed index must
  * produce bit-identical band strings — and therefore identical pairs.
  *
  * Ref: the reference connector exposes no dedup surface; this is part
  * of the LLM-pipeline suite (SURVEY §2.3), composed from Paimon-shaped
  * primitives (PK upsert + incremental-between).
  */
object DedupIndex {
  import Dedup.{A, B, Bands, P, RowsPerBand}

  /** Source snapshot id the signatures cover (signatures table option). */
  val SnapshotProp = "dedup.indexed-snapshot"

  private def sigPath(root: String) = s"$root/signatures"

  private val sigSchema = StructType(
    StructField("doc_id", LongType, nullable = false) +:
      (0 until Bands).map(b => StructField(s"b$b", StringType, nullable = true)))

  /** Band signatures of a `(doc_id, text)` frame — the EXACT
    * `minhashPairs` math: one explode+polyhash pass feeds the
    * Bands×RowsPerBand cheap min-aggregates (the HOF formulation would
    * re-inline the interpreted hash fold per signature column), then
    * the band strings concatenate. Shingle-less docs sign nothing. */
  private def signaturesOf(docs: DataFrame): DataFrame = {
    val sh = docs
      .select(col("doc_id"), ShingleExpr.shingles3(Text.words(col("text"))).as("sh"))
      .filter(size(col("sh")) > 0)
    val exh = sh.select(col("doc_id"), explode(col("sh")).as("g"))
      .withColumn("h", HashExpr.polyHash(col("g")))
    val aggs = (0 until Bands * RowsPerBand).map(j =>
      min((col("h") * A(j) + B(j)) % P).as(s"mh$j"))
    val sig = exh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    sig.select(col("doc_id") +: (0 until Bands).map { b =>
      val ms = (0 until RowsPerBand).map(r => col(s"mh${b * RowsPerBand + r}"))
      concat_ws("_", lit(b) +: ms: _*).as(s"b$b")
    }: _*)
  }

  /** Sign the source's CURRENT rows and (re)write the signatures table.
    * Destroys any previous index at `root`. */
  def build(s: SparkSession, source: GraftTable, root: String): Unit = {
    require(source.root != root &&
        !source.root.startsWith(root.stripSuffix("/") + "/"),
      s"index root $root would clobber the source table ${source.root}")
    val snap = source.latestSnapshotId.getOrElse(0L)
    val fs = GraftTable.fileSystem(s, root)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val t = GraftTable.create(s, sigPath(root), sigSchema, primaryKeys = Seq("doc_id"))
    t.upsert(signaturesOf(source.read().select("doc_id", "text")))
    t.setOptions(Map(SnapshotProp -> snap.toString))
  }

  /** Sign ONLY the rows appended to `source` since the last
    * build/refresh and upsert them; the already-indexed corpus is never
    * re-read. Returns the number of newly signed documents (0 = the
    * watermark was already current). */
  def refresh(s: SparkSession, source: GraftTable, root: String): Long = {
    val t = GraftTable.load(s, sigPath(root))
    val from = t.options.get(SnapshotProp).map(_.toLong).getOrElse(0L)
    val latest = source.latestSnapshotId.getOrElse(0L)
    if (latest <= from) return 0L
    val delta = s.read.format("graft")
      .option("incremental-between", s"$from,$latest").load(source.root)
      .select(col("doc_id"), col("text"))
    // persisted so the diagnostic count below reads the cached delta
    // signatures instead of re-running the tokenize/hash pipeline
    val sigs = signaturesOf(delta)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      t.upsert(sigs)
      t.setOptions(Map(SnapshotProp -> latest.toString))
      sigs.count() // O(delta) diagnostic — never the corpus
    } finally sigs.unpersist(blocking = false)
  }

  /** Verified near-dup pairs FROM the persisted index: band-equality
    * self-join over the signature table (4 short strings/doc — the only
    * corpus-wide shuffle is signature-weight), exact-Jaccard
    * verification touches candidate documents only. */
  def pairs(s: SparkSession, source: GraftTable, root: String): DataFrame = {
    val sigs = GraftTable.load(s, sigPath(root)).read()
    // the persisted artifact keeps the rendered band STRINGS (the
    // stable, engine-replayable contract); the self-join key hashes to
    // an 8-byte md5-60bit long — the same r20 discipline as the L3
    // batch path, whose oracle (shared verbatim here) replays the hash
    val bands = sigs.select(col("doc_id"),
      explode(array((0 until Bands).map(b =>
        graft.functions.BitsExpr.md5Bits60(col(s"b$b"))): _*)).as("band"))
    // the same BandCap star rule as the batch path (Dedup.BandCap doc):
    // the oracle is verbatim the L3 oracle, so the crowded-bucket rule
    // must match — and the index path has the same quadratic
    // family-bucket exposure. bandCandidates STAGES the candidate frame
    // under the owner key, so repeated pairs() calls (verify-after-
    // every-refresh in a long-lived session) release the previous
    // invocation's staged blocks instead of leaking them (ADVICE r15)
    val cand = Dedup.bandCandidates(
      s"${s.sparkContext.applicationId}:$root", bands)
    val docs = source.read()
      .select(col("doc_id"), ShingleExpr.shingles3(Text.words(col("text"))).as("sh"))
      .filter(size(col("sh")) > 0)
    Dedup.verifyJaccard(cand, docs)
  }

  val defs: Seq[QDef] = Seq(
    // L68: the oracle is VERBATIM the L3 minhash oracle — a half-built,
    // then incrementally refreshed index must serve identical pairs.
    QDef(
      "q_dedup_index",
      (s, d) => {
        val docs = graft.Tables.documents(s, d).select("doc_id", "text")
        // NOTE: tmpRoot GC removes every dir under its "<prefix>-"
        // namespace, so the two roots need DISJOINT prefixes (a shared
        // "dedupidx" prefix would let the index's tmpRoot call reap the
        // just-created source table)
        val srcRoot = GraftQueries.tmpRoot("dedupsrc")
        val src = GraftTable.create(s, srcRoot,
          StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
        // two appends = a corpus that GREW after the initial build
        src.append(docs.filter(col("doc_id") % 2 === 0))
        val idxRoot = GraftQueries.tmpRoot("dedupidx")
        build(s, src, idxRoot)
        src.append(docs.filter(col("doc_id") % 2 =!= 0))
        refresh(s, src, idxRoot)
        pairs(s, src, idxRoot)
      },
      Some(Dedup.minhashOracle)),
  )
}
