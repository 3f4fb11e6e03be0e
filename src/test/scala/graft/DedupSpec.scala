package graft

import graft.functions.{HashExpr, ShingleExpr, Text}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.3 L2–L4: near-dup operators vs brute-force ground truth at
  * sf0.001. */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, dir)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** brute-force all-pairs 3-gram Jaccard ≥ 0.8 — O(n²), test-only. */
  private lazy val truth: Set[(Long, Long)] = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .select(col("doc_id"), ShingleExpr.shingles3(col("w")).as("sh"))
    val a = docs.select(col("doc_id").as("d1"), col("sh").as("sh1"))
    val b = docs.select(col("doc_id").as("d2"), col("sh").as("sh2"))
    a.crossJoin(b).filter(col("d1") < col("d2"))
      .withColumn("j",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))).cast("double"))
      .filter(col("j") >= 0.8)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("L2: rare-shingle Jaccard finds exactly the ground-truth pairs") {
    assert(pairs("q_dedup_jaccard") == truth)
    assert(truth.nonEmpty) // the corpus has planted near-dups
  }

  test("L3: minhash+LSH candidates verify to a subset with high recall") {
    val mh = pairs("q_dedup_minhash")
    assert(mh.subsetOf(truth)) // verification step guarantees precision 1.0
    assert(mh.size >= (truth.size * 0.85).toInt) // banding recall
  }

  test("L25: connected components — diameter-9 path, disjoint components, chain over-deletion fixed") {
    import spark.implicits._
    // component 1: a 10-node path 0-1-2-...-9 (diameter 9 — forces the
    // propagation loop well past the near-clique 2-3 rounds);
    // component 2: a triangle {100,101,102}; component 3: lone edge {200,201}
    val pairs = ((0L until 9L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L), (200L, 201L))).toDF("d1", "d2")
    val got = graft.operators.Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (0L to 9L).map(i => (i, 0L, 10L)) ++
      Seq((100L, 100L, 3L), (101L, 100L, 3L), (102L, 100L, 3L),
        (200L, 200L, 2L), (201L, 200L, 2L))
    assert(got.toSeq == want)
    // the chain scenario pairwise-apply gets wrong: pairs (0,1),(1,2)
    // drop BOTH 1 and 2 under keep-d1 (over-deletion); cluster
    // resolution keeps exactly one representative per component
    val keepers = got.filter { case (id, cl, _) => id == cl }.map(_._1)
    assert(keepers.toSeq == Seq(0L, 100L, 200L))
  }

  test("L33: repeated-span report — blocks really repeat, ordered, deterministic") {
    val rows = SparkEntry.queries("q_dedup_spans")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 1, "reported block must repeat across docs")
      assert(r.getString(0).split(" ").length <= operators.Dedup2.BlockLen)
    }
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts == counts.sorted.reverse, "not ranked by ndocs")
    // ground truth for the top block: recount its presence with an
    // independent formulation (block set containment over word blocks)
    val top = rows.head.getString(0)
    val n = Tables.documents(spark, dir)
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(0, (size(w)-1) div ${operators.Dedup2.BlockLen})," +
          s" b -> array_join(slice(w, b*${operators.Dedup2.BlockLen}+1, ${operators.Dedup2.BlockLen}), ' '))")).as("blk"))
      .filter(col("blk") === top).select("doc_id").distinct().count()
    assert(n == rows.head.getLong(1), s"top block count $n != reported ${rows.head.getLong(1)}")
    val again = SparkEntry.queries("q_dedup_spans")(spark, dir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("L73: CDC chunks catch offset-shifted copies the fixed grid provably misses") {
    import graft.operators.Dedup2.{BlockLen, CdcD, CdcK}
    import spark.implicits._
    // a 200-word document with word-unique content (no periodicity), and
    // a copy shifted by 3 words — the planted-run shape
    val words = (0 until 200).map(i => s"tok${i * 7919 % 100003}x$i")
    val original = words.mkString(" ")
    val shifted = words.drop(3).mkString(" ")
    val df = Seq((1L, original), (2L, shifted)).toDF("doc_id", "text")
    val chunks = df.select(col("doc_id"),
        explode(ShingleExpr.cdcChunks(Text.words(col("text")), CdcK, CdcD)).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val c1 = chunks.filter(_._1 == 1L).map(_._2).toSet
    val c2 = chunks.filter(_._1 == 2L).map(_._2).toSet
    val shared = c1.intersect(c2)
    // self-synchronization: every interior chunk of the shifted copy
    // (all but its first and last) must also be a chunk of the original
    val interior2 = {
      val seq2 = chunks.filter(_._1 == 2L).map(_._2).toSeq
      seq2.drop(1).dropRight(1).toSet
    }
    assert(shared.nonEmpty, "CDC found no shared chunk on a 197-word verbatim run")
    assert(interior2.subsetOf(c1),
      s"interior chunks not offset-invariant: ${interior2 -- c1}")
    // the fixed 8-word grid shares NO block between the two copies (the
    // 3-word shift misaligns every block of word-unique content)
    def blocks(ws: Seq[String]): Set[String] =
      ws.grouped(BlockLen).map(_.mkString(" ")).toSet
    assert(blocks(words).intersect(blocks(words.drop(3))).isEmpty,
      "grid unexpectedly aligned — the probe corpus lost word-uniqueness")
    // chunk reconstruction: concatenating each doc's chunks restores it
    val rec1 = chunks.filter(_._1 == 1L).map(_._2).mkString(" ")
    assert(rec1 == original, "chunks must partition the document")
  }

  test("L34: incremental dedup — batch partitions exactly, corpus untouched, drop reasons disjoint") {
    val rows = SparkEntry.queries("q_dedup_incremental")(spark, dir).collect()
    assert(rows.nonEmpty)
    // per-lang partition: total = exact + near + kept (disjoint by
    // precedence), and totals match the new-batch slice exactly
    val newCounts = Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 9)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (lang, total, ex, nr, kept) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(total == ex + nr + kept, s"$lang: categories don't partition")
      assert(total == newCounts(lang), s"$lang: total != new-batch size")
    }
    assert(rows.map(_.getLong(1)).sum == newCounts.values.sum)
  }

  test("L4: simhash pairs — sound vs brute force, complete in the under-cap regime, " +
    "identical-sim groups stay star-connected") {
    val got = SparkEntry.queries("q_dedup_simhash")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val simRows = Tables.documents(spark, dir).select(col("doc_id"),
      HashExpr.simHash(transform(Text.words(col("text")), w => HashExpr.tokenHash64(w))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val simOf = simRows.toMap
    val brute = (for {
      (d1, s1) <- simRows; (d2, s2) <- simRows if d1 < d2
      hd = java.lang.Long.bitCount(s1 ^ s2).toLong if hd <= 3
    } yield (d1, d2, hd)).toSet
    // 1) soundness: every reported pair is a true hamming<=3 pair (the
    //    verification gate — star candidates included)
    assert(got.subsetOf(brute), s"false positives: ${got -- brute}")
    // 2) completeness in the UNDER-CAP regime: a pair with at least one
    //    shared chunk bucket of size <= BandCap must be reported (the
    //    pigeonhole witness survives the cap). Crowded buckets trade
    //    the full clique for a linear star — the L3 contract; this
    //    corpus's template families produce real over-cap buckets, so
    //    the regime split is exercised, not vacuous.
    def chunksOf(s: Long): Seq[(Int, Long)] =
      (0 until 4).map(c => c -> ((s >>> (16 * c)) & 0xFFFFL))
    val bucketSize = simRows.flatMap { case (_, s) => chunksOf(s) }
      .groupBy(identity).view.mapValues(_.size).toMap
    val underCap = brute.filter { case (d1, d2, _) =>
      chunksOf(simOf(d1)).toSet.intersect(chunksOf(simOf(d2)).toSet)
        .exists(bucketSize(_) <= operators.Dedup.BandCap)
    }
    assert(underCap.subsetOf(got),
      s"under-cap pairs lost: ${underCap -- got}")
    assert(brute.diff(underCap).nonEmpty,
      "corpus exercises no over-cap bucket — the regime assertion is vacuous")
    // 3) identical-sim groups (hd = 0 cliques, the mega-duplicate shape)
    //    stay CONNECTED through the star edges in the reported graph
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r } }
    got.foreach { case (a, b, _) => parent(find(a)) = find(b) }
    simRows.groupBy(_._2).values.filter(_.size > 1).foreach { grp =>
      val roots = grp.map(g => find(g._1)).distinct
      assert(roots.size == 1,
        s"identical-simhash group ${grp.map(_._1)} split across components")
    }
  }

  test("L35: fuzzy pairs — deletion/insertion/substitution found, transposition excluded, ranked, deterministic") {
    import spark.implicits._
    val vocab = Seq(
      ("hello", 10L), ("helo", 2L),      // deletion/insertion pair
      ("color", 9L), ("colour", 3L),     // insertion pair
      ("gray", 5L), ("grey", 4L),        // substitution pair
      ("abcd", 1L), ("abdc", 1L),        // transposition: distance 2, must NOT match
      ("window", 7L)                     // no neighbor
    ).toDF("w", "n")
    val got = operators.Dedup2.fuzzyWordPairs(vocab)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4)))
    // candidate completeness: all three distance-1 pair kinds surface;
    // the distance-2 transposition (which DOES share a deletion variant)
    // is killed by the levenshtein verify; ordering is (total desc, w1)
    assert(got.toSeq == Seq(
      ("color", "colour", 12L), ("hello", "helo", 12L), ("gray", "grey", 9L)),
      s"got ${got.toSeq}")
    // determinism: a second run returns the identical report
    assert(got.toSeq == operators.Dedup2.fuzzyWordPairs(vocab)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4))).toSeq)
  }

  test("shape pin: no window aggregate partitioned by the Zipfian shingle key") {
    // Shingle document frequency must be a map-combinable groupBy joined
    // back, never count()/min().over(Window.partitionBy("g")) — a window
    // buffers every occurrence of the hottest shingle in ONE task (AQE
    // splits skewed join sides, not window partitions). Any Window left
    // in these plans may only partition by per-doc/per-cluster keys.
    Seq("q_dedup_jaccard", "q_dedup_contain", "q_ngram_novelty").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.optimizedPlan
      val winParts = plan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
          w.partitionSpec.flatMap(_.references.map(_.name))
      }.flatten
      assert(!winParts.contains("g"),
        s"$q has a window partitioned by the shingle key: $winParts")
      assert(winParts.forall(n => n == "doc_id" || n == "cluster_id"),
        s"$q window partition keys: $winParts")
    }
  }

  test("L58: ngram novelty equals the sequential ingest-order replay") {
    // ground truth: walk docs in doc_id order with a running shingle
    // set — a shingle is novel for exactly the first doc carrying it
    // (= the query's min(doc_id) window formulation)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), Text.words(col("text")).as("w"))
      .select(col("doc_id"), col("source"), ShingleExpr.shingles3(col("w")).as("sh"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))
      .sortBy(_._1)
    val seen = scala.collection.mutable.HashSet[String]()
    val agg = scala.collection.mutable.HashMap[String, (Long, Long)]()
    docs.foreach { case (_, src, sh) =>
      if (sh.nonEmpty) {
        val novel = sh.count(g => !seen.contains(g)).toLong
        sh.foreach(seen += _)
        val (n0, t0) = agg.getOrElse(src, (0L, 0L))
        agg(src) = (n0 + novel, t0 + sh.size)
      }
    }
    val got = SparkEntry.queries("q_ngram_novelty")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == agg.toMap, s"got $got want $agg")
    // the corpus's planted near-dups mean novelty is strictly < 1 somewhere
    assert(agg.values.exists { case (n, t) => n < t })
  }
}
