package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sweeping plan-quality audit: no query in the inventory may plan an
  * (unbroadcast) cartesian product — the one join shape that cannot
  * survive a 100 TB scale-up. BroadcastNestedLoopJoin is allowed where a
  * bounded side is broadcast by construction (ANN probe sets). */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Queries whose BroadcastNestedLoopJoin is bounded by construction:
    * q_ann_brute and q_ann_quantized broadcast a ≤20-vector probe set;
    * q_ann_ivf and q_ann_ivf_trained broadcast their K=8 centroids for
    * coarse assignment. Everything else must not plan a BNLJ at all —
    * an unbounded one is a full-corpus broadcast that OOMs before the
    * n² compute matters. */
  private val boundedBnlj =
    Set("q_ann_brute", "q_ann_quantized", "q_ann_ivf", "q_ann_ivf_trained",
      "q_dedup_semantic",
      // recall report composes q_ann_brute — same ≤20-probe broadcast
      "q_ann_recall",
      // > ALL decorrelation crossJoins a broadcast 1-ROW (max,count)
      // aggregate — the most bounded build side possible (an equi-join
      // on lit keys constant-folds back to the same BNLJ)
      "q_any_all",
      // RRF fusion broadcasts a 1-vector probe (same shape as ann_brute)
      "q_hybrid_rank",
      // persisted-index probe broadcasts the K=8 centroid table for
      // probe routing — the q_ann_ivf_trained shape served from tables
      "q_ann_index",
      // hard negatives: K=8 centroid broadcast for cell assignment +
      // a ≤20-probe broadcast for the cross-cell ranking (annBrute's)
      "q_hard_negatives")

  test("no CartesianProduct and no unbounded BroadcastNestedLoopJoin in any plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan =
        try fn(spark, dir).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLAN_FAILED: $e" }
      if (plan.contains("CartesianProduct")) Some(s"$name (cartesian)")
      else if (plan.contains("BroadcastNestedLoopJoin") && !boundedBnlj(name))
        Some(s"$name (unbounded BNLJ)")
      else if (plan.startsWith("PLAN_FAILED")) Some(s"$name ($plan)")
      else None
    }
    assert(offenders.isEmpty, s"bad plans: $offenders")
  }

  test("duplicate-cluster selection plans no window over the cluster key") {
    // L70/L60 pin: per-cluster selection over the duplicate-cluster key
    // must be a map-combinable groupBy (+ AQE-skew-splittable join-back),
    // never a window — a 10M-copy boilerplate cluster would put every
    // copy through ONE window task (AQE cannot split window partitions).
    for (name <- Seq("q_dedup_downsample", "q_dedup_canonical")) {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$name plans a window over the duplicate-cluster key:\n$plan")
    }
  }

  /** Window partition keys that are CORPUS-cardinality (documents /
    * shingles / terms / vectors / duplicate-cluster keys): a window over
    * one of these sorts every row of a key inside ONE task — the hot-key
    * wall the CLAUDE.md per-key-window rule exists for (found in r13, r14
    * AND r15; this guard makes the class mechanically impossible).
    * Bounded-frame windows (calendar series, per-query top-k over
    * broadcast probes, ≤ langs×1001 band walks) key on other names. */
  private val corpusKeyNames = Set(
    "doc_id", "d1", "d2", "k", "term", "g", "w", "vec_id", "cluster_id",
    "bench_id", "chunk_id", "sig", "band", "content", "fp",
    // r19: the ANN probe alias — q_embed_nn's nearest-candidate window
    // keyed on q_id was corpus-cardinality (every vector is a query
    // there) and slipped this list; it is now an argmax aggregate, and
    // the bounded ≤20-probe re-ranks are MinNRows aggregates, so no
    // declared query windows over q_id at all
    "q_id",
    // post-alias cluster labels: Catalyst's project collapse resolves a
    // window partitioned by an ALIAS of the propagation label back to the
    // underlying attribute, so the guard must know the pre-alias names
    // too (the r16-verdict csize shape: partitionBy("cluster_id") printed
    // as a window over "label" in the optimized plan)
    "label", "csize")

  /** Queries with a DOCUMENTED bounded window over a name that collides
    * with the corpus-key list: (query, partition column) pairs. */
  private val boundedWindowAllow: Set[(String, String)] = Set(
    // per-DOC windows: partition size = tokens/shingles of one document
    // (bounded by max doc length, not corpus size) — the PPJoin
    // rarest-first prefix rank and span/chunk position grids
    ("q_dedup_jaccard", "doc_id"), ("q_dedup_minhash", "doc_id"),
    ("q_dedup_apply", "doc_id"), ("q_dedup_clusters", "doc_id"),
    ("q_dedup_canonical", "doc_id"), ("q_dedup_downsample", "doc_id"),
    ("q_dedup_index", "doc_id"), ("q_pipeline_curate", "doc_id"),
    ("q_minhash_calibration", "doc_id"), ("q_dup_rate", "doc_id"),
    ("q_sketch_persist", "doc_id"), ("q_dedup_incremental", "doc_id"),
    // per-VECTOR windows: the IVF coarse-quantizer argmin — each vector
    // crossJoins the K=8 broadcast centroids and the window picks the
    // nearest; partition size = K rows, never a hot key
    ("q_ann_ivf", "vec_id"), ("q_ann_ivf_trained", "vec_id"),
    ("q_ann_index", "vec_id"), ("q_dedup_semantic", "vec_id"),
    ("q_hard_negatives", "vec_id"))

  /** Logical-plan window partition column names, query-shaped. */
  private def windowPartitionCols(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val lp = df.queryExecution.optimizedPlan
    lp.collect {
      case wnd: org.apache.spark.sql.catalyst.plans.logical.Window =>
        wnd.partitionSpec.flatMap(_.references.map(_.name))
      case gl: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit =>
        gl.partitionSpec.flatMap(_.references.map(_.name))
    }.flatten
  }

  test("no window partitioned by a corpus-cardinality key in any declared query") {
    // prove the detector fires on the r15 offending shape first (the
    // pre-fix q_pipeline_curate keeper selection)
    val docs = Tables.documents(spark, dir)
    val offendingShape = docs
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.col("text").cast("binary")).as("k"))
      .withColumn("mn", org.apache.spark.sql.functions.min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("k")))
    assert(windowPartitionCols(offendingShape).contains("k"),
      "detector no longer sees the duplicate-cluster-key window — fix the audit")
    // and on the pre-fix connectedComponents csize shape: the window was
    // partitioned by "cluster_id" (an alias of the propagation label),
    // which the optimized plan resolves back to "label" — the guard must
    // see THAT name or alias-laundering re-opens the hole
    val csizeShape = docs
      .select(org.apache.spark.sql.functions.col("doc_id").as("id"),
        org.apache.spark.sql.functions.col("doc_id").as("label"))
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("label").as("cluster_id"))
      .withColumn("csize", org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")))
    assert(windowPartitionCols(csizeShape).exists(corpusKeyNames),
      "detector no longer sees the post-alias cluster-label window — fix the audit")

    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val cols =
        try windowPartitionCols(fn(spark, dir))
        catch { case e: Throwable => Seq(s"PLAN_FAILED: $e") }
      cols.filter(c => corpusKeyNames(c) || c.startsWith("PLAN_FAILED"))
        .filterNot(c => boundedWindowAllow((name, c)))
        .map(c => s"$name [$c]")
    }
    assert(offenders.isEmpty,
      s"corpus-cardinality window partition keys (hot-key wall): $offenders")
  }

  /** Per-FILE budget of driver-side collect-family call sites in the
    * operator/streaming sources, each with its boundedness argument. A
    * NEW collect anywhere (or one more in an allowlisted file) fails
    * the wall below until its bound is argued here: the r18 verdict's
    * one scale flag was connectedComponents collecting its pair-graph-
    * node-sized result (O(corpus) rows at real duplication rates — a
    * driver OOM at 100 TB); that shape must not recur.
    *
    * This is a SOURCE-level audit, not a SparkListener one, because
    * Spark 4 runs Dataset.collect through SQLExecution's
    * withThreadLocalCaptured executor thread — the job's stage
    * callsites read "$anonfun$withThreadLocalCaptured$2 at
    * CompletableFuture.java", so a listener provably cannot attribute
    * collects to user code (measured r19). Static counting catches
    * every call site deterministically, including ones only reachable
    * at scale. */
  private val boundedCollectBudget = Map(
    "Percentiles.scala" -> (3, "level histogram (≤ 65536 × groups counts) + per-level refinement: probed paths collect values only when their ROW count ≤ CollectCap (hard bound; oversized paths descend 16 more bits, ≤ 65536 sub-counts per path, to the full 64 bits where a path IS one value)"),
    "TextOps.scala" -> (3, "classifier weight vectors (fixed hashed-BoW dimension) + scalar"),
    "Indexing.scala" -> (4, "scalar avgdl, 8 query terms, fused top-k ranking"),
    "Curation.scala" -> (3, "per-language maps (langs ≤ 5) + one scalar median"),
    "PcaOp.scala" -> (2, "d-dimensional component vectors (d = 32)"),
    "KMeansOp.scala" -> (5, "K centroid vectors (K ≤ 16) per trainer round"),
    "Relational3.scala" -> (2, "bounded literal spine for the recursive CTE seed"),
    "Dedup2.scala" -> (1, "q_dedup_contain per-lang report (langs ≤ 5), frees the staged explosion"),
    "GraftStreaming.scala" -> (2, "snapshot-id lists (metadata-sized)"))

  test("no corpus-sized driver collect in any operator/streaming source") {
    val dirs = Seq(
      new java.io.File("src/main/scala/graft/operators"),
      new java.io.File("src/main/scala/graft/streaming"))
    val pattern = java.util.regex.Pattern.compile(
      """\.(collect\(\)|collectAsList|head\(\)|first\(\)|toLocalIterator)""")
    val found = dirs.flatMap(d => Option(d.listFiles()).getOrElse(Array.empty).toSeq)
      .filter(_.getName.endsWith(".scala"))
      .map { f =>
        val lines = scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq
        val n = lines.count { l =>
          val code = l.split("//", 2).head // strip line comments
          !l.trim.startsWith("*") && pattern.matcher(code).find()
        }
        f.getName -> n
      }
      .filter(_._2 > 0).toMap
    val offenders = found.toSeq.sortBy(_._1).flatMap { case (file, n) =>
      boundedCollectBudget.get(file) match {
        case Some((budget, _)) if n <= budget => None
        case Some((budget, why)) =>
          Some(s"$file has $n collect sites, budget $budget ($why) — argue the new one's bound here")
        case None =>
          Some(s"$file has $n collect site(s) and no documented bound — a corpus-sized driver collect is the 100 TB scale-killer")
      }
    }
    assert(offenders.isEmpty, s"collect wall: $offenders")
    // the audit must actually be reading source (guard against a moved tree)
    assert(found.nonEmpty, "collect audit found zero sites — is the source tree present?")
  }

  test("no interpreted higher-order array functions in any declared query plan") {
    // ArrayTransform/ArrayAggregate/ArrayFilter/ZipWith are CodegenFallback
    // (interpreted per element) and measured 17-30× slower than native
    // expressions on data-sized paths (CLAUDE.md rule) — the declared
    // surface must be free of them; native graft.functions expressions
    // are the sanctioned path. Catalyst renders every HOF via its
    // embedded lambda, which prints as "lambdafunction(" — match THAT
    // (the pretty names "transform("/"filter(" would false-positive on
    // unrelated operators, and class names never appear in plan text;
    // the guard test below proves the probe string actually fires).
    val probe = "lambdafunction("
    val rendered = spark.range(1)
      .select(org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.array(org.apache.spark.sql.functions.lit(1)),
        x => x + 1).as("a"))
      .queryExecution.executedPlan.toString
    assert(rendered.contains(probe),
      s"probe string no longer matches Spark's HOF rendering — fix the audit:\n$rendered")
    // R72 reduce_agg is the sanctioned EXCEPTION: a user-programmable
    // fold aggregate carries its lambdas by definition (Presto's
    // reduce_agg is interpreted per row there too) — it is documented as
    // the ad-hoc escape hatch, never the hot-path idiom, and its state
    // (not its inputs) is what crosses the shuffle. Everything else on
    // the declared surface stays native.
    // q_multimodal: sampleFrames builds the per-document frame LIST with
    // transform/filter — the op's OUTPUT is an array of binary slices, so
    // an array constructor is inherent (a native expression would rebuild
    // the same ArrayData element-wise); per row it touches ≤ len/64
    // slices once, and the multimodal pipeline materializes frames ONCE
    // into a staged table before the (partition-batched, JVM-kernel)
    // decode — not a per-query scan-path filter like the banned shapes.
    val interpretedFoldAllow = Set("q_reduce_agg", "q_multimodal")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan =
        try fn(spark, dir).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLAN_FAILED: $e" }
      if (plan.contains(probe) && !interpretedFoldAllow(name)) Some(name) else None
    }
    assert(offenders.isEmpty, s"interpreted HOFs in plans: $offenders")
  }
}
