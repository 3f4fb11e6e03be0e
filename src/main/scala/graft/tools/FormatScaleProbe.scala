package graft.tools

import graft.sources.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the r10/r11 FORMAT features that are not plain
  * queries: deletion-vector DELETE + masked scan over many files,
  * dynamic-bucket assignment at growing key counts, and
  * rewrite_file_index over a table written without sidecars. Prints
  * per-step seconds; run at two data scales and compare ratios — the
  * same discipline as RunQ for queries.
  *
  *   runMain graft.tools.FormatScaleProbe <sfDir>
  */
object FormatScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val base = java.nio.file.Files.createTempDirectory("fmtprobe").toString

    // ---- S37 deletion vectors over many files -------------------------
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val dv = GraftTable.create(spark, s"$base/dv", li.schema,
      options = Map("deletion-vectors.enabled" -> "true"))
    // many files: one commit, repartitioned wide so sidecars spread
    timed("dv: ingest")(dv.append(li.repartition(64)))
    timed("dv: delete ~2% via sidecars")(
      dv.dvDelete(col("l_orderkey") % 50 === 0))
    val kept = timed("dv: masked full scan")(dv.read().count())
    println(s"[probe] dv rows kept = $kept")

    // ---- S48 dynamic-bucket assignment at scale -----------------------
    val cust = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
    val dyn = GraftTable.create(spark, s"$base/dyn", cust.schema,
      primaryKeys = Seq("k"),
      options = Map("bucket" -> "-1", "dynamic-bucket.target-row-num" -> "100000"))
    timed("dyn: initial upsert (all keys new)")(dyn.upsert(cust))
    timed("dyn: update upsert (no new keys)")(
      dyn.upsert(cust.filter(col("k") % 7 === 0).withColumn("v", col("v") + 1)))
    val dynRows = timed("dyn: MOR read")(dyn.read().count())
    println(s"[probe] dyn rows = $dynRows")

    // ---- S47 rewrite_file_index over an unindexed table ---------------
    val bl = GraftTable.create(spark, s"$base/bloom", li.schema)
    timed("bloom: ingest without index")(bl.append(li.repartition(32)))
    bl.setOptions(Map("file-index.bloom-filter.columns" -> "l_partkey"))
    val built = timed("bloom: rewrite_file_index")(bl.rewriteFileIndex())
    println(s"[probe] bloom sidecars built = $built")

    // ---- S55 bitmap index: write, exact skip, sidecar-only count ------
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "source", "n_chars")
    val bm = GraftTable.create(spark, s"$base/bm", docs.schema,
      options = Map("file-index.bitmap.columns" -> "lang,source"))
    timed("bitmap: ingest with sidecars")(bm.append(docs.repartition(16)))
    timed("bitmap: exact-skip filtered scan")(
      spark.read.format("graft").load(s"$base/bm")
        .filter(col("lang") === "de").queryExecution.toRdd.count())
    timed("bitmap: claimed sidecar-only COUNT")(
      spark.read.format("graft").option("bitmap.claim-filters", "true")
        .load(s"$base/bm").filter(col("lang") === "de")
        .agg(count(lit(1))).queryExecution.toRdd.count())
    timed("bitmap: claimed masked row scan")(
      spark.read.format("graft").option("bitmap.claim-filters", "true")
        .load(s"$base/bm").filter(col("lang") === "de")
        .queryExecution.toRdd.count())

    // ---- S66 BSI index: write, gap-exact range skip, claimed count -----
    val bsi = GraftTable.create(spark, s"$base/bsi", li.schema,
      options = Map("file-index.bsi.columns" -> "l_partkey"))
    timed("bsi: ingest with sidecars")(bsi.append(li.repartition(16)))
    timed("bsi: range filtered scan")(
      spark.read.format("graft").load(s"$base/bsi")
        .filter(col("l_partkey").between(1000L, 2000L))
        .queryExecution.toRdd.count())
    timed("bsi: claimed sidecar-only range COUNT")(
      spark.read.format("graft").option("bsi.claim-filters", "true")
        .load(s"$base/bsi").filter(col("l_partkey").between(1000L, 2000L))
        .agg(count(lit(1))).queryExecution.toRdd.count())
    timed("bsi: claimed masked row scan")(
      spark.read.format("graft").option("bsi.claim-filters", "true")
        .load(s"$base/bsi").filter(col("l_partkey").between(1000L, 2000L))
        .queryExecution.toRdd.count())

    // ---- S56 record-level expire through compaction --------------------
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    // events span Jan 2024: now=2024-01-31, TTL 15 d ⇒ ~half the rows age out
    val rex = GraftTable.create(spark, s"$base/rex", ev.schema, options = Map(
      "record-level.expire-time" -> "15d",
      "record-level.time-field" -> "ts",
      "record-level.expire.now-millis" -> "1706659200000"))
    timed("expire: ingest")(rex.append(ev.repartition(16)))
    timed("expire: compact (TTL rewrite)")(rex.compact())
    println(s"[probe] expire rows kept = ${rex.read().count()}")

    // ---- S61 cross-partition upsert: the GLOBAL index under moves ------
    val xp = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        col("o_totalprice").as("v"))
    val xpt = GraftTable.create(spark, s"$base/xp", xp.schema,
      partitionKeys = Seq("status"), primaryKeys = Seq("k"),
      options = Map("bucket" -> "-1", "dynamic-bucket.target-row-num" -> "100000"))
    timed("xpart: initial upsert")(xpt.upsert(xp))
    // every 7th key MOVES partition: index lookup + old-group tombstone +
    // fresh assignment + index supersede, in one commit
    timed("xpart: move upsert (1/7 keys)")(
      xpt.upsert(xp.filter(col("k") % 7 === 0).withColumn("status", lit("X"))))
    val xr = timed("xpart: MOR read after moves")(xpt.read().count())
    println(s"[probe] xpart rows = $xr")

    // ---- S60 read-optimized $ro on a COMPACTED PK table -----------------
    timed("ro: compact PK table")(xpt.compact())
    timed("ro: $ro read (compacted)")(
      xpt.system("ro").queryExecution.toRdd.count())
    timed("ro: full MOR read (compacted)")(
      xpt.read().queryExecution.toRdd.count())

    // ---- S64 row tracking: id assignment, lineage read, id-preserving fold
    val rtDocs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val rt = GraftTable.create(spark, s"$base/rt", rtDocs.schema, options = Map(
      "row-tracking.enabled" -> "true", "deletion-vectors.enabled" -> "true"))
    timed("rowtrack: ingest (2 commits, id assignment)") {
      rt.append(rtDocs.filter(col("doc_id") % 2 === 0).repartition(8))
      rt.append(rtDocs.filter(col("doc_id") % 2 =!= 0).repartition(8))
    }
    timed("rowtrack: lineage read")(
      rt.readWithLineage().queryExecution.toRdd.count())
    timed("rowtrack: dv delete ~10%")(rt.dvDelete(col("doc_id") % 10 === 0))
    timed("rowtrack: id-materializing compact")(rt.compact())
    timed("rowtrack: lineage read (materialized)")(
      rt.readWithLineage().queryExecution.toRdd.count())

    // ---- S65 delta row-level ops (UPDATE/MERGE/DELETE as dv + append) --
    spark.conf.set("spark.sql.catalog.fmtprobe", "graft.sources.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.fmtprobe.warehouse", s"$base/wh")
    spark.sql("CREATE NAMESPACE fmtprobe.q")
    spark.sql("""CREATE TABLE fmtprobe.q.rl (doc_id BIGINT, lang STRING, n_chars BIGINT)
                |TBLPROPERTIES ('row-tracking.enabled'='true')""".stripMargin)
    val rlDocs = rtDocs.select(col("doc_id").cast("long").as("doc_id"),
      col("lang").cast("string").as("lang"), col("n_chars").cast("long").as("n_chars"))
    val rl = GraftTable.load(spark, s"$base/wh/q.db/rl")
    timed("delta: ingest")(rl.append(rlDocs.repartition(8)))
    timed("delta: UPDATE ~10% (dv + id-keeping append)")(
      spark.sql("UPDATE fmtprobe.q.rl SET n_chars = n_chars + 1 WHERE doc_id % 10 = 3"))
    rlDocs.filter(col("doc_id") % 20 === 7)
      .union(rlDocs.filter(col("doc_id") % 20 === 9)
        .withColumn("doc_id", -col("doc_id")))
      .createOrReplaceTempView("probe_rl_src")
    timed("delta: MERGE ~5% updates + ~5% inserts")(
      spark.sql("""MERGE INTO fmtprobe.q.rl t USING probe_rl_src s
                  |ON t.doc_id = s.doc_id
                  |WHEN MATCHED THEN UPDATE SET t.n_chars = s.n_chars + 2
                  |WHEN NOT MATCHED THEN INSERT (doc_id, lang, n_chars)
                  |  VALUES (s.doc_id, s.lang, s.n_chars)""".stripMargin))
    timed("delta: DELETE ~10% (pure dv metadata)")(
      spark.sql("DELETE FROM fmtprobe.q.rl WHERE doc_id % 10 = 6 AND n_chars % 2 = 0"))
    val rlRows = timed("delta: lineage read after ops")(
      rl.readWithLineage().queryExecution.toRdd.count())
    println(s"[probe] delta rows = $rlRows")

    // ---- L68 dedup index: build once, refresh delta ---------------------
    val dtexts = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val dsrc = GraftTable.create(spark, s"$base/dixsrc",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
    dsrc.append(dtexts.filter(col("doc_id") % 10 =!= 0))
    timed("dedupidx: BUILD (90% of corpus)")(
      graft.operators.DedupIndex.build(spark, dsrc, s"$base/dix"))
    dsrc.append(dtexts.filter(col("doc_id") % 10 === 0))
    timed("dedupidx: REFRESH (10% delta)")(
      graft.operators.DedupIndex.refresh(spark, dsrc, s"$base/dix"))
    timed("dedupidx: pairs from persisted bands")(
      graft.operators.DedupIndex.pairs(spark, dsrc, s"$base/dix")
        .queryExecution.toRdd.count())

    // ---- L62 ANN index: build once, probe many --------------------------
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val src = GraftTable.create(spark, s"$base/annsrc",
      graft.operators.AnnIndex.SourceSchema)
    src.append(emb)
    timed("ann: BUILD (train + assign + persist)")(
      graft.operators.AnnIndex.build(spark, src, s"$base/annidx"))
    timed("ann: probe #1 from persisted index")(
      graft.operators.AnnIndex.probe(spark, src, s"$base/annidx",
        col("vec_id") < 20).queryExecution.toRdd.count())
    timed("ann: probe #2 (warm)")(
      graft.operators.AnnIndex.probe(spark, src, s"$base/annidx",
        col("vec_id") < 20).queryExecution.toRdd.count())

    // ---- S56 × S64: record-level expire on a ROW-TRACKING table ---------
    // expiry drops rows at the compaction rewrite while survivors must
    // keep their ids (materialized through the fold) — the lineage read
    // after expiry should stay flat vs before at any scale
    val evl = graft.Tables.events(spark, dir)
      .select(col("event_id").cast("long").as("event_id"), col("user_id"), col("ts"))
    val rext = GraftTable.create(spark, s"$base/rext", evl.schema, options = Map(
      "row-tracking.enabled" -> "true",
      "record-level.expire-time" -> "15d",
      "record-level.time-field" -> "ts",
      "record-level.expire.now-millis" -> "1706659200000"))
    timed("expire+track: ingest")(rext.append(evl.repartition(16)))
    val preIds = timed("expire+track: lineage read (pre)")(
      rext.readWithLineage().select("event_id", "_row_id"))
    val pre = preIds.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    timed("expire+track: compact (TTL rewrite, id-materializing)")(rext.compact())
    val post = timed("expire+track: lineage read (post-expiry)")(
      rext.readWithLineage().select("event_id", "_row_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap)
    val moved = post.count { case (k, id) => pre.get(k).exists(_ != id) }
    println(s"[probe] expire+track survivors = ${post.size} of ${pre.size}, " +
      s"renumbered = $moved (must be 0)")
    require(moved == 0, "record-level expire renumbered surviving rows")

    // ---- Zipfian skew stress: a boilerplate mega-cluster + stopword ----
    // shingles vs a uniform corpus of EQUAL volume, driven through the
    // shared Jaccard pair stage (the df-cap kills the D² hot-shingle
    // blowup: the mega-cluster's shingles all carry df > DfCap and never
    // enter candidate generation), the L70 sqrt-downsample (groupBy+join,
    // no window on the duplicate key), a skew-partitioned dynamic-bucket
    // upsert, and a delta MERGE whose matches concentrate in one file.
    def mkCorpus(path: String, n: Int, dupCopies: Int, stops: Boolean): String = {
      val wordsPerDoc = 40
      val boiler = (0 until wordsPerDoc).map(j => s"boiler$j").mkString(" ")
      val rows = (0 until n).map { i =>
        val text =
          if (i < dupCopies) boiler
          else (0 until wordsPerDoc).map { j =>
            val h = (i.toLong * 1103515245L + j * 12345L) & 0x7fffffffL
            if (stops && j % 2 == 0) s"s${h % 20}" else s"w${h % 50000}"
          }.mkString(" ")
        (i.toLong, text, s"l${i % 5}", "web", text.length.toLong)
      }
      import spark.implicits._
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .repartition(16).write.parquet(s"$path/documents.parquet")
      path
    }
    val nDocs = 20000
    val uniDir = mkCorpus(s"$base/zipf-uni", nDocs, 0, stops = false)
    val zipfDir = mkCorpus(s"$base/zipf-hot", nDocs, nDocs / 2, stops = true)
    for ((tag, d2) <- Seq(("uniform", uniDir), ("zipfian", zipfDir))) {
      timed(s"skew[$tag]: jaccard pair stage")(
        graft.SparkEntry.queries("q_dedup_jaccard")(spark, d2)
          .queryExecution.toRdd.count())
      timed(s"skew[$tag]: L70 sqrt-downsample")(
        graft.SparkEntry.queries("q_dedup_downsample")(spark, d2)
          .queryExecution.toRdd.count())
      // the END-TO-END composed pipeline (L27) over the same corpora:
      // its exact-dedup keeper selection is the r16 groupBy rewrite —
      // the mega-cluster must not re-introduce a hot-key wall
      timed(s"skew[$tag]: composed pipeline (L27)")(
        graft.SparkEntry.queries("q_pipeline_curate")(spark, d2)
          .queryExecution.toRdd.count())
    }
    // the dedup/pair stages above persisted frames for three corpora in
    // this one probe JVM — drop them before the write-heavy skew
    // sections (nothing re-reads them; a real pipeline's stages are
    // separate jobs)
    spark.catalog.clearCache()
    // dynamic-bucket upsert: 90% of keys land in ONE partition vs spread
    import spark.implicits._
    val nKeys = 100000
    def dynUp(tag: String, partOf: org.apache.spark.sql.Column): Unit = {
      val df = spark.range(nKeys).select(col("id").as("k"),
        partOf.as("part"), (col("id") * 1.0).as("v"))
      val t = GraftTable.create(spark, s"$base/zdyn-$tag", df.schema,
        partitionKeys = Seq("part"), primaryKeys = Seq("k", "part"),
        options = Map("bucket" -> "-1", "dynamic-bucket.target-row-num" -> "5000"))
      timed(s"skew[$tag]: dynamic-bucket upsert")(t.upsert(df))
      timed(s"skew[$tag]: MOR read")(t.read().queryExecution.toRdd.count())
    }
    dynUp("uniform", (col("id") % 20).cast("string"))
    dynUp("zipfian", when(col("id") % 10 < 9, lit("hot"))
      .otherwise((col("id") % 20).cast("string")))
    // delta MERGE: equal changed-row counts, matches spread over all
    // files vs concentrated in ONE file's key range
    spark.sql("""CREATE TABLE fmtprobe.q.zm (k BIGINT, v BIGINT)
                |TBLPROPERTIES ('row-tracking.enabled'='true')""".stripMargin)
    val zm = GraftTable.load(spark, s"$base/wh/q.db/zm")
    // 10 files of 10k rows each, key-ranged
    for (b <- 0 until 10)
      zm.append(spark.range(b * 10000L, (b + 1) * 10000L)
        .select(col("id").as("k"), col("id").as("v")).coalesce(1))
    spark.range(nKeys).filter(col("id") % 10 === 3)
      .select(col("id").as("k"), (col("id") + 1).as("v"))
      .createOrReplaceTempView("zm_spread")
    spark.range(10000).select(col("id").as("k"), (col("id") + 1).as("v"))
      .createOrReplaceTempView("zm_hot")
    timed("skew[uniform]: delta MERGE (matches spread)")(
      spark.sql("""MERGE INTO fmtprobe.q.zm t USING zm_spread s ON t.k = s.k
                  |WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin))
    timed("skew[zipfian]: delta MERGE (matches in one file)")(
      spark.sql("""MERGE INTO fmtprobe.q.zm t USING zm_hot s ON t.k = s.k
                  |WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin))

    spark.stop()
  }
}
