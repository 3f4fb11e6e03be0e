package graft

import graft.sources.GraftTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.1 S51/S52: the remaining changelog-producer modes —
  * `input` (the caller's stream IS the changelog; writeCdc) and
  * `full-compaction` (changelog materializes only at compact() by
  * diffing merged states). `none`/`lookup` are S7's lattice. */
class ChangelogProducerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", IntegerType), StructField("v", StringType)))

  private def cl(t: GraftTable, from: Long, to: Long): Seq[(String, Long, Int, String)] =
    t.readIncrement(from, to, changelog = true)
      .orderBy("commit_seq", "k", "rowkind")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getString(3))).toSeq

  // ---- S51: changelog-producer=input -----------------------------------

  test("S51a: writeCdc stores input kinds verbatim; merge and changelog replay agree") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("cdc-in"), schema,
      primaryKeys = Seq("k"), options = Map("changelog-producer" -> "input"))
    t.writeCdc(Seq(("+I", 1, "a"), ("+I", 2, "b")).toDF("rowkind", "k", "v"))
    // CDC update arrives as a -U/+U pair; delete as -D — written as-is,
    // no lookup join against table state
    t.writeCdc(Seq(("-U", 1, "a"), ("+U", 1, "a2")).toDF("rowkind", "k", "v"))
    t.writeCdc(Seq(("-D", 2, "b")).toDF("rowkind", "k", "v"))
    // merged read honors the kinds: k=1 updated, k=2 deleted
    assert(t.read().orderBy("k").collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a2")))
    // the changelog replay is exactly the input stream
    assert(cl(t, 0, 3) == Seq(
      ("+I", 1L, 1, "a"), ("+I", 1L, 2, "b"),
      ("+U", 2L, 1, "a2"), ("-U", 2L, 1, "a"),
      ("-D", 3L, 2, "b")))
  }

  test("S51b: writeCdc validation — mode, rowkind lattice, same-seq multi-version batches") {
    val none = GraftTable.create(spark, TestSpark.tmpDir("cdc-none"), schema,
      primaryKeys = Seq("k"))
    intercept[IllegalArgumentException] {
      none.writeCdc(Seq(("+I", 1, "a")).toDF("rowkind", "k", "v"))
    }
    val t = GraftTable.create(spark, TestSpark.tmpDir("cdc-bad"), schema,
      primaryKeys = Seq("k"), options = Map("changelog-producer" -> "input"))
    intercept[Exception] { // raise_error surfaces as a Spark job failure
      t.writeCdc(Seq(("??", 1, "a")).toDF("rowkind", "k", "v"))
    }
    // two versions of one key, no sequence.field → rejected (they would
    // share a commit seq and merge nondeterministically)
    intercept[IllegalArgumentException] {
      t.writeCdc(Seq(("+I", 1, "a"), ("+U", 1, "a2")).toDF("rowkind", "k", "v"))
    }
    // -U markers are exempt: a (-U, +U) pair for a key is ONE version
    t.writeCdc(Seq(("-U", 1, "x"), ("+U", 1, "a1")).toDF("rowkind", "k", "v"))
    assert(t.read().collect().map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "a1")))
  }

  test("S51c: with sequence.field a multi-version CDC batch folds in data order") {
    val s3 = StructType(schema.fields :+ StructField("seq", LongType))
    val t = GraftTable.create(spark, TestSpark.tmpDir("cdc-seq"), s3,
      primaryKeys = Seq("k"),
      options = Map("changelog-producer" -> "input", "sequence.field" -> "seq"))
    // one batch: insert then update then delete of k=1 (ordered by seq),
    // plus an insert of k=2 — the fold must land on (k=2) only
    t.writeCdc(Seq(
      ("+I", 1, "a", 1L), ("+U", 1, "a2", 2L), ("-D", 1, "gone", 3L),
      ("+I", 2, "b", 1L)).toDF("rowkind", "k", "v", "seq"))
    assert(t.read().collect().map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((2, "b")))
  }

  // ---- S52: changelog-producer=full-compaction -------------------------

  private def fcTable(name: String) =
    GraftTable.create(spark, TestSpark.tmpDir(name), schema,
      primaryKeys = Seq("k"),
      options = Map("changelog-producer" -> "full-compaction"))

  test("S52a: appends emit no changelog; compact() diffs merged states into +I/-U/+U/-D") {
    val t = fcTable("fc-basic")
    t.upsert(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    t.upsert(Seq((3, "c")).toDF("k", "v"))
    // between compactions the changelog stream is silent
    assert(cl(t, 0, t.latestSnapshotId.get).isEmpty)
    val c1 = t.compact()
    // first changelog-producing compaction: the full state as +I
    assert(cl(t, 0, c1) == Seq(
      ("+I", c1, 1, "a"), ("+I", c1, 2, "b"), ("+I", c1, 3, "c")))
    // update k=1, delete k=2, insert k=4 — then compact again
    t.upsert(Seq((1, "a2"), (4, "d")).toDF("k", "v"))
    t.delete(Seq((2, "b")).toDF("k", "v"))
    val c2 = t.compact()
    assert(cl(t, c1, c2) == Seq(
      ("+U", c2, 1, "a2"), ("-U", c2, 1, "a"),
      ("-D", c2, 2, "b"),
      ("+I", c2, 4, "d")))
    // full-range replay = both diffs, stamped with their snapshot ids
    assert(cl(t, 0, c2).map(_._2).distinct == Seq(c1, c2))
  }

  test("S52b: an unchanged compaction commits changelog-less; expiry reclaims SUPERSEDED diffs") {
    val t = fcTable("fc-gc")
    t.upsert(Seq((1, "a")).toDF("k", "v"))
    val c1 = t.compact()
    val dir1 = t.snapshots.find(_.id == c1).get.changelogDir
    assert(dir1 != null)
    // no data change → empty diff → no changelog dir on this COMPACT,
    // but the lastChangelog pointer still names c1
    val c2 = t.compact()
    assert(t.snapshots.find(_.id == c2).get.changelogDir == null)
    assert(t.snapshots.find(_.id == c2).get.lastChangelog == c1)
    assert(cl(t, c1, c2).isEmpty)
    val fs = GraftTable.fileSystem(spark, t.root)
    // a NEWER changelog-bearing compaction supersedes c1 as the diff
    // base; only then may expiry reclaim c1 and its diff dir
    t.upsert(Seq((2, "b")).toDF("k", "v"))
    val c3 = t.compact()
    assert(t.snapshots.find(_.id == c3).get.changelogDir != null)
    t.expireSnapshots(retainLast = 1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(t.root, dir1)),
      "superseded snapshot's changelog dir leaked")
  }

  test("S52d: expiry PINS the current diff base — a consumer never sees a degraded all-+I diff") {
    val t = fcTable("fc-pin")
    t.upsert(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    val c1 = t.compact()
    // appends push c1 outside the retain window; the pin must keep it
    t.upsert(Seq((1, "a2")).toDF("k", "v"))
    t.upsert(Seq((3, "c")).toDF("k", "v"))
    val expired = t.expireSnapshots(retainLast = 1)
    assert(!expired.contains(c1), s"diff base $c1 expired: $expired")
    // the next compaction diffs against c1's REAL state: the update
    // emits -U/+U (not a re-+I of an unchanged key), k=2 emits nothing
    val c2 = t.compact()
    assert(cl(t, c2 - 1, c2) == Seq(
      ("+U", c2, 1, "a2"), ("-U", c2, 1, "a"),
      ("+I", c2, 3, "c")))
  }

  test("S52c: orphan sweep reclaims crash-leaked changelog dirs, keeps referenced ones") {
    val t = fcTable("fc-orphan")
    t.upsert(Seq((1, "a")).toDF("k", "v"))
    val c1 = t.compact()
    val live = t.snapshots.find(_.id == c1).get.changelogDir
    val fs = GraftTable.fileSystem(spark, t.root)
    val orphan = new org.apache.hadoop.fs.Path(t.root, "changelog/cl-crashed-xyz")
    fs.mkdirs(orphan)
    val removed = t.removeOrphanFiles(ttlMs = 0)
    assert(removed.contains("changelog/cl-crashed-xyz"))
    assert(fs.exists(new org.apache.hadoop.fs.Path(t.root, live)),
      "live changelog dir swept")
  }

  test("S52e: full-compaction changelog is branch-local — a branch compaction's diff " +
    "never leaks into main's changelog stream (and vice versa)") {
    val t = fcTable("fc-branch")
    t.upsert(Seq((1, "a")).toDF("k", "v"))
    val cMain = t.compact()
    t.createBranch("dev")
    val dev = t.forBranch("dev")
    dev.upsert(Seq((2, "dev-only")).toDF("k", "v"))
    val cDev = dev.compact()
    // the branch sees its own diff (+I of the branch-only row)...
    assert(cl(dev, cMain, cDev) == Seq(("+I", cDev, 2, "dev-only")))
    // ...main's stream stays exactly its own history
    assert(cl(t, 0, t.latestSnapshotId.get) == Seq(("+I", cMain, 1, "a")))
    // both changelog dirs survive each ref's expiry pinning
    t.upsert(Seq((3, "m")).toDF("k", "v"))
    t.expireSnapshots(retainLast = 1)
    assert(cl(dev, cMain, cDev) == Seq(("+I", cDev, 2, "dev-only")),
      "main expiry broke the branch's changelog")
  }

  test("T23: CDC relay — a changelog stream lands verbatim in an input-producer table; " +
    "downstream readers see the SAME kinds") {
    import graft.streaming.GraftStreaming
    val srcPath = TestSpark.tmpDir("relay-src")
    val dstPath = TestSpark.tmpDir("relay-dst")
    val s3 = StructType(schema.fields :+ StructField("seq", LongType))
    val src = GraftTable.create(spark, srcPath, s3,
      primaryKeys = Seq("k"),
      options = Map("sequence.field" -> "seq", "changelog-producer" -> "lookup"))
    val dst = GraftTable.create(spark, dstPath, s3,
      primaryKeys = Seq("k"),
      options = Map("sequence.field" -> "seq", "changelog-producer" -> "input"))
    src.upsert(Seq((1, "a", 1L), (2, "b", 1L)).toDF("k", "v", "seq"))
    val changelog = spark.readStream.format("graft")
      .option("readChangelog", "true").load(srcPath)
    val q = GraftStreaming.relayCdcStream(changelog, dst).start()
    try {
      q.processAllAvailable()
      src.upsert(Seq((1, "a2", 2L), (3, "c", 2L)).toDF("k", "v", "seq"))
      src.delete(Seq((2, "b", 3L)).toDF("k", "v", "seq"))
      q.processAllAvailable()
      // the relay target's STATE matches the source
      def state(t: GraftTable) = t.read().orderBy("k").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSeq
      assert(state(dst) == state(src))
      assert(state(dst) == Seq((1, "a2"), (3, "c")))
      // and its CHANGELOG carries the source's kinds verbatim — the
      // property replicateStream (T8) cannot offer
      def kinds(t: GraftTable) = t.readIncrement(0, t.latestSnapshotId.get, changelog = true)
        .orderBy("commit_seq", "k", "rowkind")
        .collect().map(r => (r.getString(0), r.getInt(2), r.getString(3))).toSeq
      assert(kinds(dst) == kinds(src), s"relay changed the kinds:\n${kinds(dst)}\n${kinds(src)}")
      assert(kinds(dst).map(_._1).toSet == Set("+I", "-U", "+U", "-D"))
    } finally q.stop()
  }

  test("T4e: streaming readChangelog over a full-compaction table delivers the diffs") {
    val path = TestSpark.tmpDir("fc-stream")
    val t = GraftTable.create(spark, path, schema,
      primaryKeys = Seq("k"),
      options = Map("changelog-producer" -> "full-compaction"))
    t.upsert(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    val c1 = t.compact()
    val q = spark.readStream.format("graft").option("readChangelog", "true").load(path)
      .writeStream.outputMode("append").format("memory").queryName("graft_cdc_fc").start()
    try {
      q.processAllAvailable()
      t.upsert(Seq((1, "a2")).toDF("k", "v"))
      q.processAllAvailable() // the APPEND alone delivers nothing
      val afterAppend = spark.sql("SELECT count(*) FROM graft_cdc_fc").collect().head.getLong(0)
      t.compact()
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT rowkind, k, v FROM graft_cdc_fc ORDER BY commit_seq, k, rowkind")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      assert(afterAppend == 2, s"append leaked rows into the changelog stream: $afterAppend")
      assert(got.toSeq == Seq(
        ("+I", 1, "a"), ("+I", 2, "b"),
        ("+U", 1, "a2"), ("-U", 1, "a")))
    } finally q.stop()
  }
}
