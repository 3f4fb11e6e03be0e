package graft

import graft.sources.GraftTable
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.1 S36: branches — writable refs with their own snapshot log
  * cut from a main snapshot, sharing schema/manifests/data files (ref:
  * Paimon create_branch / delete_branch / fast_forward procedures).
  * Contrast tags (S27): a tag pins one snapshot read-only; a branch
  * keeps committing without touching main. */
class BranchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", IntegerType), StructField("v", StringType)))

  test("S36a: branch writes are invisible on main, main writes invisible on the branch") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("br-iso"), schema)
    t.append(Seq((1, "a")).toDF("k", "v"))
    t.createBranch("exp")
    val b = t.forBranch("exp")
    b.append(Seq((2, "branch")).toDF("k", "v"))
    t.append(Seq((3, "main")).toDF("k", "v"))
    assert(t.read().collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
    assert(b.read().collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    assert(t.branches == Seq("exp"))
    // $branches system table: name, cut point, head (cut=1, head=2 after
    // the branch's own commit)
    assert(t.system("branches").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq == Seq(("exp", 1L, 2L)))
    // the `branch` read option scans the branch ref through the V2 path
    val viaOpt = spark.read.format("graft").option("branch", "exp").load(t.root)
    assert(viaOpt.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    // and the write option commits onto the branch
    Seq((4, "opt")).toDF("k", "v").write.format("graft")
      .option("branch", "exp").mode("append").save(t.root)
    assert(t.forBranch("exp").read().collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 4))
    assert(t.read().collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
  }

  test("S36b: branch from an explicit older snapshot; invalid cases error") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("br-old"), schema)
    val s1 = t.append(Seq((1, "a")).toDF("k", "v"))
    t.append(Seq((2, "b")).toDF("k", "v"))
    t.createBranch("old", Some(s1))
    assert(t.forBranch("old").read().collect().map(_.getInt(0)).toSeq == Seq(1))
    intercept[IllegalArgumentException] { t.createBranch("old") }      // duplicate
    intercept[IllegalArgumentException] { t.createBranch("bad name") } // invalid chars
    intercept[IllegalArgumentException] { t.forBranch("nope") }        // missing
    intercept[IllegalArgumentException] { t.forBranch("old").createBranch("x") }
    // path-segment traversal must be rejected everywhere a name arrives:
    // deleteBranch("..") would recursively delete the table root, and
    // forBranch("..") would silently alias main
    intercept[IllegalArgumentException] { t.deleteBranch("..") }
    intercept[IllegalArgumentException] { t.forBranch("..") }
    assert(t.read().count() == 2) // root intact
    // a branch write option on a table that does not exist yet must fail
    // loudly, not create the table and write main
    intercept[IllegalArgumentException] {
      Seq((1, "x")).toDF("k", "v").write.format("graft")
        .option("branch", "exp").mode("append").save(TestSpark.tmpDir("br-missing"))
    }
  }

  test("S36c: fastForward adopts branch history, discards diverged main, refuses dangling tag pins") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("br-ff"), schema)
    t.append(Seq((1, "a")).toDF("k", "v"))
    t.createBranch("work")
    val b = t.forBranch("work")
    b.append(Seq((2, "w1")).toDF("k", "v"))
    b.append(Seq((3, "w2")).toDF("k", "v"))
    // main diverges after the cut point; fastForward discards this commit
    t.append(Seq((9, "diverged")).toDF("k", "v"))
    val head = t.fastForward("work")
    assert(t.read().collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    assert(t.latestSnapshotId.contains(head))
    // main continues committing after the splice
    t.append(Seq((4, "after")).toDF("k", "v"))
    assert(t.read().collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3, 4))
    // main diverged LONGER than the branch: the fast-forward's new head
    // is a formerly-discarded id, and the NEXT main commit reuses the id
    // right above it — both had live commit claims that must have been
    // cleaned, or the append refuses for ClaimTtlMs
    val t3 = GraftTable.create(spark, TestSpark.tmpDir("br-ffclaim"), schema)
    t3.append(Seq((1, "a")).toDF("k", "v"))
    t3.createBranch("short")
    t3.forBranch("short").append(Seq((2, "w")).toDF("k", "v")) // branch head = 2
    t3.append(Seq((8, "d1")).toDF("k", "v")) // main 2 (diverged)
    t3.append(Seq((9, "d2")).toDF("k", "v")) // main 3 (diverged)
    assert(t3.fastForward("short") == 2L)
    t3.append(Seq((3, "after")).toDF("k", "v")) // claims id 3 again — must succeed NOW
    assert(t3.read().collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    // a tag pinning a to-be-discarded snapshot blocks the fast-forward
    val t2 = GraftTable.create(spark, TestSpark.tmpDir("br-ffpin"), schema)
    t2.append(Seq((1, "a")).toDF("k", "v"))
    t2.createBranch("w")
    t2.forBranch("w").append(Seq((2, "w")).toDF("k", "v"))
    t2.append(Seq((9, "d")).toDF("k", "v"))
    t2.createTag("pin") // pins the diverged head
    intercept[IllegalArgumentException] { t2.fastForward("w") }
  }

  test("S36d: main expiry never reclaims files a branch still reads") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("br-expire"), schema)
    t.append(Seq((1, "a")).toDF("k", "v"))
    t.append(Seq((2, "b")).toDF("k", "v"))
    t.createBranch("keep") // branch reads files of snapshots 1+2
    // compaction rewrites main's state into fresh files, so after expiry
    // the original appended files are referenced ONLY by expired main
    // snapshots — and by the branch, which must keep them alive
    t.compact()
    val expired = t.expireSnapshots(retainLast = 1)
    assert(expired.nonEmpty)
    // the branch still reads its full cut-point state — its files
    // survived expiry of the main snapshots that introduced them
    assert(t.forBranch("keep").read().collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }

  test("S36e: orphan GC spares branch-only files; deleteBranch then releases them") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("br-gc"), schema)
    t.append(Seq((1, "a")).toDF("k", "v"))
    t.createBranch("exp")
    t.forBranch("exp").append(Seq((2, "b")).toDF("k", "v"))
    // ttl=0: reclaim everything unreferenced NOW — branch files must survive
    assert(t.removeOrphanFiles(ttlMs = 0L).isEmpty)
    assert(t.forBranch("exp").read().count() == 2)
    assert(t.deleteBranch("exp"))
    assert(t.branches.isEmpty)
    // the ref is gone: the branch's own file is now a true orphan
    val reclaimed = t.removeOrphanFiles(ttlMs = 0L)
    assert(reclaimed.nonEmpty)
    assert(t.read().collect().map(_.getInt(0)).toSeq == Seq(1)) // main intact
  }

  test("S36h: branch read() routes the branch ref through the V2 scan (PK and dv tables)") {
    import org.apache.spark.sql.functions.col
    // PK table: read() takes the format("graft") route — the branch ref
    // must be forwarded or the scan silently reads MAIN's snapshot log
    val pk = GraftTable.create(spark, TestSpark.tmpDir("br-v2pk"), schema,
      primaryKeys = Seq("k"))
    pk.upsert(Seq((1, "base")).toDF("k", "v"))
    pk.createBranch("b")
    pk.forBranch("b").upsert(Seq((2, "branch")).toDF("k", "v"))
    pk.upsert(Seq((3, "main")).toDF("k", "v")) // main diverges
    assert(pk.forBranch("b").read().collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    assert(pk.read().collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
    // dv-carrying append table: same route, same requirement
    val dv = GraftTable.create(spark, TestSpark.tmpDir("br-v2dv"),
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))),
      options = Map("deletion-vectors.enabled" -> "true"))
    dv.append((0L until 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    dv.dvDelete(col("id") < 3)
    dv.createBranch("bd")
    dv.forBranch("bd").append(Seq((100L, "branch")).toDF("id", "v"))
    dv.append(Seq((200L, "main")).toDF("id", "v"))
    val branchIds = dv.forBranch("bd").read().collect().map(_.getLong(0)).sorted.toSeq
    assert(branchIds == ((3L until 10L) :+ 100L).toSeq, s"got $branchIds")
    assert(!dv.read().collect().map(_.getLong(0)).contains(100L))
  }

  test("S36f: concurrent writers on DIFFERENT branches never contend") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("br-conc"), schema)
    t.append(Seq((0, "base")).toDF("k", "v"))
    t.createBranch("w1")
    t.createBranch("w2")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // branch claims are branch-scoped (.claim files live under each ref's
    // own snapshot dir), so cross-branch commit traffic must not conflict
    val threads = Seq("w1", "w2").map { name =>
      new Thread(() => {
        try {
          val b = t.forBranch(name)
          (1 to 5).foreach(i => b.append(Seq((i, name)).toDF("k", "v")))
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"cross-branch commits conflicted: ${errs.peek()}")
    Seq("w1", "w2").foreach { name =>
      val rows = t.forBranch(name).read().collect()
        .map(r => (r.getInt(0), r.getString(1))).toSet
      assert(rows == (1 to 5).map(i => (i, name)).toSet + ((0, "base")),
        s"branch $name content")
    }
    assert(t.read().collect().map(_.getInt(0)).toSeq == Seq(0)) // main untouched
  }

  test("S36g: fastForward racing a main writer leaves a gapless, readable log with the branch history adopted") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("br-race"), schema)
    t.append(Seq((1, "a")).toDF("k", "v"))
    t.append(Seq((2, "b")).toDF("k", "v"))
    t.createBranch("work")
    val b = t.forBranch("work")
    b.append(Seq((100, "w1")).toDF("k", "v"))
    b.append(Seq((101, "w2")).toDF("k", "v"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writer = new Thread(() => {
      val t2 = GraftTable.load(spark, t.root)
      var landed = 0
      var attempts = 0
      while (landed < 3 && attempts < 30) {
        attempts += 1
        try { t2.append(Seq((200 + landed, "m")).toDF("k", "v")); landed += 1 }
        catch { case _: IllegalStateException => Thread.sleep(20) } // lost a claim race
      }
    })
    val ff = new Thread(() => {
      try t.fastForward("work")
      catch { case e: Throwable => errs.add(e) }
    })
    writer.start(); ff.start()
    writer.join(120000); ff.join(120000)
    assert(errs.isEmpty, s"fastForward failed under race: ${errs.peek()}")
    val t3 = GraftTable.load(spark, t.root)
    val ids = t3.snapshots.map(_.id)
    // crash-ordering contract: ascending copy + descending tail delete
    // leaves NO gap whatever the interleaving
    assert(ids == (ids.min to ids.max).toSeq, s"snapshot log has gaps: $ids")
    // every surviving snapshot is readable (no torn manifests)
    ids.foreach(id => t3.read(snapshotId = Some(id)).count())
    // the adopted branch history is in main's head (a racing append that
    // LOST to the splice is legitimately discarded; one that landed after
    // builds on the adopted chain — either way w1/w2 are present)
    val headKs = t3.read().collect().map(_.getInt(0)).toSet
    assert(Set(100, 101).subsetOf(headKs), s"branch history missing from head: $headKs")
  }

  test("S50: scan.fallback-branch serves partitions missing from main") {
    val pschema = StructType(Seq(
      StructField("pt", StringType), StructField("k", IntegerType),
      StructField("v", StringType)))
    val t = GraftTable.create(spark, TestSpark.tmpDir("br-fb"), pschema,
      partitionKeys = Seq("pt"),
      options = Map("scan.fallback-branch" -> "old"))
    t.append(Seq(("p0", 0, "seed")).toDF("pt", "k", "v"))
    // option points at a missing branch → a read fails LOUDLY, never
    // silently incomplete
    intercept[IllegalArgumentException](t.read().collect())
    t.createBranch("old")
    val dev = t.forBranch("old")
    // the old pipeline owns p1+p2 on the branch; the new pipeline has
    // backfilled only p1 on main (with DIFFERENT content for p1)
    dev.append(Seq(("p1", 1, "old1"), ("p2", 2, "old2")).toDF("pt", "k", "v"))
    t.append(Seq(("p1", 10, "new1")).toDF("pt", "k", "v"))
    val rows = t.read().orderBy("k").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq
    // p0 + p1 from MAIN (the branch's copies shadowed), p2 from the branch
    assert(rows == Seq(("p0", 0, "seed"), ("p2", 2, "old2"), ("p1", 10, "new1")), rows)
    // partition pruning composes with the fallback
    assert(t.read(partitionFilter = Some(org.apache.spark.sql.functions.col("pt") === "p2"))
      .collect().map(_.getInt(1)).toSeq == Seq(2))
    // time travel ignores the fallback (snapshot 1 = the seed commit)
    assert(t.read(snapshotId = Some(1L)).collect().map(_.getInt(1)).toSeq == Seq(0))
    // backfilling p2 on main shadows the branch copy
    t.append(Seq(("p2", 20, "new2")).toDF("pt", "k", "v"))
    val after = t.read().orderBy("k").collect().map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(after == Seq((0, "seed"), (10, "new1"), (20, "new2")), after)
    // the branch view itself is never fallback-shaped
    assert(dev.read().collect().map(_.getInt(1)).toSet == Set(0, 1, 2))
  }
}
