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
}
