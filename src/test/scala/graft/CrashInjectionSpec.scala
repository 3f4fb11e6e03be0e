package graft

import graft.sources.{DeletionVector, GraftTable}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Kill-point tests for the multi-phase commit jobs whose crash-ordering
  * soundness previously rested on documented arguments (r16 verdict #6):
  * each test manufactures the exact between-phases state a crash leaves
  * — by pre-planting the target claim file (which fails the publish
  * phase after every earlier phase ran for real) or by constructing the
  * partial on-disk state by hand — then asserts the log stays readable,
  * a retry converges, and no artifact survives the orphan sweep.
  */
class CrashInjectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hfs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFilesOnDisk(root: String): Set[String] = {
    val base = new java.io.File(root, "data")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    if (!base.exists()) Set.empty
    else walk(base).filterNot(_.getName.startsWith("."))
      .map(_.getAbsolutePath.stripPrefix(
        new java.io.File(root).getAbsolutePath + "/")).toSet
  }

  private def referencedNow(t: GraftTable): Set[String] = {
    val rows = t.system("files").select("file_path", "dv_path").collect()
    (rows.map(_.getString(0)) ++ rows.flatMap(r => Option(r.getString(1)))).toSet
  }

  test("S42c: rescale crash between schema flip and data commit — fenced, resumable, no strays") {
    val root = TestSpark.tmpDir("crash-rescale")
    val schema = StructType(Seq(StructField("k", IntegerType), StructField("v", StringType)))
    val t = GraftTable.create(spark, root, schema, primaryKeys = Seq("k"),
      options = Map("bucket" -> "2"))
    t.upsert(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"))
    val base = t.latestSnapshotId.get
    val before = t.read().collect().map(r => (r.getInt(0), r.getString(1))).toSet

    // KILL POINT: the rescale publishes the new layout as a fresh schema
    // version FIRST, then commits the re-hashed rewrite. Planting the
    // rewrite's claim makes that second phase fail exactly at the
    // boundary — everything before it (schema write, full restage) ran.
    val fs = hfs(root)
    fs.create(new Path(root, s"snapshot/.claim-${base + 1}"), false).close()
    val e = intercept[IllegalStateException](t.rescaleBucket(4))
    assert(e.getMessage.contains("conflicting commit"))

    // crash state: unreferenced new schema + old snapshot. Reads group by
    // the FileMeta-recorded buckets, so they still work...
    val t2 = GraftTable.load(spark, root)
    assert(t2.read().collect().map(r => (r.getInt(0), r.getString(1))).toSet == before)
    // ...but incremental writes are FENCED until the rescale finishes
    // (a commit here would stamp the new schemaId onto old-hash files)
    val fenced = intercept[IllegalStateException](
      t2.upsert(Seq((4, "d")).toDF("k", "v")))
    assert(fenced.getMessage.contains("mid-rescale"))
    // the failed attempt's staged rewrite files were reclaimed by
    // commitOrClean — nothing strays even before any sweep
    assert(dataFilesOnDisk(root) == referencedNow(t2))

    // recovery: the dead claimant's claim cleared (crash = operator
    // removes it, or ClaimTtl elapses), the same rescale RESUMES — the
    // same-count call is not a no-op while layout and files disagree
    fs.delete(new Path(root, s"snapshot/.claim-${base + 1}"), false)
    val done = t2.rescaleBucket(4)
    assert(done == base + 1)
    val t3 = GraftTable.load(spark, root)
    assert(t3.read().collect().map(r => (r.getInt(0), r.getString(1))).toSet == before)
    t3.upsert(Seq((4, "d")).toDF("k", "v")) // fence lifted
    assert(t3.read().count() == 4)
    // retention endgame: with only the head retained, the data dir must
    // hold exactly what it references — no stray from the failed attempt
    t3.expireSnapshots(retainLast = 1)
    Thread.sleep(50)
    t3.removeOrphanFiles(ttlMs = 0L)
    assert(t3.read().count() == 4)
    assert(dataFilesOnDisk(root) == referencedNow(t3))
  }

  test("S36g: fastForward crash mid-splice — log readable, rerun converges, sweep reclaims the discards") {
    val root = TestSpark.tmpDir("crash-ff")
    val schema = StructType(Seq(StructField("k", IntegerType), StructField("v", StringType)))
    val t = GraftTable.create(spark, root, schema)
    t.append(Seq((1, "a")).toDF("k", "v")) // main 1 (shared)
    t.createBranch("work")
    val b = t.forBranch("work")
    b.append(Seq((2, "w1")).toDF("k", "v")) // branch 2
    b.append(Seq((3, "w2")).toDF("k", "v")) // branch 3
    t.append(Seq((8, "d1")).toDF("k", "v")) // main 2 (diverged)
    t.append(Seq((9, "d2")).toDF("k", "v")) // main 3 (diverged)

    // KILL POINT: the splice copies branch snapshots over main
    // (copy phase) and then deletes the surviving diverged ids (delete
    // phase). Manufacture a crash after copying ONLY the first adopted
    // snapshot: main's log now mixes one branch snapshot with diverged
    // main history — exactly what a died-mid-loop splice leaves.
    val fs = hfs(root)
    val body = org.apache.commons.io.IOUtils.toString(
      fs.open(new Path(root, "branch/work/snapshot/snap-2.json")), "UTF-8")
    val out = fs.create(new Path(root, "snapshot/snap-2.json"), true)
    out.write(body.getBytes("UTF-8")); out.close()
    fs.delete(new Path(root, "snapshot/.claim-2"), false)

    // every snapshot in the mixed log stays readable (each carries its
    // own full manifest chain), and the head still serves main's content
    val mid = GraftTable.load(spark, root)
    mid.snapshots.foreach(s => assert(s.id >= 1)) // full log parse, no throw
    assert(mid.read().collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 8, 9))

    // recovery: rerunning the SAME fastForward converges (the copy phase
    // is an idempotent overwrite; the delete phase re-derives its set)
    val head = mid.fastForward("work")
    assert(head == 3L)
    val t2 = GraftTable.load(spark, root)
    assert(t2.read().collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    assert(t2.snapshots.map(_.id).sorted == Seq(1L, 2L, 3L))
    // main keeps committing over the formerly-diverged ids
    t2.append(Seq((4, "after")).toDF("k", "v"))
    assert(t2.read().collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3, 4))
    // the discarded diverged files are referenced by nothing (main OR
    // branch) — the sweep reclaims them and the live reads are intact
    Thread.sleep(50)
    t2.removeOrphanFiles(ttlMs = 0L)
    assert(t2.read().collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3, 4))
    assert(GraftTable.load(spark, root).forBranch("work")
      .read().collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
  }

  test("S65o: commitDelta crash between partial-dv merge and publish — idempotent retry, sweep reclaims scratch") {
    val root = TestSpark.tmpDir("crash-dvmerge")
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    val t = GraftTable.create(spark, root, schema,
      options = Map("deletion-vectors.enabled" -> "true"))
    t.append((0L until 10L).map(k => (k, s"v$k")).toDF("k", "v"))
    val base = t.latestSnapshotId.get
    val filePath = t.system("files").select("file_path").collect().map(_.getString(0)).head
    val conf = spark.sparkContext.hadoopConfiguration
    def writePartials(): Seq[(String, String, Long)] = Seq(
      (filePath, DeletionVector.write(conf, root, Array(0L)), 1L),
      (filePath, DeletionVector.write(conf, root, Array(1L)), 1L))
    val partials = writePartials()

    // KILL POINT: two same-file partials force the merge phase (a real
    // Spark job writing the FINAL sidecar); the planted claim then fails
    // the publish phase — the crash window the r16 verdict flagged.
    val fs = hfs(root)
    fs.create(new Path(root, s"snapshot/.claim-${base + 1}"), false).close()
    val e = intercept[IllegalStateException](
      t.commitDelta(Seq.empty, Seq.empty, partials, base))
    assert(e.getMessage.contains("conflicting commit"))

    // no commit: content untouched; the merged FINAL was reclaimed by the
    // lost-race cleanup, the PARTIALS survive (task idempotency contract
    // — a retried attempt must find its inputs; they are the batch
    // abort's job, here simulated by the orphan sweep)
    val t2 = GraftTable.load(spark, root)
    assert(t2.read().count() == 10)
    partials.foreach { case (_, rel, _) =>
      assert(fs.exists(new Path(root, rel)), s"partial $rel must survive the failed attempt")
    }
    Thread.sleep(50)
    val swept = t2.removeOrphanFiles(ttlMs = 0L)
    assert(partials.forall { case (_, rel, _) => swept.exists(_.endsWith(rel)) },
      s"sweep must reclaim the stray partials (swept=$swept)")
    assert(t2.read().count() == 10)

    // recovery: clear the dead claim, regenerate the partials (the
    // retried batch's executors would), rerun the SAME commitDelta
    fs.delete(new Path(root, s"snapshot/.claim-${base + 1}"), false)
    val retried = writePartials()
    val id = t2.commitDelta(Seq.empty, Seq.empty, retried, base)
    assert(id == base + 1)
    val t3 = GraftTable.load(spark, root)
    assert(t3.read().collect().map(_.getLong(0)).sorted.toSeq == (2L until 10L))
    // post-publish the driver reclaimed the merged partials; with only
    // the head retained, the sweep leaves the data dir matching the
    // snapshot exactly (the fully-deleted file's bytes reclaim with the
    // base snapshot)
    t3.expireSnapshots(retainLast = 1)
    Thread.sleep(50)
    t3.removeOrphanFiles(ttlMs = 0L)
    assert(t3.read().collect().map(_.getLong(0)).sorted.toSeq == (2L until 10L))
    assert(dataFilesOnDisk(root) == referencedNow(t3))
  }
}
