package graft

import graft.sources.GraftTable
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue, CountDownLatch, Executors, TimeUnit}
import scala.jdk.CollectionConverters._
import scala.util.Random

/** S17 under fire: randomized CONCURRENT writer/maintenance fuzz over one
  * table — the production risk class no oracle query can catch (every
  * 100 TB deployment runs writers and maintenance concurrently).
  *
  * Protocol under test: every write captures ONE base snapshot and
  * commits at base+1 behind an exclusive claim file; a lost race throws
  * `conflicting commit` and the CALLER retries from a fresh base
  * (restaging — commitOrClean reclaims the loser's files). The fuzz
  * model-checks the whole surface:
  *
  *  - every published snapshot id is claimed by EXACTLY ONE successful
  *    op call (the returned id), and the claimed ids are gapless 1..N —
  *    no lost update, no double-publish, no phantom snapshot;
  *  - the on-disk snapshot set is exactly {1..N} minus the union of
  *    expire() reports — expiry never silently eats a live snapshot;
  *  - final content (and time-travel content of retained snapshots)
  *    equals a SERIALIZED REPLAY of the logical ops in snapshot-id
  *    order through an in-memory model (upsert/delete fold by commit
  *    order — the PK deduplicate contract; rollback restores the
  *    model's state at its target; compaction is content-neutral);
  *  - after expiry + tag removal + an orphan sweep, the data dir holds
  *    EXACTLY the files the remaining snapshot references (no leaks).
  *
  * Tags are created on ids the SAME thread just committed and never
  * deleted mid-fuzz, so rollback targets stay pinned from expiry by
  * construction (retainLast=25 ≫ the commit-to-tag window); the
  * tag-vs-inflight-expiry window is thereby unreachable here — racing
  * an expiry that pre-dates the tag is a documented operational hazard,
  * not a protocol bug this fuzz hunts.
  */
class ConcurrencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private sealed trait Op
  private case class Ups(rows: Map[Long, String]) extends Op
  private case class Del(keys: Set[Long]) extends Op
  private case class Rbk(target: Long) extends Op
  private case class App(rows: Map[Long, String]) extends Op
  private case class Dvd(keys: Set[Long]) extends Op
  private case object Mnt extends Op // COMPACT — content-neutral

  /** Retry a write through lost optimistic-concurrency races (the
    * documented caller contract: recapture base + restage). */
  private def retrying[A](body: => A, max: Int = 120): A = {
    var i = 0
    while (i < max) {
      try return body
      catch {
        case e: IllegalStateException
            if String.valueOf(e.getMessage).contains("conflicting commit") =>
          i += 1; Thread.sleep(5L + (i % 7) * 10L)
      }
    }
    body // last attempt propagates
  }

  private def record(log: ConcurrentHashMap[Long, Op], id: Long, op: Op): Unit = {
    val prev = log.putIfAbsent(id, op)
    assert(prev == null, s"two ops both claim snapshot $id: $prev vs $op")
  }

  /** Data files (and dv sidecars) physically present under data/. */
  private def dataFilesOnDisk(root: String): Set[String] = {
    val base = new java.io.File(root, "data")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    if (!base.exists()) Set.empty
    else walk(base)
      .filterNot(_.getName.startsWith(".")) // Hadoop local-FS .crc sidecars
      .map(_.getAbsolutePath.stripPrefix(
        new java.io.File(root).getAbsolutePath + "/")).toSet
  }

  /** file_path + dv_path of the CURRENT snapshot via the $files table. */
  private def referencedNow(t: GraftTable): Set[String] = {
    val rows = t.system("files").select("file_path", "dv_path").collect()
    (rows.map(_.getString(0)) ++ rows.flatMap(r => Option(r.getString(1)))).toSet
  }

  // ---- PK-table fuzz: upserts, deletes, compactBuckets, expire, tags,
  // ---- rollback — all racing on one table ------------------------------

  private def pkFuzz(seed: Int): Unit = {
    val dir = TestSpark.tmpDir(s"concpk$seed")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    GraftTable.create(spark, dir, schema, primaryKeys = Seq("k"),
      options = Map("bucket" -> "2"))

    val nThreads = 4
    val opsPer = 12
    val keySpace = 30
    val opLog = new ConcurrentHashMap[Long, Op]()
    val expired = new ConcurrentHashMap[Long, java.lang.Boolean]()
    val tagQ = new ConcurrentLinkedQueue[String]()
    val failures = new ConcurrentLinkedQueue[Throwable]()
    val start = new CountDownLatch(1)
    val master = new Random(seed)
    val threadSeeds = Array.fill(nThreads)(master.nextLong())
    val pool = Executors.newFixedThreadPool(nThreads)

    (0 until nThreads).foreach { ti =>
      pool.submit(new Runnable {
        def run(): Unit = {
          import spark.implicits._
          val rnd = new Random(threadSeeds(ti))
          val t = GraftTable.load(spark, dir) // own writer instance
          start.await()
          var op = 0
          var lastCommitted = 0L
          while (op < opsPer) {
            try {
              rnd.nextInt(10) match {
                case 0 | 1 | 2 | 3 | 4 => // upsert 1-4 keys
                  val rows = (0 until 1 + rnd.nextInt(4))
                    .map(j => rnd.nextInt(keySpace).toLong -> s"s$seed-t$ti-o$op-$j").toMap
                  val id = retrying(t.upsert(rows.toSeq.toDF("k", "v")))
                  record(opLog, id, Ups(rows)); lastCommitted = id
                case 5 | 6 => // delete 1-3 keys (absent keys tombstone to no-op)
                  val keys = (0 until 1 + rnd.nextInt(3))
                    .map(_ => rnd.nextInt(keySpace).toLong).toSet
                  val id = retrying(t.delete(keys.toSeq.map(k => (k, "")).toDF("k", "v")))
                  record(opLog, id, Del(keys)); lastCommitted = id
                case 7 => // fold sorted runs (content-neutral)
                  retrying(t.compactBuckets(trigger = 2))
                    .foreach(id => record(opLog, id, Mnt))
                case 8 => // tag my own last commit; sometimes roll back to a tag
                  if (lastCommitted > 0 && rnd.nextBoolean()) {
                    val name = s"fz-$seed-$ti-$op"
                    t.createTag(name, Some(lastCommitted))
                    tagQ.add(name)
                  } else {
                    val tags = tagQ.asScala.toSeq
                    if (tags.nonEmpty) {
                      val name = tags(rnd.nextInt(tags.length))
                      val target = t.snapshotForTag(name)
                      val id = retrying(t.rollbackToTag(name))
                      record(opLog, id, Rbk(target)); lastCommitted = id
                    }
                  }
                case 9 => // expire old snapshots (racing everyone)
                  try t.expireSnapshots(retainLast = 25)
                    .foreach(id => expired.put(id, java.lang.Boolean.TRUE))
                  catch {
                    // a concurrent expiry removed a snapshot between this
                    // one's listing and its reads — clean abort by design
                    case e: Exception
                        if String.valueOf(e.getMessage).contains("snap") => ()
                  }
              }
              op += 1
            } catch { case e: Throwable => failures.add(e); op = opsPer }
          }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(15, TimeUnit.MINUTES), "fuzz threads hung")
    assert(failures.isEmpty, s"fuzz ops failed: ${failures.asScala.map(_.toString).take(3)}")

    val t = GraftTable.load(spark, dir)
    val claimed = opLog.keySet.asScala.toSeq.sorted
    assert(claimed.nonEmpty)
    val latest = claimed.max
    // 1) gapless exclusive claims: every id 1..latest returned by exactly one op
    assert(claimed == (1L to latest), s"claim gaps/dups: $claimed")
    // 2) disk = {1..latest} minus exactly the expire() reports
    val disk = t.snapshots.map(_.id).sorted
    val exp = expired.keySet.asScala.toSet
    assert(disk.toSet == (1L to latest).toSet -- exp,
      s"snapshot log drifted: disk=$disk expired=$exp latest=$latest")
    // 3) serialized replay: fold ops in snapshot-id order
    var state = Map.empty[Long, String]
    val states = scala.collection.mutable.Map.empty[Long, Map[Long, String]]
    (1L to latest).foreach { id =>
      opLog.get(id) match {
        case Ups(rows) => state = state ++ rows
        case Del(keys) => state = state -- keys
        case Rbk(target) => state = states(target)
        case Mnt => ()
        case other => fail(s"unexpected op $other at $id")
      }
      states(id) = state
    }
    def contentAt(id: Option[Long]): Map[Long, String] =
      t.read(snapshotId = id).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(contentAt(None) == state, "final content != serialized replay")
    // 4) time travel on a sample of retained snapshots matches the model
    val sample = disk.filter(_ > 0).takeRight(6) ++ disk.take(2)
    sample.distinct.foreach { id =>
      assert(contentAt(Some(id)) == states(id), s"time travel drifted at snapshot $id")
    }
    // 5) retention endgame: drop tags, expire to one snapshot, sweep —
    //    content intact and the data dir holds exactly what's referenced
    tagQ.asScala.foreach(t.deleteTag)
    t.expireSnapshots(retainLast = 1)
    t.removeOrphanFiles(ttlMs = 0L)
    assert(contentAt(None) == state, "content changed after expire+sweep")
    assert(dataFilesOnDisk(dir) == referencedNow(t),
      "data dir out of sync with the final snapshot after sweep (leak or over-delete)")
  }

  for (seed <- Seq(11, 23, 47)) {
    test(s"S17f: concurrent PK writers + maintenance fuzz (seed $seed)") {
      pkFuzz(seed)
    }
  }

  // ---- append+dv fuzz: appends, dv-DELETEs, whole-table compaction,
  // ---- expiry — the S37 metadata-commit path under the same protocol --

  test("S17g: concurrent append/dvDelete/compact fuzz (dv table)") {
    import spark.implicits._
    val seed = 101
    val dir = TestSpark.tmpDir(s"concdv$seed")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    GraftTable.create(spark, dir, schema,
      options = Map("deletion-vectors.enabled" -> "true"))

    val nThreads = 3
    val opsPer = 8
    val opLog = new ConcurrentHashMap[Long, Op]()
    val expired = new ConcurrentHashMap[Long, java.lang.Boolean]()
    val failures = new ConcurrentLinkedQueue[Throwable]()
    val start = new CountDownLatch(1)
    val master = new Random(seed)
    val threadSeeds = Array.fill(nThreads)(master.nextLong())
    val pool = Executors.newFixedThreadPool(nThreads)

    (0 until nThreads).foreach { ti =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val rnd = new Random(threadSeeds(ti))
          val t = GraftTable.load(spark, dir)
          start.await()
          // keys this thread appended and has not yet dv-deleted — targeted
          // deletes always match ≥1 live row, so dvDelete's no-op return
          // (ambiguous with a foreign id) never needs recording
          val mine = scala.collection.mutable.Queue.empty[Long]
          var ctr = 0L
          var op = 0
          while (op < opsPer) {
            try {
              rnd.nextInt(6) match {
                case 0 | 1 | 2 => // append 2-4 unique keys
                  val rows = (0 until 2 + rnd.nextInt(3)).map { _ =>
                    ctr += 1; (ti * 1000000L + ctr) -> s"s$seed-t$ti-o$op"
                  }.toMap
                  val id = retrying(t.append(rows.toSeq.toDF("k", "v")))
                  record(opLog, id, App(rows))
                  rows.keys.foreach(mine.enqueue)
                case 3 | 4 => // dv-delete 1-3 of my own live keys
                  if (mine.nonEmpty) {
                    val keys = (0 until math.min(1 + rnd.nextInt(3), mine.size))
                      .map(_ => mine.dequeue()).toSet
                    val id = retrying(
                      t.dvDelete(col("k").isin(keys.toSeq.map(Long.box): _*)))
                    record(opLog, id, Dvd(keys))
                  }
                case 5 => // whole-table rewrite (applies dvs; content-neutral)
                  val id = retrying(t.compact())
                  record(opLog, id, Mnt)
              }
              op += 1
            } catch { case e: Throwable => failures.add(e); op = opsPer }
          }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(15, TimeUnit.MINUTES), "dv fuzz threads hung")
    assert(failures.isEmpty, s"dv fuzz ops failed: ${failures.asScala.map(_.toString).take(3)}")

    val t = GraftTable.load(spark, dir)
    val claimed = opLog.keySet.asScala.toSeq.sorted
    val latest = claimed.max
    assert(claimed == (1L to latest), s"claim gaps/dups: $claimed")
    var state = Map.empty[Long, String]
    (1L to latest).foreach { id =>
      opLog.get(id) match {
        case App(rows) => state = state ++ rows
        case Dvd(keys) => state = state -- keys
        case Mnt => ()
        case other => fail(s"unexpected op $other at $id")
      }
    }
    val actual = t.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(actual == state, "dv-table content != serialized replay")
    // retention endgame as above (also reclaims superseded dv sidecars)
    t.expireSnapshots(retainLast = 1).foreach(id => expired.put(id, java.lang.Boolean.TRUE))
    t.removeOrphanFiles(ttlMs = 0L)
    val after = t.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after == state, "dv-table content changed after expire+sweep")
    assert(dataFilesOnDisk(dir) == referencedNow(t),
      "dv-table data dir out of sync after sweep (leak or over-delete)")
  }

  // ---- S48 under fire: the DYNAMIC-bucket leg — concurrent upserts and
  // ---- deletes race the key-hash→bucket INDEX-CHAIN commits (S48's
  // ---- claim surface, covered only pairwise before r18) ----------------

  test("S17h: concurrent dynamic-bucket writers fuzz (index chain under contention)") {
    import spark.implicits._
    val seed = 211
    val dir = TestSpark.tmpDir(s"concdyn$seed")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    GraftTable.create(spark, dir, schema, primaryKeys = Seq("k"),
      options = Map("bucket" -> "-1", "dynamic-bucket.target-row-num" -> "8"))

    val nThreads = 3
    val opsPer = 8
    val keySpace = 40
    val opLog = new ConcurrentHashMap[Long, Op]()
    val failures = new ConcurrentLinkedQueue[Throwable]()
    val start = new CountDownLatch(1)
    val master = new Random(seed)
    val threadSeeds = Array.fill(nThreads)(master.nextLong())
    val pool = Executors.newFixedThreadPool(nThreads)

    (0 until nThreads).foreach { ti =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val rnd = new Random(threadSeeds(ti))
          val t = GraftTable.load(spark, dir)
          start.await()
          var op = 0
          while (op < opsPer) {
            try {
              rnd.nextInt(8) match {
                case 0 | 1 | 2 | 3 | 4 => // upsert 1-5 keys (mints buckets)
                  val rows = (0 until 1 + rnd.nextInt(5))
                    .map(j => rnd.nextInt(keySpace).toLong -> s"d$seed-t$ti-o$op-$j").toMap
                  val id = retrying(t.upsert(rows.toSeq.toDF("k", "v")))
                  record(opLog, id, Ups(rows))
                case 5 | 6 => // delete 1-3 keys (tombstones pin/mint buckets)
                  val keys = (0 until 1 + rnd.nextInt(3))
                    .map(_ => rnd.nextInt(keySpace).toLong).toSet
                  val id = retrying(t.delete(keys.toSeq.map(k => (k, "")).toDF("k", "v")))
                  record(opLog, id, Del(keys))
                case 7 => // fold sorted runs (content-neutral)
                  retrying(t.compactBuckets(trigger = 2))
                    .foreach(id => record(opLog, id, Mnt))
              }
              op += 1
            } catch { case e: Throwable => failures.add(e); op = opsPer }
          }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(15, TimeUnit.MINUTES), "dyn fuzz threads hung")
    assert(failures.isEmpty, s"dyn fuzz ops failed: ${failures.asScala.map(_.toString).take(3)}")

    val t = GraftTable.load(spark, dir)
    val claimed = opLog.keySet.asScala.toSeq.sorted
    val latest = claimed.max
    assert(claimed == (1L to latest), s"dyn claim gaps/dups: $claimed")
    var state = Map.empty[Long, String]
    (1L to latest).foreach { id =>
      opLog.get(id) match {
        case Ups(rows) => state = state ++ rows
        case Del(keys) => state = state -- keys
        case Mnt => ()
        case other => fail(s"unexpected op $other at $id")
      }
    }
    val actual = t.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(actual == state, "dynamic-bucket content != serialized replay")
    // every key landed in exactly ONE bucket (the MOR soundness the
    // index chain exists to guarantee — a split key would resurrect).
    // PK tables expose no per-row metadata columns (post-merge file
    // identity is ill-defined), so check the RAW data files per bucket
    // from the $files manifest — every version of a key, tombstones
    // included, must live in one bucket
    val byBucket = t.system("files").select("file_path", "bucket").collect()
      .groupBy(_.getInt(1)).view
      .mapValues(_.map(r => s"$dir/${r.getString(0)}")).toMap
    val keyBuckets = byBucket.toSeq.flatMap { case (b, paths) =>
      spark.read.parquet(paths: _*).select("k").distinct()
        .collect().map(_.getLong(0) -> b)
    }
    assert(keyBuckets.groupBy(_._1).forall(_._2.map(_._2).distinct.length == 1),
      "a key's rows span buckets — the index chain lost an assignment race")
    // retention endgame: chain sidecars + data stay reachability-exact
    t.expireSnapshots(retainLast = 1)
    t.removeOrphanFiles(ttlMs = 0L)
    assert(t.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap == state,
      "dynamic-bucket content changed after expire+sweep")
  }

  // ---- S36 under fire: branch-scoped writers racing fastForward — the
  // ---- adopt-a-moving-branch surface (covered only pairwise before r18)

  test("S17i: concurrent branch writers racing fastForward") {
    import spark.implicits._
    val seed = 307
    val dir = TestSpark.tmpDir(s"concbr$seed")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    val t = GraftTable.create(spark, dir, schema, primaryKeys = Seq("k"),
      options = Map("bucket" -> "2"))
    t.upsert(Seq((1L, "seed")).toDF("k", "v")) // snapshot 1 = branch cut
    t.createBranch("exp")

    val nThreads = 3
    val opsPer = 8
    val keySpace = 30
    val opLog = new ConcurrentHashMap[Long, Op]()
    val failures = new ConcurrentLinkedQueue[Throwable]()
    val start = new CountDownLatch(1)
    val master = new Random(seed)
    val threadSeeds = Array.fill(nThreads)(master.nextLong())
    val pool = Executors.newFixedThreadPool(nThreads)
    val done = new java.util.concurrent.atomic.AtomicInteger(0)

    (0 until nThreads).foreach { ti =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val rnd = new Random(threadSeeds(ti))
          val b = GraftTable.load(spark, dir).forBranch("exp")
          start.await()
          var op = 0
          while (op < opsPer) {
            try {
              if (rnd.nextInt(4) < 3) {
                val rows = (0 until 1 + rnd.nextInt(4))
                  .map(j => rnd.nextInt(keySpace).toLong -> s"b$seed-t$ti-o$op-$j").toMap
                val id = retrying(b.upsert(rows.toSeq.toDF("k", "v")))
                record(opLog, id, Ups(rows))
              } else {
                val keys = (0 until 1 + rnd.nextInt(2))
                  .map(_ => rnd.nextInt(keySpace).toLong).toSet
                val id = retrying(b.delete(keys.toSeq.map(k => (k, "")).toDF("k", "v")))
                record(opLog, id, Del(keys))
              }
              op += 1
            } catch { case e: Throwable => failures.add(e); op = opsPer }
          }
          done.incrementAndGet(); ()
        }
      })
    }
    start.countDown()
    // fastForward races the live branch writers: each adoption copies the
    // branch prefix visible at its own listing into main — main's head
    // must always be SOME consistent branch state, never a torn mix
    var lastFf = 1L
    while (done.get() < nThreads) {
      Thread.sleep(40L)
      lastFf = t.fastForward("exp")
      // mid-fuzz consistency check, gated: a writer publishes its claim
      // INSIDE upsert but records into opLog just after, so an adopted id
      // can be momentarily unrecorded — only replay when the full prefix
      // is visible (the final post-quiesce check is unconditional)
      if ((2L to lastFf).forall(opLog.containsKey)) {
        val mainNow = t.read(snapshotId = Some(lastFf)).collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        var s = Map(1L -> "seed")
        (2L to lastFf).foreach { id =>
          opLog.get(id) match {
            case Ups(rows) => s = s ++ rows
            case Del(keys) => s = s -- keys
            case other => fail(s"unexpected op $other at $id")
          }
        }
        assert(mainNow == s, s"fastForward adopted a torn state at head $lastFf")
      }
    }
    pool.shutdown()
    assert(pool.awaitTermination(15, TimeUnit.MINUTES), "branch fuzz threads hung")
    assert(failures.isEmpty,
      s"branch fuzz ops failed: ${failures.asScala.map(_.toString).take(3)}")

    // final adoption: main == full serialized branch replay
    val headId = t.fastForward("exp")
    val claimed = opLog.keySet.asScala.toSeq.sorted
    assert(claimed == (2L to headId), s"branch claim gaps/dups: $claimed")
    var state = Map(1L -> "seed")
    (2L to headId).foreach { id =>
      opLog.get(id) match {
        case Ups(rows) => state = state ++ rows
        case Del(keys) => state = state -- keys
        case other => fail(s"unexpected op $other at $id")
      }
    }
    val mainFinal = t.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(mainFinal == state, "post-fastForward main != serialized branch replay")
  }
}
