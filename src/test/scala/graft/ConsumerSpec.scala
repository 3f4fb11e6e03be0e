package graft

import graft.sources.GraftTable
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** S38 stream consumers (Paimon consumer-id): a registered consumer's
  * nextSnapshot pins that snapshot and everything after from expiry, so
  * a paused stream resumes without a lost offset; stale consumers
  * (consumer.expiration-time) stop pinning; the streaming source records
  * progress per committed batch via the consumer-id option. */
class ConsumerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", IntegerType), StructField("v", StringType)))

  private def appendN(t: GraftTable, n: Int): Unit =
    (1 to n).foreach(i => t.append(Seq((i, s"v$i")).toDF("k", "v")))

  test("S38a: register/list/update/delete round-trip + $consumers") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("cons-reg"), schema)
    appendN(t, 2)
    t.commitConsumer("job-a", 2)
    t.commitConsumer("job-b", 3)
    assert(t.consumers.map(c => (c.consumerId, c.nextSnapshot)) ==
      Seq(("job-a", 2L), ("job-b", 3L)))
    t.commitConsumer("job-a", 3) // progress overwrites
    assert(t.consumers.find(_.consumerId == "job-a").get.nextSnapshot == 3L)
    val sys = t.system("consumers").collect()
    assert(sys.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("job-a", 3L), ("job-b", 3L)))
    assert(t.deleteConsumer("job-b"))
    assert(t.consumers.map(_.consumerId) == Seq("job-a"))
    intercept[IllegalArgumentException] { t.commitConsumer("bad id", 1) }
  }

  test("S38b: expiry keeps the consumer's RESUME WINDOW (nextSnapshot-1 onward)") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("cons-exp"), schema)
    appendN(t, 5)
    t.commitConsumer("reader", 3) // consumed through 2; resume diffs against 2
    val expired = t.expireSnapshots(retainLast = 1)
    assert(expired == Seq(1L))
    assert(t.snapshots.map(_.id) == Seq(2L, 3L, 4L, 5L))
    // the ACTUAL resume path works: incremental read from the recorded
    // offset (diff base = last consumed snapshot 2) — this is the
    // guarantee the pin exists for
    val resumed = t.readIncrement(fromExclusive = 2L, toInclusive = 5L)
    assert(resumed.collect().map(_.getInt(0)).sorted.toSeq == Seq(3, 4, 5))
    // consumer gone → the pin lifts
    t.deleteConsumer("reader")
    assert(t.expireSnapshots(retainLast = 1) == Seq(2L, 3L, 4L))
    assert(t.snapshots.map(_.id) == Seq(5L))
  }

  test("S38c: a stale consumer (consumer.expiration-time) stops pinning") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("cons-ttl"), schema,
      options = Map("consumer.expiration-time" -> "0"))
    appendN(t, 3)
    t.commitConsumer("dead-job", 1)
    Thread.sleep(5) // strictly older than the 0 ms ttl
    assert(t.expireSnapshots(retainLast = 1) == Seq(1L, 2L))
  }

  test("S38e: consumer file protocol — no prefix collisions, monotonic resolution, legacy cleanup") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("cons-proto"), schema)
    appendN(t, 3)
    // ids where one is a '-'-prefix of the other must not collide
    t.commitConsumer("job", 2)
    t.commitConsumer("job-eu", 3)
    t.commitConsumer("job", 3) // cleanup of job's old version
    assert(t.consumers.map(c => (c.consumerId, c.nextSnapshot)) ==
      Seq(("job", 3L), ("job-eu", 3L)))
    assert(t.deleteConsumer("job"))
    assert(t.consumers.map(_.consumerId) == Seq("job-eu")) // job-eu untouched
    // an out-of-order (stale) commit cannot rewind the pin: the higher
    // version survives cleanup and resolution takes the max
    t.commitConsumer("job-eu", 2)
    assert(t.consumers.find(_.consumerId == "job-eu").get.nextSnapshot == 3L)
    // explicit rewind = delete + commit (the reset_consumer shape)
    t.deleteConsumer("job-eu")
    t.commitConsumer("job-eu", 2)
    assert(t.consumers.find(_.consumerId == "job-eu").get.nextSnapshot == 2L)
  }

  test("S38d: readStream with consumer-id records progress per committed batch") {
    val path = TestSpark.tmpDir("cons-stream")
    val t = GraftTable.create(spark, path, schema)
    t.append(Seq((1, "a")).toDF("k", "v"))
    val q = spark.readStream.format("graft").option("consumer-id", "etl-1").load(path)
      .writeStream.outputMode("append").format("memory").queryName("cons_out").start()
    try {
      q.processAllAvailable()
      t.append(Seq((2, "b")).toDF("k", "v"))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM cons_out").first().getLong(0) == 2)
      // the source commits consumed offsets as batches finalize; after
      // two processed batches at least snapshot 1 is recorded consumed
      val c = t.consumers.find(_.consumerId == "etl-1")
      assert(c.isDefined, "streaming source did not register its consumer")
      assert(c.get.nextSnapshot >= 2L)
    } finally q.stop()
  }
}
