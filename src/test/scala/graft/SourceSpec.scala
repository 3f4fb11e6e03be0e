package graft

import graft.sources.GraftTable
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSource API (`format("graft")`) + SQL function extensions. */
class SourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("write + read through format(\"graft\"), including SQL views") {
    val path = TestSpark.tmpDir("dsv1")
    Seq(("a", 1, 10L), ("b", 2, 20L)).toDF("pt", "x", "y")
      .write.format("graft").option("partitionKeys", "pt").save(path)
    // append through the source
    Seq(("a", 3, 30L)).toDF("pt", "x", "y")
      .write.format("graft").mode(SaveMode.Append).save(path)
    val df = spark.read.format("graft").load(path)
    assert(df.orderBy("x").collect().map(_.getInt(1)).toSeq == Seq(1, 2, 3))
    // SQL view over the source
    df.createOrReplaceTempView("graft_t")
    assert(spark.sql("SELECT sum(y) FROM graft_t WHERE pt = 'a'").first().getLong(0) == 40L)
  }

  test("snapshotId read option = scan_version time travel") {
    val path = TestSpark.tmpDir("dsv1tt")
    Seq((1, "v1")).toDF("k", "v").write.format("graft").save(path)
    Seq((2, "v2")).toDF("k", "v").write.format("graft").mode(SaveMode.Append).save(path)
    val asOf1 = spark.read.format("graft").option("snapshotId", "1").load(path)
    assert(asOf1.collect().map(_.getString(1)).toSeq == Seq("v1"))
    assert(spark.read.format("graft").load(path).count() == 2)
  }

  test("PK table: Append mode upserts through the source") {
    val path = TestSpark.tmpDir("dsv1pk")
    Seq((1, "a", 1L), (2, "b", 1L)).toDF("k", "v", "seq")
      .write.format("graft")
      .option("primaryKeys", "k").option("sequence.field", "seq")
      .save(path)
    Seq((1, "a2", 2L)).toDF("k", "v", "seq")
      .write.format("graft").mode(SaveMode.Append).save(path)
    val rows = spark.read.format("graft").load(path)
      .orderBy("k").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.toSeq == Seq((1, "a2"), (2, "b")))
  }

  test("partition-key filters prune files at the manifest through the source") {
    val path = TestSpark.tmpDir("dsv1prune")
    (1 to 4).map(i => (s"p$i", i)).toDF("pt", "x")
      .write.format("graft").option("partitionKeys", "pt").save(path)
    val pruned = spark.read.format("graft").load(path).filter(col("pt") === "p2")
    assert(pruned.collect().map(_.getInt(1)).toSeq == Seq(2))
    val all = spark.read.format("graft").load(path)
    assert(pruned.rdd.getNumPartitions <= all.rdd.getNumPartitions)
  }

  test("mergeSchema write option evolves the table schema") {
    val path = TestSpark.tmpDir("dsv1merge")
    Seq((1, "a")).toDF("k", "v").write.format("graft").save(path)
    // extra column without mergeSchema → rejected (the V2 write path
    // surfaces it as Spark's AnalysisException at analysis time)
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq((2, "b", 2.5)).toDF("k", "v", "score")
        .write.format("graft").mode(SaveMode.Append).save(path)
    }
    assert(spark.read.format("graft").load(path).count() == 1) // unchanged
    Seq((2, "b", 2.5)).toDF("k", "v", "score")
      .write.format("graft").mode(SaveMode.Append).option("mergeSchema", "true").save(path)
    val rows = spark.read.format("graft").load(path).orderBy("k").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(rows(0).isNullAt(2) && rows(1).getDouble(2) == 2.5) // old file reads NULL
  }

  test("SaveMode.Overwrite on a fresh path just writes") {
    val path = TestSpark.tmpDir("dsv1ow")
    Seq((1, "a")).toDF("k", "v").write.format("graft").mode(SaveMode.Overwrite).save(path)
    assert(spark.read.format("graft").load(path).count() == 1)
  }

  test("partitionPrune/dataSkip toggles change the scan, never the answer") {
    val path = TestSpark.tmpDir("dsv1toggle")
    (1 to 4).map(i => (s"p$i", i.toLong)).toDF("pt", "x")
      .write.format("graft").option("partitionKeys", "pt").save(path)
    def q(opts: (String, String)*) = {
      var r = spark.read.format("graft")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.load(path).filter(col("pt") === "p2" && col("x") === 2L)
    }
    val on = q()
    val off = q("partitionPrune" -> "false", "dataSkip" -> "false")
    assert(on.collect().toSeq == off.collect().toSeq)
    assert(on.rdd.getNumPartitions <= off.rdd.getNumPartitions)
  }

  test("SQL functions registered via GraftExtensions") {
    // withExtensions only applies at session construction; use the
    // live-session registration path
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT poly_hash64('abc') ph, token_hash64('abc') th,
        |  sim_hash64(array(CAST(1 AS BIGINT))) sh,
        |  vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) vd,
        |  size(shingles3(array('a','b','c','d'))) ns""".stripMargin).first()
    assert(r.getLong(0) == ("abc".foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)))
    assert(r.getDouble(3) == 11.0)
    assert(r.getInt(4) == 2)
  }

  test("incremental-between read option emits only the APPEND delta (ref incremental-between)") {
    import graft.sources.GraftTable
    import org.apache.spark.sql.types._
    val path = TestSpark.tmpDir("incopt")
    val t = GraftTable.create(spark, path,
      StructType(Seq(StructField("k", IntegerType), StructField("b", IntegerType))))
    t.append(Seq((1, 1), (2, 1)).toDF("k", "b"))
    t.append(Seq((3, 2)).toDF("k", "b"))
    t.append(Seq((4, 3), (5, 3)).toDF("k", "b"))
    val inc = spark.read.format("graft")
      .option("incremental-between", "1,3").load(path)
    assert(inc.orderBy("k").collect().map(_.getInt(0)).toSeq == Seq(3, 4, 5))
    // column pruning + residual filters still apply above the delta
    val one = spark.read.format("graft")
      .option("incremental-between", "2,3").load(path)
      .select("k").filter(col("k") > 4)
    assert(one.collect().map(_.getInt(0)).toSeq == Seq(5))
    // a compaction between snapshots must not re-emit old rows
    t.compact()
    t.append(Seq((9, 9)).toDF("k", "b"))
    val afterCompact = spark.read.format("graft")
      .option("incremental-between", "3,5").load(path)
    assert(afterCompact.collect().map(_.getInt(0)).toSeq == Seq(9))
    // tag-name bounds (Paimon accepts tags — ids expire, tags survive)
    t.createTag("base", Some(1L))
    t.createTag("mid", Some(3L))
    val byTag = spark.read.format("graft")
      .option("incremental-between", "base,mid").load(path)
    assert(byTag.orderBy("k").collect().map(_.getInt(0)).toSeq == Seq(3, 4, 5))
    intercept[IllegalArgumentException] {
      spark.read.format("graft")
        .option("incremental-between", "nope,mid").load(path).collect()
    }
  }

  test("S62: incremental-between-timestamp resolves bounds by wall clock") {
    import graft.sources.GraftTable
    import org.apache.spark.sql.types._
    val path = TestSpark.tmpDir("inctsopt")
    val t = GraftTable.create(spark, path,
      StructType(Seq(StructField("k", IntegerType))))
    val ts0 = System.currentTimeMillis() - 1 // before any snapshot
    t.append(Seq(1, 2).toDF("k"))
    val ts1 = System.currentTimeMillis(); Thread.sleep(5)
    t.append(Seq(3).toDF("k"))
    t.append(Seq(4).toDF("k"))
    val ts2 = System.currentTimeMillis()
    def inc(a: Long, b: Long) = spark.read.format("graft")
      .option("incremental-between-timestamp", s"$a,$b").load(path)
      .collect().map(_.getInt(0)).sorted.toSeq
    // (stateAt(ts1), stateAt(ts2)] = snapshots 2 and 3
    assert(inc(ts1, ts2) == Seq(3, 4))
    // from before the first snapshot = from the beginning
    assert(inc(ts0, ts2) == Seq(1, 2, 3, 4))
    // to before the first snapshot = empty, not an error
    assert(inc(ts0 - 10, ts0) == Seq.empty)
    intercept[IllegalArgumentException] {
      spark.read.format("graft")
        .option("incremental-between-timestamp", s"$ts2,$ts1").load(path).collect()
    }
    intercept[IllegalArgumentException] {
      spark.read.format("graft")
        .option("incremental-between", "1,2")
        .option("incremental-between-timestamp", s"$ts1,$ts2").load(path).collect()
    }
  }
}
