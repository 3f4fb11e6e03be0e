package graft

import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins: two graft tables bucketed the same way
  * join with ZERO Exchange — the scan reports KeyGroupedPartitioning
  * over the catalog-resolved `bucket` transform and Spark aligns the
  * per-bucket splits directly (the V2 analogue of the co-located bucket
  * join Paimon's bucketed LSM layout exists for). */
class SpjSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.spj", "graft.sources.GraftSparkCatalog")
    s.conf.set("spark.sql.catalog.spj.warehouse", TestSpark.tmpDir("spj-wh"))
    s.sql("CREATE NAMESPACE IF NOT EXISTS spj.db")
    s
  }

  private def withSpjConfs(body: => Unit): Unit = {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("SPJ1: co-bucketed append tables join with zero Exchange") {
    spark.sql("CREATE TABLE spj.db.fact (k INT, amt BIGINT) PARTITIONED BY (bucket(4, k))")
    spark.sql("CREATE TABLE spj.db.dim (k INT, label STRING) PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO spj.db.fact VALUES (1, 10), (2, 20), (3, 30), (1, 5)")
    spark.sql("INSERT INTO spj.db.dim VALUES (1, 'one'), (2, 'two'), (3, 'three'), (4, 'four')")
    withSpjConfs {
      val joined = spark.sql(
        """SELECT f.k, sum(f.amt) AS amt, max(d.label) AS label
          |FROM spj.db.fact f JOIN spj.db.dim d ON f.k = d.k
          |GROUP BY f.k""".stripMargin)
      val rows = joined.collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).sortBy(_._1)
      assert(rows.toSeq == Seq((1, 15L, "one"), (2, 20L, "two"), (3, 30L, "three")))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected a shuffle-free SPJ plan, got:\n$plan")
    }
  }

  test("SPJ2: co-bucketed PK tables merge-on-read AND join with zero Exchange") {
    spark.sql(
      """CREATE TABLE spj.db.pka (k INT, v STRING, seq BIGINT)
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('primary-key'='k', 'sequence.field'='seq', 'bucket-key'='k')""".stripMargin)
    spark.sql(
      """CREATE TABLE spj.db.pkb (k INT, w STRING)
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('primary-key'='k', 'bucket-key'='k')""".stripMargin)
    spark.sql("INSERT INTO spj.db.pka VALUES (1, 'old', 1), (2, 'b', 1)")
    spark.sql("INSERT INTO spj.db.pka VALUES (1, 'new', 2)") // upsert
    spark.sql("INSERT INTO spj.db.pkb VALUES (1, 'x'), (2, 'y')")
    withSpjConfs {
      val joined = spark.sql(
        "SELECT a.k, a.v, b.w FROM spj.db.pka a JOIN spj.db.pkb b ON a.k = b.k")
      val rows = joined.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).sortBy(_._1)
      assert(rows.toSeq == Seq((1, "new", "x"), (2, "b", "y"))) // MOR winner joined
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected a shuffle-free SPJ plan, got:\n$plan")
    }
  }

  test("SPJ3: the conf off, results identical (grouping is opt-in only)") {
    val q = """SELECT f.k, d.label FROM spj.db.fact f JOIN spj.db.dim d ON f.k = d.k"""
    val off = spark.sql(q).collect().map(_.toString).sorted.toSeq
    withSpjConfs { assert(spark.sql(q).collect().map(_.toString).sorted.toSeq == off) }
  }

  test("SPJ5: a pre-rescale snapshot never claims the new bucket layout (S42 guard)") {
    val path = TestSpark.tmpDir("spjrescale")
    val t = graft.sources.GraftTable.create(spark, path,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("amt", org.apache.spark.sql.types.LongType))),
      options = Map("bucket" -> "2", "bucket-key" -> "k"))
    import spark.implicits._
    t.append((1 to 8).map(i => (i, i.toLong)).toDF("k", "amt"))
    val pre = t.latestSnapshotId.get
    t.rescaleBucket(4)
    withSpjConfs {
      // path-based loads have no function catalog to bind the bucket
      // transform, so assert the SCAN's claim (what a catalog-resolved
      // plan would consume), not the physical node's
      def claims(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
        }.exists {
          case s: org.apache.spark.sql.connector.read.SupportsReportPartitioning =>
            s.outputPartitioning().isInstanceOf[
              org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]
          case _ => false
        }
      // current snapshot: files written under the current layout → claim on
      val cur = spark.read.format("graft").load(path)
      assert(claims(cur), "current snapshot must claim bucket partitioning")
      // pre-rescale snapshot: files are OLD-hash — a claim keyed on the
      // new count would mis-align a storage-partitioned join
      val old = spark.read.format("graft")
        .option("snapshotId", pre.toString).load(path)
      assert(!claims(old), "pre-rescale snapshot must not claim the new layout")
      assert(old.count() == 8 && cur.count() == 8)
    }
  }

  test("SPJ4: bucket function answers SELECT through the catalog") {
    // the same function SPJ binds is user-callable; must agree with the
    // library's bucketOf
    val t = graft.sources.GraftTable.load(spark,
      spark.conf.get("spark.sql.catalog.spj.warehouse") + "/db.db/fact")
    val viaSql = spark.sql("SELECT spj.bucket(4, 7)").first().getInt(0)
    assert(viaSql == t.bucketOf(Seq(7)))
  }
}
