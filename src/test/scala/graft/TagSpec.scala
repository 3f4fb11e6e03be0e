package graft

import graft.sources.GraftTable
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.1 S27: tag management — named snapshot pins that survive
  * expiry (ref: Paimon TagManager; read via scan.tag-name / VERSION AS OF). */
class TagSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", IntegerType), StructField("v", StringType)))

  test("create/list/read tags; VERSION AS OF accepts a tag name") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("tag-basic"), schema)
    val s1 = t.append(Seq((1, "a")).toDF("k", "v"))
    t.createTag("release-1")
    t.append(Seq((2, "b")).toDF("k", "v"))
    t.createTag("release-2")

    val listed = t.system("tags").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(listed.toSeq == Seq(("release-1", s1), ("release-2", s1 + 1)))

    // read by tag option = the pinned version
    val viaTag = spark.read.format("graft").option("tag", "release-1").load(t.root)
    assert(viaTag.collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(t.read().count() == 2)

    intercept[IllegalArgumentException] { t.snapshotForTag("nope") }
    intercept[IllegalArgumentException] { t.createTag("release-1") } // duplicate
  }

  test("VERSION AS OF resolves tag names through the catalog") {
    val wh = TestSpark.tmpDir("tag-wh")
    spark.conf.set("spark.sql.catalog.tagc", "graft.sources.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.tagc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tagc.db")
    spark.sql("CREATE TABLE tagc.db.t (k INT, v STRING)")
    spark.sql("INSERT INTO tagc.db.t VALUES (1, 'a')")
    GraftTable.load(spark, s"$wh/db.db/t").createTag("v1")
    spark.sql("INSERT INTO tagc.db.t VALUES (2, 'b')")
    val rows = spark.sql("SELECT k FROM tagc.db.t VERSION AS OF 'v1'")
      .collect().map(_.getInt(0))
    assert(rows.toSeq == Seq(1))
    assert(spark.sql("SELECT k FROM tagc.db.t").count() == 2)
  }

  test("expiry never reclaims tagged snapshots; deleting the tag frees them") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("tag-exp"), schema)
    val s1 = t.append(Seq((1, "a")).toDF("k", "v"))
    t.createTag("keep", Some(s1))
    (2 to 5).foreach(i => t.append(Seq((i, s"v$i")).toDF("k", "v")))

    val expired = t.expireSnapshots(retainLast = 1)
    assert(!expired.contains(s1), "tagged snapshot must not expire")
    // the tagged version is still fully readable (files + manifests intact)
    assert(t.read(snapshotId = Some(s1)).collect().map(_.getInt(0)).toSeq == Seq(1))

    // untagged old snapshots really did expire
    assert(expired.nonEmpty)
    intercept[Exception] { t.read(snapshotId = Some(expired.head)).collect() }

    // dropping the tag releases the pin: the next expiry reclaims it
    assert(t.deleteTag("keep"))
    val expired2 = t.expireSnapshots(retainLast = 1)
    assert(expired2.contains(s1))
    intercept[Exception] { t.read(snapshotId = Some(s1)).collect() }
    // latest state survives throughout
    assert(t.read().count() == 5)
  }

  test("S32: rollbackTo undoes later commits without destroying history") {
    import org.apache.spark.sql.types._
    val t = GraftTable.create(spark, TestSpark.tmpDir("rollback"),
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType))))
    val s1 = t.append(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    t.createTag("good", Some(s1))
    t.append(Seq((3, "c")).toDF("k", "v"))
    t.append(Seq((4, "d")).toDF("k", "v"))
    assert(t.read().count() == 4)

    val rb = t.rollbackToTag("good")
    assert(rb == 4L && t.snapshots.last.commitKind == "OVERWRITE")
    assert(t.read().orderBy("k").collect().map(_.getInt(0)).toSeq == Seq(1, 2))
    // every snapshot is still readable — rollback is a commit, not a purge
    assert(t.read(snapshotId = Some(2L)).count() == 3)
    assert(t.read(snapshotId = Some(3L)).count() == 4)
    // writing after a rollback continues from the restored state
    t.append(Seq((9, "z")).toDF("k", "v"))
    assert(t.read().orderBy("k").collect().map(_.getInt(0)).toSeq == Seq(1, 2, 9))
    // expiry then reclaims the undone files without touching live ones
    t.expireSnapshots(retainLast = 2)
    assert(t.read().count() == 3)
    intercept[IllegalArgumentException](t.rollbackTo(99L))
  }
}
