package graft

import graft.sources.GraftCatalog
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.1 S11 — metadata ops (ref: PrestoMetadata.java) — and S53:
  * the SAME flows must hold under both metastore backends (filesystem
  * layout-as-registry vs Hive metastore; ref PaimonConfig.java:43-60).
  * The hive backend runs an EMBEDDED Derby-backed HMS — the sandbox
  * stand-in for a remote `uri`. */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fsCatalog() = new GraftCatalog(spark, TestSpark.tmpDir("wh"))
  // ONE embedded HMS per suite: Derby allows a single in-process
  // connection per metastore db, so hive cases share a catalog+warehouse
  private lazy val hiveCatalog = new GraftCatalog(spark, TestSpark.tmpDir("hwh"),
    Map("metastore" -> "hive"))

  private def roundTrip(c: GraftCatalog, db: String): Unit = {
    c.createDatabase(db)
    assert(c.listDatabases().contains(db))

    val schema = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    c.createTable(db, "t1", schema)
    assert(c.listTables(db) == Seq("t1"))
    assert(c.tableExists(db, "t1"))

    c.getTable(db, "t1").append(Seq((1, "x")).toDF("a", "b"))
    assert(c.getTable(db, "t1").read().count() == 1)

    c.renameTable(db, "t1", "t2")
    assert(c.listTables(db) == Seq("t2"))
    assert(c.getTable(db, "t2").read().count() == 1)

    c.createTableAsSelect(db, "t3", Seq((1, 2L), (3, 4L)).toDF("x", "y"))
    assert(c.getTable(db, "t3").read().count() == 2)

    c.dropTable(db, "t2")
    c.dropTable(db, "t3")
    assert(c.listTables(db).isEmpty)
    c.dropDatabase(db)
    assert(!c.listDatabases().contains(db))
  }

  test("S11: create/list/drop schema and table; rename; CTAS") {
    roundTrip(fsCatalog(), "db1")
  }

  test("S11b: guards — duplicate create, missing db, occupied rename target") {
    val c = fsCatalog()
    c.createDatabase("db")
    val schema = StructType(Seq(StructField("a", IntegerType)))
    c.createTable("db", "t", schema)
    intercept[IllegalArgumentException](c.createTable("db", "t", schema))
    intercept[IllegalArgumentException](c.createTable("nope", "t", schema))
    c.createTable("db", "u", schema)
    intercept[IllegalArgumentException](c.renameTable("db", "t", "u"))
  }

  test("S53: the full S11 round-trip holds against the Hive metastore backend") {
    roundTrip(hiveCatalog, "hdb1")
  }

  test("S53b: HMS registration survives a fresh catalog VIEW; locations are authoritative") {
    val c = hiveCatalog
    c.createDatabase("hdb2")
    val schema = StructType(Seq(StructField("a", IntegerType)))
    c.createTable("hdb2", "t", schema)
    c.getTable("hdb2", "t").append(Seq(Tuple1(7)).toDF("a"))
    // resolution goes through HMS, not directory listing: a table
    // registered at an EXTERNAL location (outside <db>.db/) still loads
    val extLoc = TestSpark.tmpDir("hext")
    val ext = graft.sources.GraftTable.create(spark, extLoc,
      StructType(Seq(StructField("x", LongType))))
    ext.append(Seq(1L, 2L).toDF("x"))
    c.metaStore.registerTable("hdb2", "ext", extLoc)
    assert(c.listTables("hdb2") == Seq("ext", "t"))
    assert(c.getTable("hdb2", "ext").read().count() == 2)
    assert(c.tableExists("hdb2", "ext"))
    // dropping the external table removes data at its REGISTERED home
    c.dropTable("hdb2", "ext")
    assert(!graft.sources.GraftTable.exists(spark, extLoc))
    c.dropTable("hdb2", "t")
    c.dropDatabase("hdb2")
  }

  test("S53c: unsupported metastore kind fails loudly") {
    intercept[IllegalArgumentException] {
      new GraftCatalog(spark, TestSpark.tmpDir("badwh"), Map("metastore" -> "glue"))
    }
  }
}
