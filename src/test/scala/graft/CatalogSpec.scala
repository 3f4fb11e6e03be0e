package graft

import graft.sources.GraftCatalog
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.1 S11 — metadata ops (ref: PrestoMetadata.java). */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def catalog() = new GraftCatalog(spark, TestSpark.tmpDir("wh"))

  test("S11: create/list/drop schema and table; rename; CTAS") {
    val c = catalog()
    c.createDatabase("db1")
    assert(c.listDatabases() == Seq("db1"))

    val schema = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    c.createTable("db1", "t1", schema)
    assert(c.listTables("db1") == Seq("t1"))
    assert(c.tableExists("db1", "t1"))

    c.getTable("db1", "t1").append(Seq((1, "x")).toDF("a", "b"))
    assert(c.getTable("db1", "t1").read().count() == 1)

    c.renameTable("db1", "t1", "t2")
    assert(c.listTables("db1") == Seq("t2"))
    assert(c.getTable("db1", "t2").read().count() == 1)

    c.createTableAsSelect("db1", "t3", Seq((1, 2L), (3, 4L)).toDF("x", "y"))
    assert(c.getTable("db1", "t3").read().count() == 2)

    c.dropTable("db1", "t2")
    c.dropTable("db1", "t3")
    assert(c.listTables("db1").isEmpty)
    c.dropDatabase("db1")
    assert(c.listDatabases().isEmpty)
  }

  test("S11b: guards — duplicate create, missing db, occupied rename target") {
    val c = catalog()
    c.createDatabase("db")
    val schema = StructType(Seq(StructField("a", IntegerType)))
    c.createTable("db", "t", schema)
    intercept[IllegalArgumentException](c.createTable("db", "t", schema))
    intercept[IllegalArgumentException](c.createTable("nope", "t", schema))
    c.createTable("db", "u", schema)
    intercept[IllegalArgumentException](c.renameTable("db", "t", "u"))
  }
}
