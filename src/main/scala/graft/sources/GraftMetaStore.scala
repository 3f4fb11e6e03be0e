package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** S53: the catalog's METADATA backend seam — where databases/tables are
  * REGISTERED and how names resolve to locations. The reference accepts
  * exactly this split through `metastore` + `uri` catalog options (ref:
  * paimon-presto-common/src/main/java/org/apache/paimon/presto/
  * PaimonConfig.java:43-60 — `paimon.catalog.type` filesystem vs hive
  * metastore with a thrift uri); most production lakehouse deployments
  * resolve tables through an external metastore rather than warehouse
  * directory listings.
  *
  * Data placement is unchanged either way (`<warehouse>/<db>.db/<t>/`,
  * written by [[GraftTable]]); the backend only owns the name→location
  * mapping. The Hive backend additionally supports tables registered at
  * arbitrary locations (the external-table shape a shared HMS enables).
  */
trait GraftMetaStore {
  def createDatabase(db: String): Unit
  def databaseExists(db: String): Boolean
  /** Fails unless the database holds no tables. */
  def dropDatabase(db: String): Unit
  def listDatabases(): Seq[String]
  def registerTable(db: String, table: String, location: String): Unit
  def tableLocation(db: String, table: String): Option[String]
  def listTables(db: String): Seq[String]
  def unregisterTable(db: String, table: String): Unit
  def renameTable(db: String, from: String, to: String, newLocation: String): Unit
  def close(): Unit = ()
}

/** Filesystem-warehouse backend: the directory LAYOUT is the metastore —
  * a database is a `<db>.db` dir, a table is a child dir holding a graft
  * `schema/`; registration is implicit in the layout, so register/
  * unregister/rename are no-ops beyond what the catalog's data moves
  * already did. Zero external dependencies — the default, and the only
  * backend a bare object store needs. */
final class FsMetaStore(spark: SparkSession, warehouse: String) extends GraftMetaStore {
  private val fs = GraftTable.fileSystem(spark, warehouse)
  private def dbPath(db: String) = new Path(warehouse, s"$db.db")

  override def createDatabase(db: String): Unit = fs.mkdirs(dbPath(db))
  override def databaseExists(db: String): Boolean = fs.exists(dbPath(db))
  // registration is the layout itself: the catalog's emptiness guard +
  // recursive delete of the layout dir IS the unregistration
  override def dropDatabase(db: String): Unit = ()
  override def listDatabases(): Seq[String] =
    if (!fs.exists(new Path(warehouse))) Seq.empty
    else fs.listStatus(new Path(warehouse)).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.endsWith(".db")).map(_.stripSuffix(".db")).sorted

  override def registerTable(db: String, table: String, location: String): Unit = ()
  override def tableLocation(db: String, table: String): Option[String] = {
    val p = new Path(dbPath(db), table).toString
    if (GraftTable.exists(spark, p)) Some(p) else None
  }
  override def listTables(db: String): Seq[String] = {
    val p = dbPath(db)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => GraftTable.exists(spark, new Path(p, n).toString)).sorted
  }
  override def unregisterTable(db: String, table: String): Unit = ()
  override def renameTable(db: String, from: String, to: String, newLocation: String): Unit = ()
}

/** Hive-metastore backend: names resolve through an HMS thrift client —
  * `uri` for a remote metastore, or (uri absent) an EMBEDDED
  * Derby-backed metastore under `<warehouse>/.metastore` (the sandbox
  * stand-in for a real HMS; same client API either way, so the seam is
  * what a production deployment swaps, not the catalog). Tables register
  * as EXTERNAL with their graft root as the location — dropping the HMS
  * entry never deletes data (the catalog owns data deletion), and a
  * table may live OUTSIDE the warehouse layout. The stored Hive column
  * list is a stub: graft's schema (with field ids, PKs, options) lives
  * in the table dir's own schema/ log, the single source of truth —
  * mirroring how Paimon's HMS integration stores a marker table and
  * keeps the real schema in the table's snapshot store. */
final class HiveMetaStore(warehouse: String, uri: Option[String]) extends GraftMetaStore {
  import org.apache.hadoop.hive.conf.HiveConf
  import org.apache.hadoop.hive.metastore.HiveMetaStoreClient
  import org.apache.hadoop.hive.metastore.api.{AlreadyExistsException, Database, FieldSchema, NoSuchObjectException, SerDeInfo, StorageDescriptor, Table => HTable}
  import scala.jdk.CollectionConverters._

  private val conf = new HiveConf()
  uri match {
    case Some(u) => conf.setVar(HiveConf.ConfVars.METASTOREURIS, u)
    case None =>
      // embedded mode: one Derby db per warehouse, single-process by
      // Derby's nature — the CI/dev shape; production passes `uri`
      conf.setVar(HiveConf.ConfVars.METASTORECONNECTURLKEY,
        s"jdbc:derby:;databaseName=${warehouse.stripSuffix("/")}/.metastore;create=true")
  }
  conf.setVar(HiveConf.ConfVars.METASTOREWAREHOUSE, warehouse)
  conf.setBoolVar(HiveConf.ConfVars.METASTORE_SCHEMA_VERIFICATION, false)
  conf.setBoolVar(HiveConf.ConfVars.METASTORE_AUTO_CREATE_ALL, true)
  conf.set("datanucleus.schema.autoCreateAll", "true")
  // Hive 2.3 defaults to BoneCP, which Spark distributions do not ship
  conf.set("datanucleus.connectionPoolingType", "HikariCP")
  private val client = new HiveMetaStoreClient(conf)

  override def createDatabase(db: String): Unit =
    try client.createDatabase(
      new Database(db, "graft database", s"${warehouse.stripSuffix("/")}/$db.db", null))
    catch { case _: AlreadyExistsException => () }

  override def databaseExists(db: String): Boolean =
    try { client.getDatabase(db); true }
    catch { case _: NoSuchObjectException => false }

  override def dropDatabase(db: String): Unit = {
    require(listTables(db).isEmpty, s"database $db is not empty")
    client.dropDatabase(db, /*deleteData=*/ false, /*ignoreUnknownDb=*/ true,
      /*cascade=*/ false)
  }

  override def listDatabases(): Seq[String] =
    client.getAllDatabases.asScala.toSeq.filterNot(_ == "default").sorted

  override def registerTable(db: String, table: String, location: String): Unit = {
    val sd = new StorageDescriptor()
    sd.setCols(List(new FieldSchema("col", "string",
      "stub — graft schema lives in the table directory")).asJava)
    sd.setLocation(location)
    sd.setInputFormat("org.apache.hadoop.mapred.TextInputFormat")
    sd.setOutputFormat("org.apache.hadoop.hive.ql.io.HiveIgnoreKeyTextOutputFormat")
    sd.setSerdeInfo(new SerDeInfo(table,
      "org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe",
      new java.util.HashMap[String, String]()))
    val t = new HTable()
    t.setDbName(db)
    t.setTableName(table)
    t.setSd(sd)
    t.setTableType("EXTERNAL_TABLE")
    t.setPartitionKeys(new java.util.ArrayList[FieldSchema]())
    // a MUTABLE map: the HMS handler put()s quick-stats into it
    val params = new java.util.HashMap[String, String]()
    params.put("EXTERNAL", "TRUE")
    params.put("table_type", "GRAFT")
    t.setParameters(params)
    t.setCreateTime((System.currentTimeMillis() / 1000).toInt)
    t.setOwner("graft")
    client.createTable(t)
  }

  override def tableLocation(db: String, table: String): Option[String] =
    try Some(client.getTable(db, table).getSd.getLocation)
    catch { case _: NoSuchObjectException => None }

  override def listTables(db: String): Seq[String] =
    try client.getAllTables(db).asScala.toSeq.sorted
    catch { case _: NoSuchObjectException => Seq.empty }

  override def unregisterTable(db: String, table: String): Unit =
    client.dropTable(db, table, /*deleteData=*/ false, /*ignoreUnknownTab=*/ true)

  override def renameTable(db: String, from: String, to: String, newLocation: String): Unit = {
    val t = client.getTable(db, from)
    t.setTableName(to)
    t.getSd.setLocation(newLocation)
    client.alter_table(db, from, t)
  }

  override def close(): Unit = client.close()
}
