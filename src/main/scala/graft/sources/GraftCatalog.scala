package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Warehouse-level metadata operations — the re-expression of the
  * reference's ConnectorMetadata surface (ref: paimon-presto-common/src/
  * main/java/org/apache/paimon/presto/PrestoMetadata.java:
  * listSchemaNames / listTables / createSchema / dropSchema / createTable
  * / dropTable / renameTable / beginCreateTable+finishCreateTable).
  *
  * Layout: `<warehouse>/<db>.db/<table>/` — same convention as the
  * reference's test warehouse (TestPrestoITCase.java:89).
  */
class GraftCatalog(spark: SparkSession, warehouse: String) {
  private val fs = GraftTable.fileSystem(spark, warehouse)

  private def dbPath(db: String) = new Path(warehouse, s"$db.db")
  private def tablePath(db: String, t: String) = new Path(dbPath(db), t)

  def createDatabase(db: String): Unit = fs.mkdirs(dbPath(db))
  def databaseExists(db: String): Boolean = fs.exists(dbPath(db))
  def dropDatabase(db: String): Unit = {
    // guard on ANY child entry, not just recognized graft tables — a
    // half-created or foreign directory must block the recursive delete
    require(!fs.exists(dbPath(db)) || fs.listStatus(dbPath(db)).isEmpty,
      s"database $db is not empty")
    fs.delete(dbPath(db), true)
  }
  def listDatabases(): Seq[String] =
    if (!fs.exists(new Path(warehouse))) Seq.empty
    else fs.listStatus(new Path(warehouse)).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.endsWith(".db")).map(_.stripSuffix(".db")).sorted

  def createTable(
      db: String,
      table: String,
      schema: StructType,
      partitionKeys: Seq[String] = Seq.empty,
      primaryKeys: Seq[String] = Seq.empty,
      options: Map[String, String] = Map.empty): GraftTable = {
    require(databaseExists(db), s"no such database: $db")
    GraftTable.create(spark, tablePath(db, table).toString, schema, partitionKeys, primaryKeys, options)
  }

  /** CTAS (ref: PrestoMetadata.beginCreateTable/finishCreateTable). */
  def createTableAsSelect(
      db: String,
      table: String,
      df: DataFrame,
      partitionKeys: Seq[String] = Seq.empty,
      options: Map[String, String] = Map.empty): GraftTable = {
    val t = createTable(db, table, df.schema, partitionKeys, Seq.empty, options)
    t.append(df)
    t
  }

  def getTable(db: String, table: String): GraftTable =
    GraftTable.load(spark, tablePath(db, table).toString)

  def tableExists(db: String, table: String): Boolean =
    GraftTable.exists(spark, tablePath(db, table).toString)

  def listTables(db: String): Seq[String] = {
    val p = dbPath(db)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => GraftTable.exists(spark, new Path(p, n).toString)).sorted
  }

  /** Parse a reference-style scan_version spec: either a bare version
    * ("3") applying to any table, or a pipe-separated list of
    * "db.table.version" entries from which the matching table's version
    * is picked (ref: PrestoSessionProperties SCAN_VERSION and
    * TestPrestoITCase.testFilterWithTimeTravelAndTableOptions —
    * "default.t1.1|default.t2.1"). Returns None when no entry applies. */
  def parseScanVersion(spec: String, db: String, table: String): Option[Long] = {
    val entries = spec.split("[|]").map(_.trim).filter(_.nonEmpty)
    entries.flatMap { e =>
      e.split("\\.") match {
        case Array(v) => v.toLongOption
        case Array(d, t, v) if d == db && t == table => v.toLongOption
        case _ => None
      }
    }.headOption
  }

  /** Load a table as of a scan_version spec (see [[parseScanVersion]]);
    * a non-matching spec reads the latest version, like the reference. */
  def readTableAsOf(db: String, table: String, scanVersion: String)
      : org.apache.spark.sql.DataFrame = {
    val t = getTable(db, table)
    t.read(snapshotId = parseScanVersion(scanVersion, db, table))
  }

  def dropTable(db: String, table: String): Unit =
    fs.delete(tablePath(db, table), true)

  def renameTable(db: String, from: String, to: String): Unit = {
    require(!tableExists(db, to), s"table $db.$to already exists")
    if (!fs.rename(tablePath(db, from), tablePath(db, to)))
      throw new IllegalStateException(s"rename $db.$from -> $db.$to failed")
  }
}
