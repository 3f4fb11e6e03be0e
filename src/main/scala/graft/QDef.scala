package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query capability: a Spark implementation plus (when
  * SQL-expressible) a DuckDB oracle over the same parquet tables.
  * Column names/types must match between the two (driver hash-compares).
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Reads pass an explicit (memoized) schema: Spark's parquet schema
    * inference launches a small footer-reading job per `.load`, so an
    * operator that builds several frames would pay several plan-time
    * jobs per query. With the cache, inference runs once per table per
    * JVM; the corpus directories are immutable inputs. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val sch = schemaCache.computeIfAbsent(path, p => spark.read.parquet(p).schema)
    spark.read.schema(sch).parquet(path)
  }

  /** events.ts has shipped in two parquet vintages: TIMESTAMP(NANOS)
    * (which Spark cannot read natively — PARQUET_TYPE_ILLEGAL — so
    * sessions set spark.sql.legacy.parquet.nanosAsLong=true and ts
    * arrives as LongType nanos) and TIMESTAMP(MICROS) isAdjustedToUTC=
    * false (which Spark reads as TimestampNTZType). Normalize BOTH to a
    * microsecond TimestampType: truncate nanos the way DuckDB's ns→µs
    * read does, and cast NTZ→TZ (the session timezone is pinned UTC, so
    * the underlying epoch-micros are identical). Downstream temporal
    * operators (unix_micros at Temporal.scala) require TimestampType.
    */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts") match {
      case Some(f) if f.dataType == org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case Some(f) if f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = {
    // ensure the session can read TIMESTAMP(NANOS) parquet even when the
    // caller didn't set the conf (it is runtime-settable)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(t(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  private val rowCountCache = new java.util.concurrent.ConcurrentHashMap[String, Long]()

  /** Table row count from parquet footer metadata — a DRIVER-side
    * metadata read, no Spark job, no file-data scan. At 100 TB an extra
    * plan-time `df.count()` is a full scan of the corpus per query;
    * footers (like graft manifest rowCounts) already carry the answer.
    * Memoized per path (the corpus directories are immutable inputs). */
  def metadataRowCount(s: SparkSession, dir: String, name: String): Long =
    rowCountCache.computeIfAbsent(s"$dir/$name.parquet", { path =>
      val conf = s.sessionState.newHadoopConf()
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(conf)
      def files(st: org.apache.hadoop.fs.FileStatus): Seq[org.apache.hadoop.fs.FileStatus] =
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.flatMap(files)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st) else Seq.empty
      files(fs.getFileStatus(root)).map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
        try r.getRecordCount finally r.close()
      }.sum
    })
}
