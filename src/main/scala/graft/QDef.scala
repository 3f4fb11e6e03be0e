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
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS) which Spark cannot read natively
    * (PARQUET_TYPE_ILLEGAL). Sessions set
    * spark.sql.legacy.parquet.nanosAsLong=true, so ts arrives as LongType
    * nanos; normalize to a microsecond TimestampType (truncating, same as
    * DuckDB's ns→µs read of the same file).
    */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts") match {
      case Some(f) if f.dataType == org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
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
}
