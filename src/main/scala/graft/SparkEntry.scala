package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All declared capabilities (SURVEY §2), each a Spark impl + optional
    * DuckDB oracle. */
  def allDefs: Seq[QDef] =
    operators.Relational.defs ++ operators.Relational2.defs ++ operators.Temporal.defs ++ operators.GraftQueries.defs ++
      operators.TextOps.defs ++ operators.Dedup.defs ++ operators.Similarity.defs ++
      operators.Sketches.defs ++ operators.Packing.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
