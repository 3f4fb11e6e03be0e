package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All declared capabilities (SURVEY §2), each a Spark impl + optional
    * DuckDB oracle. A duplicate name would silently shadow a capability
    * in the toMaps below — fail fast instead. */
  lazy val allDefs: Seq[QDef] = {
    val defs = allDefsSeq
    val dups = defs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(",")}")
    defs
  }

  private def allDefsSeq: Seq[QDef] =
    operators.Relational.defs ++ operators.Relational2.defs ++ operators.Relational3.defs ++ operators.Temporal.defs ++ operators.GraftQueries.defs ++
      operators.TextOps.defs ++ operators.Dedup.defs ++ operators.Similarity.defs ++
      operators.Sketches.defs ++ operators.Packing.defs ++ operators.Indexing.defs ++
      operators.KMeansOp.defs ++ operators.Pipeline.defs ++ operators.Curation.defs ++
      operators.Dedup2.defs ++ operators.PcaOp.defs ++ operators.DedupIndex.defs ++
      operators.Multimodal.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
