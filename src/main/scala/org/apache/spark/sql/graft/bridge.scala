package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor; the classic
  * bridge lives behind `private[sql]`. This shim (in the sql package
  * namespace, the sanctioned extension-library pattern) re-exposes the two
  * conversions custom Catalyst expressions need.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)

  /** V2 Predicate → V1 Filter translation (SupportsDeleteV2 receives V2
    * predicates; the manifest layer speaks V1 filters) — re-exposes the
    * private[sql] PredicateUtils. */
  def predicatesToV1(
      ps: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Array[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils.toV1(ps)

  /** Clone a session: an isolated copy of the SQLConf (and session state)
    * sharing the SparkContext — re-exposes the private[sql] cloneSession.
    * Used to build row-based reader factories without flipping
    * enableVectorizedReader on the LIVE conf (which races concurrent
    * scans — a streaming micro-batch planning columnar during the flip
    * window fails with `UnsafeRow cannot be cast to ColumnarBatch`). */
  def cloneSession(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** The RDD backing a localCheckpoint'd Dataset (a LogicalRDD plan).
    * Dataset.unpersist goes through the CacheManager, which does NOT
    * track localCheckpoint blocks — freeing them before the
    * ContextCleaner gets around to it needs the RDD itself. Unpersisting
    * truncately-checkpointed RDDs destroys their only copy, so callers
    * must be done with the frame. */
  def checkpointRdd(df: org.apache.spark.sql.DataFrame)
      : Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
      case _ => None
    }

  /** Re-tag a batch DataFrame as streaming — what V1 streaming sources
    * (FileStreamSource et al.) do via the private[sql]
    * internalCreateDataFrame; MicroBatchExecution asserts
    * isStreaming=true on every getBatch result. */
  def asStreaming(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val classic = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The reverse re-tag: a V1 Sink's addBatch receives a STREAMING
    * micro-batch frame whose plan batch writers refuse (the batch
    * UnsupportedOperationChecker rejects streaming sources); wrapping
    * the already-planned incremental toRdd as a batch frame is what
    * FileStreamSink effectively does with its own execution. */
  def asBatch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val classic = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
