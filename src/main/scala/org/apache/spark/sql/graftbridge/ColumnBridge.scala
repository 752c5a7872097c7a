package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Public face of the `private[sql]` V1-streaming-fallback hook
  * (`V2TableWithV1Fallback`, the Delta pattern — DeltaTableV2 implements it
  * from inside the sql package namespace for the same reason): a DSv2 table
  * that implements it routes `writeStream.toTable` and `readStream.table`
  * onto its V1 provider (our path-addressed stream sink/source) via the
  * table's metastore entry, instead of Spark refusing with a
  * missing-STREAMING_WRITE capability error. Only the streaming resolution
  * paths consult it — batch stays DSv2.
  */
trait V1FallbackTable
    extends org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback

/** Extractor for the metastore entry backing a catalog-resolved table —
  * `V1Table` is `private[sql]` too.
  */
object CatalogBridge {
  def v1TableOf(t: org.apache.spark.sql.connector.catalog.Table)
      : Option[org.apache.spark.sql.catalyst.catalog.CatalogTable] = t match {
    case v1: org.apache.spark.sql.connector.catalog.V1Table => Some(v1.v1Table)
    case f: org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback => Some(f.v1Table)
    case _ => None
  }
}

/** Spark 4 made the Expression↔Column conversions package-private
  * (`org.apache.spark.sql.classic.ExpressionUtils`); this bridge lives in
  * the sql package namespace to re-export the two functions custom
  * expressions need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ColumnNode→Expression conversion. `expression` wraps the column
    * as a lazy ColumnNodeExpression leaf, which only the Dataset API's
    * analysis path unwraps — a FunctionRegistry builder (injectFunction)
    * must return a REAL expression tree or the analyzer leaves
    * UnresolvedFunction nodes inside the opaque leaf and execution dies
    * with INTERNAL_ERROR "Cannot evaluate expression".
    */
  def expressionTree(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** DataFrame over an already-analyzed logical plan (`Dataset.ofRows` is
    * private[sql] in Spark 4) — used by the MERGE rewrite to execute the
    * statement's resolved source plan as the engine batch input.
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-root a batch DataFrame as a streaming micro-batch: the V1 streaming
    * `Source.getBatch` contract demands `isStreaming = true`, and the
    * sanctioned wrapper is a LogicalRDD over the batch plan's own execution
    * RDD (what FileStreamSource does). Lazy — nothing runs until the
    * micro-batch executes.
    */
  def asStreamingFrame(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val logical = org.apache.spark.sql.execution.LogicalRDD
      .fromDataset(ds.queryExecution.toRdd, ds, isStreaming = true)
    org.apache.spark.sql.classic.Dataset.ofRows(ds.sparkSession, logical)
  }

  /** The inverse re-root, for a V1 streaming Sink: the DataFrame handed to
    * `Sink.addBatch` is backed by the micro-batch's IncrementalExecution
    * and cannot be fed to ordinary batch writers directly — wrap its
    * executed RDD as a batch LogicalRDD (what ForeachBatchSink does) so the
    * engine's write paths can run any number of jobs over it.
    */
  def asBatchFrame(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val logical = org.apache.spark.sql.execution.LogicalRDD
      .fromDataset(ds.queryExecution.toRdd, ds, isStreaming = false)
    org.apache.spark.sql.classic.Dataset.ofRows(ds.sparkSession, logical)
  }
}
