package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor; the bridge
  * lives in `private[sql]` classic.ExpressionUtils. This shim re-exports it
  * for graft's custom Catalyst expressions (standard pattern for libraries
  * shipping native expressions). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** analyzed logical plan of a DataFrame (for custom LogicalPlan nodes) */
  def planOf(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** DataFrame over a custom LogicalPlan (classic Dataset.ofRows) */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Batch rows re-tagged as a STREAMING frame — the V1
    * `Source.getBatch` contract (the returned frame must carry
    * `isStreaming = true`, as FileStreamSource does); the batch plan is
    * evaluated into its InternalRow form and wrapped. */
  def asStreamingFrame(spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }

  /** Legacy (V1 Source) long offset — `runtime.LongOffset` is
    * `private[sql]` territory in Spark 4. */
  def longOffset(v: Long)
      : org.apache.spark.sql.execution.streaming.Offset =
    org.apache.spark.sql.execution.streaming.runtime.LongOffset(v)
}
