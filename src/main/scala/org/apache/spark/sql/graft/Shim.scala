package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` surface: Column ⇄ catalyst
  * Expression conversion for the engine's native expressions
  * (graft.plans). Everything else of the engine lives in the `graft`
  * namespace; only this 2-method shim needs to sit inside
  * `org.apache.spark.sql` (same technique as every third-party
  * expression library, since Spark 4 made the converters package-
  * private). */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Column -> FULLY-CONVERTED catalyst tree. [[expression]] returns a
    * lazy `ColumnNodeExpression` wrapper whose children are still
    * sql-api ColumnNodes — fine for embedding in a plan, useless for
    * pattern-matching. This runs the classic converter eagerly, so
    * callers (the Lake stats pruner) see real `EqualTo`/`Literal`/
    * `UnresolvedAttribute` nodes. */
  def catalystTree(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Deep nullable relaxation (`StructType.asNullable` is
    * `private[spark]`) — `Lake.sqlTable` must expose the same
    * everything-nullable reading schema `spark.read.schema(...)`
    * produces, or the two read paths disagree on metadata. */
  def asNullable(s: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = s.asNullable

  /** Same relaxation for a single type (`DataType.asNullable` is
    * `private[spark]`) — UPDATE SET casts its value to the column's
    * type, and a scan-derived NOT NULL nested field must not make
    * that cast refuse a nullable-but-equal struct. */
  def asNullableType(t: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = t.asNullable

  /** The ForeachBatchSink move: wrap an already-planned incremental
    * execution's rdd as a BATCH logical plan, so a streaming sink can
    * hand its micro-batch to batch writers without re-analysis
    * (`LogicalRDD.fromDataset` is `private[sql]`). */
  def batchPlanOf(rdd: org.apache.spark.rdd.RDD[
        org.apache.spark.sql.catalyst.InternalRow],
      origin: org.apache.spark.sql.Dataset[_])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    org.apache.spark.sql.execution.LogicalRDD.fromDataset(rdd,
      origin.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]],
      isStreaming = false)

  /** The MemoryStream move, dual of [[batchPlanOf]]: wrap a BATCH
    * computation's planned rdd as a STREAMING logical plan, so a
    * `Source.getBatch` can return work computed through the batch
    * API (the change-feed diff joins would otherwise trip the
    * streaming unsupported-operations checker). */
  def streamingPlanOf(rdd: org.apache.spark.rdd.RDD[
        org.apache.spark.sql.catalyst.InternalRow],
      origin: org.apache.spark.sql.Dataset[_])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    org.apache.spark.sql.execution.LogicalRDD.fromDataset(rdd,
      origin.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]],
      isStreaming = true)

  /** LogicalPlan -> DataFrame (`Dataset.ofRows` went `private[sql]`
    * with the Spark 4 classic split). Used by `Lake.sqlTable` to
    * surface the [[org.apache.spark.sql.execution.datasources
    * .HadoopFsRelation]] it assembles over a lake snapshot. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
