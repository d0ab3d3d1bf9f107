package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion — Spark 4
  * moved Column onto ColumnNode, and wrapping a custom Catalyst
  * Expression requires `classic.ExpressionUtils`. Standard pattern for
  * extension libraries shipping native expressions. */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Column → catalyst expression EAGERLY converted (not the lazy
    * `ColumnNodeExpression` wrapper `expression` returns): the SQL
    * function-registry path inserts the builder's result straight
    * into an analyzing plan, where the lazy wrapper is Unevaluable
    * and nothing ever converts it. The converter emits catalyst
    * `UnresolvedFunction` children, which the fixed-point analyzer
    * then resolves like any parsed SQL. Used by `registerAll`'s
    * Column-chain registrations (url_canonicalize & co). */
  def resolvableExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Wrap a LogicalPlan as a DataFrame (private[sql] Dataset.ofRows). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def logicalPlan(df: org.apache.spark.sql.Dataset[_])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].logicalPlan

  /** Materialize a DataFrame into a persisted InternalRow RDD behind a
    * FLAT plan (LogicalRDD) and hand back the RDD so the caller can
    * `unpersist()` it deterministically. `Dataset.localCheckpoint`
    * gives the same flat plan but leaves block cleanup to driver GC /
    * ContextCleaner — an iterative loop that materializes per round
    * would otherwise accumulate O(rounds) copies of its working set.
    * NOT eager: run an action (e.g. `handle.count()`) to materialize. */
  def materializedWithHandle(df: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame,
         org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]) = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val spark = ds.sparkSession
    val qe = ds.queryExecution
    // copy(): toRdd rows are reused buffers; persisting without a copy
    // stores aliased rows
    val rdd = qe.toRdd.map(_.copy())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val plan = org.apache.spark.sql.execution.LogicalRDD(
      qe.analyzed.output, rdd)(spark)
    (ofRows(spark, plan), rdd)
  }

  /** Block until the listener bus has delivered every queued event
    * (`private[spark]` LiveListenerBus.waitUntilEmpty). Task-metric
    * probes read SparkListener counters right after a job returns, but
    * onTaskEnd events are delivered asynchronously — without a drain,
    * the final straggler task (exactly the number a skew probe exists
    * to record) can still be in flight and get dropped from the
    * artifact. */
  def drainListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(30000L)
}
