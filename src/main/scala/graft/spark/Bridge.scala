// Lives under org.apache.spark.sql so it can reach the private[sql]
// Column <-> Expression converters (org.apache.spark.sql.classic
// .ExpressionUtils) — the standard pattern for Spark extension libraries.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Drain the async listener bus: scheduler-counter snapshots (Bench's
    * per-query jobs/stages/tasks record) must see every event already
    * delivered, or counts bleed into the next query's delta. private[spark]
    * API reached via the bridge package; the timeout raises
    * TimeoutException instead of hanging a wedged bus. */
  def drainListenerBus(spark: SparkSession, timeoutMs: Long): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)

  /** Full ColumnNode-tree conversion — needed for Columns COMPOSED from
    * `functions._` builders (struct/getField/when/…), which `expression`
    * only wraps lazily and the analyzer then can't type. */
  def composedExpression(c: Column): Expression =
    ColumnNodeToExpressionConverter.apply(c.node)

  /** Plan → DataFrame on an existing session (private[sql] Dataset.ofRows). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-root `df` as a [[org.apache.spark.sql.execution.LogicalRDD]] over
    * its own executed UnsafeRow RDD — the share-one-exchange device the
    * optimizer cannot provide (round-10 finding: column pruning splits a
    * "shared" explicit repartition into per-consumer exchanges, each
    * re-executing the whole upstream).
    *
    * Two properties do the work:
    *  1. every consumer's plan scans the SAME RDD instance, so its shuffle
    *     dependency is registered once and the DAGScheduler skips the map
    *     stage (= the entire upstream) in every job after the first — true
    *     compute-once sharing with no persist()/cache() left behind
    *     (shuffle files are cleaned with the RDD, same as any exchange);
    *  2. the LogicalRDD leaf is opaque to the optimizer, so consumers that
    *     prune columns read fewer columns from the shuffle OUTPUT instead
    *     of re-planning a narrower shuffle INPUT.
    *
    * `fromDataset` preserves the executed plan's output partitioning and
    * ordering (exprId-rewritten), so a consumer clustered on the same keys
    * plans no further exchange. Cost: none beyond the exchange the caller
    * already planned — toRdd builds the RDD without converting rows.
    *
    * Eagerness: under AQE, building the RDD materializes the plan's query
    * stages at construction time. The materialization therefore runs
    * inside its own `ExecTuning.withSizedAqe` scope here — the same
    * split-size policy the caller's later action would have applied (the
    * r11 first cut ran the eager stages at the session-default 4 MB
    * splits, outside any caller conf scope, which cost the narrow paths
    * more than the recompute they saved). Without AQE the RDD executes
    * lazily at action time like any plan. */
  def rddBarrier(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val plan = graft.spark.ExecTuning.withSizedAqe(df) {
      org.apache.spark.sql.execution.LogicalRDD
        .fromDataset(ds.queryExecution.toRdd, ds, isStreaming = false)
    }
    ofRows(df.sparkSession, plan)
  }
}
