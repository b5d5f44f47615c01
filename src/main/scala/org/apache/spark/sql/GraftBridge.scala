package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's package-private Column ↔ Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so graft's custom
  * Catalyst expressions can be exposed as user-facing Columns without
  * going through the SQL parser.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a hand-constructed logical plan (used by
    * graft's custom operators, e.g. ApproxHammingJoin). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Eager local checkpoint that also RETURNS the row count of the
    * materialization. `Dataset.localCheckpoint(eager = true)` runs an
    * internal `rdd.count()` and throws the number away, so iterative
    * fixpoint loops that need per-round emptiness/progress checks
    * (BFS frontiers, star rounds) pay a second whole job per round
    * for a number Spark already computed. Mirrors the checkpoint
    * implementation exactly: copy rows (toRdd reuses row objects),
    * mark for local checkpoint, count (which materializes), then wrap
    * the materialized RDD as a LogicalRDD leaf via the same
    * `fromDataset` the built-in path uses — lineage truncation and
    * block-manager behavior identical to `localCheckpoint(true)`. */
  def localCheckpointWithCount(df: DataFrame): (DataFrame, Long) = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    val cnt = rdd.count()
    val logical = org.apache.spark.sql.execution.LogicalRDD
      .fromDataset(rdd, ds, isStreaming = false)
    (classic.Dataset.ofRows(ds.sparkSession, logical), cnt)
  }
}
