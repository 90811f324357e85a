package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset.ofRows constructor — the way
  * a library turns a hand-built LogicalPlan (e.g. the native as-of
  * join node) back into a public DataFrame in Spark 4.x. Lives in an
  * org.apache.spark.sql subpackage solely for access; contains no
  * logic (same pattern as [[ColumnBridge]]). */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Make sure `strategy` is active on this session: normally injected
    * by GraftExtensions at build time; sessions built without the
    * extensions get it appended to `experimental.extraStrategies`. */
  def ensureStrategy(spark: SparkSession,
                     strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.sessionState.planner.strategies.contains(strategy) &&
        !cs.experimental.extraStrategies.contains(strategy))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ strategy
  }
}
