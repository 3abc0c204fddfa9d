package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` plan constructors, so graft's custom logical
  * operators (graft.plans.*) can surface as ordinary DataFrames. Lives in
  * the org.apache.spark.sql package solely for access; contains no logic. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].logicalPlan

  def addStrategy(spark: SparkSession,
      s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s)) {
      cs.experimental.extraStrategies =
        cs.experimental.extraStrategies :+ s
    }
  }

  def addOptimization(spark: SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraOptimizations.contains(r)) {
      cs.experimental.extraOptimizations =
        cs.experimental.extraOptimizations :+ r
    }
  }

  /** Materialize what a SparkSessionExtensions module would inject —
    * `build*` accessors are `private[sql]`, this exposes them to tests. */
  def buildExtensionParts(f: SparkSessionExtensions => Unit,
      spark: SparkSession): (Seq[org.apache.spark.sql.execution.SparkStrategy],
        Seq[org.apache.spark.sql.catalyst.rules.Rule[
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]]) = {
    val exts = new SparkSessionExtensions
    f(exts)
    val cs = spark.asInstanceOf[classic.SparkSession]
    (exts.buildPlannerStrategies(cs), exts.buildOptimizerRules(cs))
  }
}
