package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `classic.Dataset.ofRows` for the engine's custom logical
  * plans (the [[graft.plans.AsOfJoinNode]] family). `ofRows` is
  * `private[sql]`, so the one-line accessor lives in this package — the
  * standard pattern OSS Spark extensions (GraphFrames, Sedona) use to
  * hand a hand-built `LogicalPlan` back to the public Dataset API.
  * Nothing else belongs in this file: every other entry point the engine
  * uses is public API.
  */
object GraftPlanBuilder {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Register a planner strategy on an existing session (idempotent) —
    * `experimental.extraStrategies` is the public injection point for
    * sessions not built through `SparkSessionExtensions`. */
  def addStrategy(spark: SparkSession, s: execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
  }
}
