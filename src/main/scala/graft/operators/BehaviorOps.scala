package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** User-behavior analytics over the event stream: conversion funnel and
  * retention cohorts — the two aggregate shapes every product-analytics
  * stack derives from the same (user, type, time) event log the
  * reference's pipeline produces (reference: kafka_producer emits
  * per-post events; dashboard/app.py aggregates per request).
  *
  * Timestamps compare at MICROSECOND granularity on both engines: the
  * parquet column is TIMESTAMP(NANOS) (Spark reads it as an epoch-nanos
  * long, DuckDB truncates to µs on read), so `ts div 1000` here and
  * `epoch_ns(ts) // 1000` in the oracle floor to the same µs value and
  * no ordering can flip on sub-µs digits.
  */
object BehaviorOps {

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.fanOut(Tables.events(spark, dir))
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("ts_us"))

  /** Conversion funnel view → click → purchase, strictly ordered in
    * time per user: stage N counts users whose earliest stage-N event
    * happens AFTER their earliest qualifying stage-(N-1) event. Each
    * stage is one hash aggregate keyed on user plus one equi-join on
    * user against the (already user-unique) previous stage — at scale
    * every shuffle key is user_id and every joined side is one row per
    * surviving user, so the funnel narrows the data monotonically.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val firstView = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("first_view"))
    val firstClick = e.filter(col("event_type") === "click")
      .join(firstView, Seq("user_id"))
      .filter(col("ts_us") > col("first_view"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("first_click"))
    val firstPurchase = e.filter(col("event_type") === "purchase")
      .join(firstClick, Seq("user_id"))
      .filter(col("ts_us") > col("first_click"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("first_purchase"))
    def stage(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
    stage(firstView, "1_view")
      .unionByName(stage(firstClick, "2_click"))
      .unionByName(stage(firstPurchase, "3_purchase"))
      .orderBy(col("stage"))
  }

  /** Click-through rate by hour of day: one conditional aggregate over
    * the event log, keyed by a 24-value derived column — the canonical
    * time-dimension rollup. The ratio divides the two conditional counts
    * AFTER aggregation (exact int64s → one double division per output
    * row, identical cross-engine).
    */
  def ctrByHour(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .withColumn("hour", expr("(ts_us div 3600000000) % 24"))
      .groupBy(col("hour"))
      .agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("views"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicks"),
      )
      .withColumn("ctr", round(col("clicks") /
        when(col("views") === 0, null).otherwise(col("views")), 6))
      .orderBy(col("hour"))

  /** Retention cohorts: users bucketed by their first-active day, then
    * distinct active users per (cohort day, day offset). Two shuffles —
    * one on user_id for the cohort assignment, one on the (cohort,
    * offset) cell for the distinct count — both on bounded keys; the
    * per-user day set is deduped BEFORE the join so the join input is
    * user-days, not raw events.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val days = ev(spark, dir)
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .distinct()
    val cohorts = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    days.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }
}
