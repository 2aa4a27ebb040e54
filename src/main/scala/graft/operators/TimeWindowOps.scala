package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Event-time window extensions (SURVEY.md §2.9 ST-5: absent in the
  * reference, required capability). Exercised in batch mode over
  * events.ts so each has a DuckDB oracle via epoch arithmetic; the same
  * window()/session_window() expressions drive the streaming pipeline in
  * graft.streaming.
  *
  * events.ts arrives as epoch-nanos LongType (see Tables.events); all
  * windows are computed on whole epoch seconds (`ts div 1e9`) so Spark and
  * the oracle floor identically.
  */
object TimeWindowOps {

  /** events + ts_s (epoch seconds, long) + tstamp (TimestampType). */
  def eventsWithTime(spark: SparkSession, dir: String): DataFrame =
    Tables.fanOut(Tables.events(spark, dir))
      .withColumn("ts_s", expr("ts div 1000000000"))
      .withColumn("tstamp", timestamp_seconds(col("ts_s")))

  /** Tumbling 1-hour windows per event type — the canonical
    * `window($"ts", "1 hour")` group-by. Window start emitted as epoch
    * seconds for oracle comparison.
    */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    eventsWithTime(spark, dir)
      .groupBy(window(col("tstamp"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(
        unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("total_value"),
      )
      .orderBy(col("win_start"), col("event_type"))

  /** Sliding windows: 2-hour size, 1-hour slide — every event lands in
    * exactly two windows. */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    eventsWithTime(spark, dir)
      .groupBy(window(col("tstamp"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(
        unix_timestamp(col("window.start")).as("win_start"),
        col("n"), col("total_value"),
      )
      .orderBy(col("win_start"))

  /** Truncated EWMA over the per-type daily event volume — the smoothing
    * pass behind every "trend vs today" dashboard tile. alpha = 1/2 with
    * a 20-day horizon, computed as a single RANGE-free windowed sum:
    * weights are powers of two, so `sum(cnt·2^i)` stays EXACT integer
    * arithmetic (≪ 2^53) and the one terminal division is deterministic
    * cross-engine — no recursive per-row state, no ulp drift from
    * accumulating tiny float weights. The window is partitioned by
    * event_type; the day dimension is bounded (days ≪ events), so the
    * per-partition sort is trivially safe at any corpus scale.
    */
  def ewmaDaily(spark: SparkSession, dir: String, horizon: Int = 20): DataFrame = {
    val daily = BehaviorOps.typeDaily(spark, dir)
      .select(col("event_type"), col("day"), col("n").as("cnt"))
    val byDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val frame = byDay.rowsBetween(-(horizon - 1), Window.currentRow)
    daily
      .withColumn("i", row_number().over(byDay))
      .withColumn("ewma",
        round(
          sum(col("cnt") * pow(lit(2.0), col("i"))).over(frame)
            / pow(lit(2.0), col("i") + 1)
            / (lit(1.0) - pow(lit(0.5), least(col("i"), lit(horizon)))),
          6))
      .select(col("event_type"), col("day"), col("cnt"), col("ewma"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Daily OHLC + self-weighted mean per event type — the candlestick
    * rollup over the `value` stream. Open/close are order statistics on
    * event time with the event id as a total-order tie-break
    * (`min_by`/`max_by` over a (ts, event_id) struct — one hash agg, no
    * window), so the result is deterministic even under timestamp
    * collisions. vwap weights each value by itself (sum v² / sum v) —
    * the standard volume-weighted form with value standing in for both
    * price and size in this schema.
    */
  def ohlcDaily(spark: SparkSession, dir: String): DataFrame =
    Tables.fanOut(Tables.events(spark, dir))
      .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
      .agg(
        round(min_by(col("value"), struct(col("ts"), col("event_id"))), 6).as("open"),
        round(max(col("value")), 6).as("high"),
        round(min(col("value")), 6).as("low"),
        round(max_by(col("value"), struct(col("ts"), col("event_id"))), 6).as("close"),
        count(lit(1)).as("n"),
        round(sum(col("value") * col("value")) / sum(col("value")), 6).as("vwap"),
      )
      .orderBy(col("event_type"), col("day"))

  /** Session windows with a 30-minute inactivity gap, per user.
    * A new session starts when the gap to the previous event is >= the
    * timeout (session_window's interval is half-open [start, last+gap)).
    * Emits min/max event second rather than window.end to keep the oracle
    * formulation gap-free.
    */
  def sessions(spark: SparkSession, dir: String): DataFrame =
    eventsWithTime(spark, dir)
      .groupBy(session_window(col("tstamp"), "30 minutes"), col("user_id"))
      .agg(
        min(col("ts_s")).as("session_start"),
        max(col("ts_s")).as("session_last"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"),
      )
      .select(col("user_id"), col("session_start"), col("session_last"),
        col("n_events"), col("total_value"))
      .orderBy(col("user_id"), col("session_start"))
}
