package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
