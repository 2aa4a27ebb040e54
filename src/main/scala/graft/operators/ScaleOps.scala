package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Scale-posture techniques as runnable operators: skew salting and
  * partition-aware aggregation. These exist so the 100-TB strategies are
  * code with oracles, not just comments.
  */
object ScaleOps {

  /** Two-phase salted aggregation: when one group key dominates (skew),
    * pre-aggregate on (key, salt) so the hot key spreads over `salts`
    * reducers, then combine partials per key. Result is identical to the
    * direct group-by (sums/counts are associative) — which is exactly
    * what the oracle checks.
    */
  def saltedEventStats(spark: SparkSession, dir: String, salts: Int = 8): DataFrame =
    Tables.fanOut(Tables.events(spark, dir))
      .withColumn("salt", pmod(col("event_id"), lit(salts)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("value")).as("pv"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("pn")).as("n_events"),
        round(sum(col("pv")), 2).as("total_value"),
      )
      .orderBy(col("event_type"))
}
