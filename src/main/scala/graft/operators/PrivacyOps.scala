package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Privacy-preserving export operators — the release gate a telemetry /
  * training corpus passes through before leaving the trust boundary.
  * The reference pipeline ships raw author/user identifiers straight to
  * its dashboard (reference: spark_jobs/kafka_consumer_simple.py:128-140
  * keeps `author` verbatim in the serving record); a production engine
  * needs the two standard mitigations as first-class relational ops:
  *
  *  - pseudonymization: replace the identifier with a stable keyed hash
  *    so longitudinal joins still work but the raw id never leaves;
  *  - k-anonymity suppression: generalize quasi-identifiers into coarse
  *    cells and suppress any cell observed for fewer than k distinct
  *    users before counts are released.
  *
  * Both are single-scan group-bys (partial aggregation map-side, one
  * shuffle on the release key), so the shapes are 100-TB-safe; nothing
  * is collected, and the pepper is a literal baked into the plan (in a
  * real deployment it arrives via a secret store, never a data column).
  */
object PrivacyOps {

  private val Pepper = "pepper"

  /** Stable pseudonym for a user id: keyed md5, truncated to 64 bits.
    * Truncation keeps the release join-friendly while the pepper keeps
    * a rainbow table over the (tiny) id domain useless.
    */
  private def pseudo(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring(md5(concat_ws("|", lit(Pepper), id.cast("string"))), 1, 16)

  /** Pseudonymized per-user activity export: events keyed by the hashed
    * user id, values generalized to 50-unit bands. One hash agg on the
    * pseudonym — the hash is computed map-side, so the raw user_id never
    * even crosses the shuffle.
    */
  def pseudonymizedActivity(spark: SparkSession, dir: String): DataFrame =
    BehaviorOps.eventSeq(spark, dir)
      .select(
        pseudo(col("user_id")).as("pid"),
        col("event_type"),
        (floor(col("value") / 50.0).cast("long") * 50L).as("value_band"),
      )
      .groupBy(col("pid"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        min(col("value_band")).as("min_band"),
        max(col("value_band")).as("max_band"),
      )
      .orderBy(col("pid"))

  /** k-anonymity cell census over the quasi-identifier
    * (event_type, hour-of-day, value-centile band): every cell reports
    * its distinct-user support, and cells below k=5 users are marked
    * suppressed with their row count withheld (null) in the released
    * column. The distinct-user count per cell is the only wide piece and
    * shuffles (cell, user) pairs once.
    */
  def kAnonymityCells(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    BehaviorOps.eventSeq(spark, dir)
      .select(
        col("event_type"),
        (expr("ts_ns div 3600000000000") % 24).as("hr"),
        floor(col("value") / 100.0).cast("long").as("vband"),
        col("user_id"),
      )
      .groupBy(col("event_type"), col("hr"), col("vband"))
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("user_id")).as("n_users"))
      .select(
        col("event_type"), col("hr"), col("vband"), col("n_users"),
        (col("n_users") >= k).as("released"),
        when(col("n_users") >= k, col("n_rows")).as("released_rows"),
      )
      .orderBy(col("event_type"), col("hr"), col("vband"))

  /** Cumulative probability thresholds of the truncated two-sided
    * geometric distribution with α = 1/2, scaled to a grain of
    * 3 × 2^20 so every band edge is an EXACT integer: P(0) = 1/3 of the
    * grain, then each ±k band takes grain/(3·2^k). Outcome order is
    * 0, +1, −1, +2, −2, …, ±10; the 2048-grain tail beyond ±10 clips
    * to 0. */
  private val GeomGrain = 3L * (1L << 20)
  private val geomBands: Seq[(Long, Long)] = {
    var cum = GeomGrain / 3
    val bands = Seq.newBuilder[(Long, Long)]
    bands += ((cum, 0L))
    for (k <- 1 to 10) {
      val s = (GeomGrain / 3) >> k
      cum += s; bands += ((cum, k.toLong))
      cum += s; bands += ((cum, -k.toLong))
    }
    bands.result()
  }

  /** Differentially-private count release via the (truncated) two-sided
    * GEOMETRIC mechanism — the discrete analogue of the Laplace
    * mechanism, ε = ln 2 per released cell at sensitivity 1. The draw is
    * an integer inverse-CDF walk over exact integer thresholds
    * ([[geomBands]]), fed by a keyed-md5 48-bit value reduced mod
    * 3·2^20 — a power-of-two domain can't divide the grain exactly, so
    * the reduction carries a modulo bias, kept negligible by the width
    * (band probabilities off by ≤ 2^-28; a 32-bit draw would already be
    * off by 2^-12 on P(0)). No floating-point log/exp ever enters, so
    * the released value is exact 64-bit arithmetic on any engine and
    * any partitioning. (A real
    * deployment keys the draw with a secret nonce per release; here the
    * key is the cell label so the oracle can replay it.) Noise is
    * per-CELL, post-aggregation — one map-side-combined count per type,
    * then O(1) work per released row — so the mechanism costs nothing
    * at 100 TB. The realized |noise| and a ≤0.5%-relative-error audit
    * column ship with the release, the sketch-audit convention. */
  def dpCountRelease(spark: SparkSession, dir: String): DataFrame = {
    val u = (conv(substring(md5(concat(lit("dp:"), col("event_type"))), 1, 12),
      16, 10).cast("long") % GeomGrain).as("u")
    val noise = geomBands.reverse.foldLeft(lit(0L)) { case (els, (hi, k)) =>
      when(col("u") < hi, lit(k)).otherwise(els)
    }
    Tables.fanOut(Tables.events(spark, dir).select(col("event_type")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("true_n"))
      .withColumn("u", u)
      .withColumn("k", noise)
      .select(
        col("event_type"), col("true_n"),
        (col("true_n") + col("k")).as("noisy_n"),
        abs(col("k")).as("abs_err"),
        (abs(col("k")) * 200 <= col("true_n")).as("within_half_pct"),
      )
      .orderBy(col("event_type"))
  }
}
