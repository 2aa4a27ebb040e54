package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables
import graft.operators.{EntityOps, MlOps, PrivacyOps, TimeWindowOps}

/** Behavioral invariants for the privacy / entity-resolution /
  * time-series-smoothing tier — accounting identities and bounds the
  * row-hash oracle can't state. */
class Round11OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("pseudonymizedActivity conserves events and never leaks a raw id") {
    val out = PrivacyOps.pseudonymizedActivity(spark, dir).localCheckpoint()
    val nEvents = Tables.events(spark, dir).count()
    val nUsers = Tables.events(spark, dir).select(col("user_id")).distinct().count()
    assert(out.agg(sum(col("n_events"))).head().getLong(0) === nEvents)
    // keyed-hash pseudonyms: one per user, no collisions at this scale,
    // and no pseudonym is a bare decimal id
    assert(out.count() === nUsers)
    assert(out.filter(col("pid").rlike("^[0-9]+$")).count() === 0L)
  }

  test("kAnonymityCells releases counts only at k>=5 distinct users") {
    val cells = PrivacyOps.kAnonymityCells(spark, dir).localCheckpoint()
    assert(cells.filter(col("released") && col("n_users") < 5).count() === 0L)
    assert(cells.filter(!col("released") && col("released_rows").isNotNull).count() === 0L)
    // released rows never exceed the corpus; suppression withholds, not invents
    val released = cells.agg(sum(col("released_rows"))).head().getLong(0)
    assert(released <= Tables.events(spark, dir).count())
  }

  test("fuzzyPartPairs emits ordered pairs within the edit budget") {
    val pairs = EntityOps.fuzzyPartPairs(spark, dir).localCheckpoint()
    assert(pairs.count() > 0)
    assert(pairs.filter(col("a_key") >= col("b_key")).count() === 0L)
    assert(pairs.filter(col("dist") > 3 || col("dist") < 0).count() === 0L)
    assert(pairs.filter(col("sim") <= 0 || col("sim") > 1).count() === 0L)
    // blocked join: every emitted pair shares its blocking noun
    val diffNoun = pairs.filter(
      element_at(split(col("a_name"), " "), 2) =!=
        element_at(split(col("b_name"), " "), 2))
    assert(diffNoun.count() === 0L)
  }

  test("snmNearDupPairs stays above threshold with unique ordered pairs") {
    val pairs = EntityOps.snmNearDupPairs(spark, dir).localCheckpoint()
    assert(pairs.filter(col("a_id") >= col("b_id")).count() === 0L)
    assert(pairs.filter(col("jaccard") < 0.6 || col("jaccard") > 1.0).count() === 0L)
    assert(pairs.count() === pairs.select(col("a_id"), col("b_id")).distinct().count())
  }

  test("ewmaDaily starts at the observed count and stays inside the window range") {
    val out = TimeWindowOps.ewmaDaily(spark, dir).localCheckpoint()
    val first = out.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("day"))))
      .filter(col("rn") === 1)
    assert(first.filter(abs(col("ewma") - col("cnt")) > 1e-6).count() === 0L)
    // a convex average of counts can never leave the global [min,max] band
    val (lo, hi) = {
      val r = out.agg(min(col("cnt")), max(col("cnt"))).head()
      (r.getLong(0).toDouble, r.getLong(1).toDouble)
    }
    assert(out.filter(col("ewma") < lo - 1e-6 || col("ewma") > hi + 1e-6).count() === 0L)
  }

  test("ohlcDaily keeps open/close inside [low, high] and conserves rows") {
    val out = TimeWindowOps.ohlcDaily(spark, dir).localCheckpoint()
    assert(out.filter(
      col("open") < col("low") || col("open") > col("high") ||
        col("close") < col("low") || col("close") > col("high")).count() === 0L)
    assert(out.agg(sum(col("n"))).head().getLong(0) ===
      Tables.events(spark, dir).count())
  }

  test("logisticStep's one step improves on the w=0 loss") {
    val r = MlOps.logisticStep(spark, dir).head()
    val loss = r.getAs[Double]("log_loss")
    val acc = r.getAs[Double]("acc")
    // at w = 0 the log-loss is exactly ln 2; a full-batch gradient step
    // with this lr must not end above it on the training set
    assert(loss > 0.0 && loss <= math.log(2.0) + 1e-9)
    assert(acc >= 0.0 && acc <= 1.0)
  }
}
