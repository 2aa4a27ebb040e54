package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables
import graft.operators.AdvancedOps
import graft.plans.AsOfOps

/** The custom whole-operator as-of join: logical node → strategy →
  * physical merge walk. Pinned three ways: the physical plan actually
  * contains AsOfJoinExec (the strategy fired, nothing fell back), the
  * matched rows equal an independent carry-forward window formulation,
  * and a hand-built micro case exercises every boundary (no match,
  * exact-tie time, superseded match, key change). */
class AsOfJoinPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001
  import spark.implicits._

  test("the strategy plans AsOfJoinExec, not a fallback join") {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").as("tsn"), col("event_type"), col("value"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tsn"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("tsn").as("c_tsn"))
    val out = AsOfOps.asof(p, c, "user_id", "tsn", "c_user", "c_tsn")
    // SparkPlan.nodeName strips the Exec suffix: the node prints "AsOfJoin"
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"strategy did not fire:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"fallback join crept in:\n$plan")
  }

  test("micro case: boundaries match hand-computed as-of semantics") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (3L, 9L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100L), (1L, 15L, 150L), (2L, 6L, 260L), (9L, 1L, 900L))
      .toDF("rk", "rt", "rv")
    val got = AsOfOps.asof(left, right, "k", "t", "rk", "rt")
      .select(col("tag"), col("rv"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got("a") === Some(100L)) // exact time tie joins (<=)
    assert(got("b") === Some(150L)) // superseding later match wins
    assert(got("c") === None)       // right row is in the future
    assert(got("d") === None)       // key has no right rows at all
  }

  test("matched pairs equal the carry-forward window formulation") {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").as("tsn"), col("event_type"), col("value"))
      .localCheckpoint()
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tsn"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("tsn").as("c_tsn"))
    val native = AsOfOps.asof(p, c, "user_id", "tsn", "c_user", "c_tsn")
      .select(col("user_id"), col("tsn"), col("c_tsn"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    // independent formulation: union both streams, carry the last click
    // time forward per user, read it off at each purchase
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tsn"), col("is_p"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val composed = e.filter(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), col("tsn"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("is_p"),
        when(col("event_type") === "click", col("tsn")).as("click_tsn"))
      .withColumn("last_click", last(col("click_tsn"), ignoreNulls = true).over(w))
      .filter(col("is_p") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(native === composed)
  }
}
