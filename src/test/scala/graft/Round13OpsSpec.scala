package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral invariants for the round-13 tier (versioned-table change
  * feed and its streaming face) — properties the DuckDB oracle can't
  * state directly. */
class Round13OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("changeFeed nets to exactly the v0→v2 snapshot transition") {
    val feed = graft.operators.ScaleOps.changeFeed(spark, dir).collect()
    val docs = graft.model.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))

    // inserts must be the v2 snapshot (the quality re-freeze), deletes
    // the v0 snapshot (the md5 train subset) — v1's append cancels.
    val ins = docs.filter(col("n_chars") >= 300)
      .groupBy(col("source")).agg(count(lit(1)).as("n"), sum(col("n_chars")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val del = docs
      .filter(substring(md5(col("doc_id").cast("string")), 1, 1) <= "b")
      .groupBy(col("source")).agg(count(lit(1)).as("n"), sum(col("n_chars")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    def side(tag: String) = feed.filter(_.getString(0) == tag)
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(side("insert") === ins, "insert side is not the v2 snapshot")
    assert(side("delete") === del, "delete side is not the v0 snapshot")
    assert(feed.map(_.getString(0)).toSet === Set("insert", "delete"))
  }

  test("versionedScan rides the DSv2 batch scan and matches a direct recompute") {
    val q = graft.operators.ScaleOps.versionedScan(spark, dir)
    assert(q.queryExecution.executedPlan.toString.contains("BatchScan"),
      "the registry query must go through the custom DSv2 batch path")
    val got = q.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val want = graft.model.Tables.documents(spark, dir)
      .filter(col("n_chars") >= 300 && col("doc_id") < 250)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("c"),
        min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .orderBy(col("source")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got === want)
  }
}
