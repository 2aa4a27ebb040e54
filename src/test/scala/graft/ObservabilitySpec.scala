package graft

import org.apache.spark.sql.{Observation, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables

/** The observe()/Observation surface — engine-side telemetry that rides
  * inside a job instead of re-running it: a pipeline publishes row
  * counts, null rates, and domain aggregates from the SAME pass that
  * produces its output (the reference's dashboard polls exactly these
  * numbers; here they cost zero extra scans). Batch metrics come back
  * through Observation; streaming metrics surface per micro-batch in the
  * query progress. */
class ObservabilitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("batch observe: data-quality metrics from the output pass itself") {
    val obs = Observation("docs_quality")
    val out = Tables.documents(spark, SparkTestSession.sf0001)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("text").isNull || col("text") === "", 1L).otherwise(0L))
          .as("n_empty_text"),
        sum(col("n_chars")).as("total_chars"))
      .filter(col("n_chars") > 0)
    val produced = out.count()
    val m = obs.get
    // the metrics describe the observed point in the plan (pre-filter),
    // from the same job that produced the output
    assert(m("n_rows").asInstanceOf[Long] >= produced)
    assert(m("n_empty_text").asInstanceOf[Long] === 0L)
    assert(m("total_chars").asInstanceOf[Long] > 0L)
  }

  test("streaming observe: per-micro-batch metrics in the query progress") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Int)]
    val out = input.toDF().toDF("id", "risk")
      .observe("batch_stats",
        count(lit(1)).as("n"),
        sum(when(col("risk") >= 30, 1L).otherwise(0L)).as("n_high"))
    val q = out.writeStream.format("memory").queryName("observed")
      .outputMode("append").start()
    try {
      input.addData((1L, 10), (2L, 40), (3L, 50))
      q.processAllAvailable()
      val m = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("batch_stats"))).lastOption
      assert(m.isDefined, "no observed metrics in query progress")
      val row = m.get.asInstanceOf[Row]
      assert(row.getAs[Long]("n") === 3L)
      assert(row.getAs[Long]("n_high") === 2L)
    } finally q.stop()
  }
}
