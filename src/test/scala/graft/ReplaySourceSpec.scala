package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Pipeline

class ReplaySourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def post(id: String, title: String, text: String): String =
    s"""{"id":"$id","title":"$title","text":"$text","author":"u","subreddit":"s","created_utc":1.0,"score":1,"num_comments":0,"url":"","timestamp":"2025-01-01T00:00:00"}"""

  test("DSv2 replay source feeds the pipeline in rowsPerBatch micro-batches") {
    val spool = Files.createTempFile("spool", ".jsonl")
    Files.writeString(spool, Seq(
      post("a", "feeling depressed", "and hopeless"),
      post("b", "nice day", "sunshine"),
      post("c", "panic attack", "so scared"),
    ).mkString("\n"))
    val raw = spark.readStream
      .format("graft.sources.ReplaySourceProvider")
      .option("path", spool.toString)
      .option("rowsPerBatch", "2")
      .load()
    val q = Pipeline.process(raw).writeStream
      .format("memory").queryName("replayed").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("replayed").collect()
        .map(r => r.getAs[String]("id") -> r.getAs[Int]("risk_score")).toMap
      assert(rows === Map("a" -> 20, "b" -> 0, "c" -> 20))
    } finally q.stop()
  }

  test("429 control line triggers backoff cycles then resumes; marker never emitted") {
    val spool = Files.createTempFile("spool429", ".jsonl")
    Files.writeString(spool, Seq(
      post("a", "t", "x"), post("b", "t", "x"),
      graft.sources.ReplaySourceProvider.RateLimitMarker,
      post("c", "t", "x"),
    ).mkString("\n"))
    // unit-level state machine: offsets advance 2 (posts) → 3 (the 429
    // itself) → stall, stall (backoff) → 4 (resume)
    val stream = new graft.sources.ReplayMicroBatchStream(
      spool.toString, rowsPerBatch = 2, backoffCycles = 2)
    val offsets = (1 to 5).map(_ => stream.latestOffset().json().toLong)
    assert(offsets === Seq(2L, 3L, 3L, 3L, 4L), s"backoff sequence wrong: $offsets")
    // the consumed range containing the marker must not emit it
    val part = stream.planInputPartitions(
      graft.sources.ReplayOffset(2L), graft.sources.ReplayOffset(4L))
    val emitted = part.head.asInstanceOf[graft.sources.ReplayPartition].rows.toSeq
    assert(emitted === Seq(post("c", "t", "x")), s"marker leaked: $emitted")
  }
}
