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
}
