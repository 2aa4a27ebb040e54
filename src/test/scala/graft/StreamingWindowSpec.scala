package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ST-5 in actual streaming mode: event-time tumbling windows with a
  * watermark under append output — finalized windows only emit once the
  * watermark passes, late data beyond it is dropped. (The same window
  * expressions are oracle-checked in batch via q_window_*.) */
class StreamingWindowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2025-01-01 10:$minute%02d:00")

  test("watermarked tumbling window finalizes and drops too-late events") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("win_start"), col("n"), col("total"))
    val q = agg.writeStream.format("memory").queryName("winagg")
      .outputMode("append").start()
    try {
      // batch 1: two events in [10:00,10:05), one in [10:05,10:10)
      input.addData((ts(0), 1.0), (ts(1), 2.0), (ts(6), 4.0))
      q.processAllAvailable()
      // append mode: nothing finalized yet (watermark at 10:06-10:00... still open)
      // batch 2: advance event time far enough to close the first windows
      input.addData((ts(30), 8.0))
      q.processAllAvailable()
      // batch 3: a straggler older than the watermark — must be dropped
      input.addData((ts(1), 100.0))
      q.processAllAvailable()
      input.addData((ts(45), 16.0))
      q.processAllAvailable()
      val rows = spark.table("winagg").collect()
        .map(r => r.getAs[Timestamp]("win_start").toString -> ((r.getAs[Long]("n"), r.getAs[Double]("total"))))
        .toMap
      assert(rows("2025-01-01 10:00:00.0") === ((2L, 3.0)),
        s"straggler leaked into a finalized window: $rows")
      assert(rows("2025-01-01 10:05:00.0") === ((1L, 4.0)))
      // the 10:30 window closed when event time reached 10:45
      assert(rows.contains("2025-01-01 10:30:00.0"))
    } finally q.stop()
  }

  test("watermarked session window merges gap-joined events and finalizes per user") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val agg = input.toDF().toDF("user", "ts")
      .withWatermark("ts", "10 minutes")
      // 5-minute gap: events closer than the gap merge into one session,
      // and the session interval is [first, last + gap)
      .groupBy(session_window(col("ts"), "5 minutes"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user"), col("n"))
    val q = agg.writeStream.format("memory").queryName("sesswin")
      .outputMode("append").start()
    try {
      // u1: 10:00, 10:03, 10:06 chain into ONE session (each gap < 5 min);
      // u2: 10:00 alone
      input.addData(("u1", ts(0)), ("u1", ts(3)), ("u1", ts(6)), ("u2", ts(0)))
      q.processAllAvailable()
      // advance the watermark past every session's close
      input.addData(("u3", ts(45)))
      q.processAllAvailable()
      val rows = spark.table("sesswin").collect()
        .map(r => r.getAs[String]("user") ->
          ((r.getAs[Timestamp]("s_start").toString,
            r.getAs[Timestamp]("s_end").toString,
            r.getAs[Long]("n"))))
        .toMap
      // one merged session per user, end = last event + gap
      assert(rows("u1") === (("2025-01-01 10:00:00.0", "2025-01-01 10:11:00.0", 3L)),
        s"session chain did not merge: $rows")
      assert(rows("u2") === (("2025-01-01 10:00:00.0", "2025-01-01 10:05:00.0", 1L)))
      assert(!rows.contains("u3"), "open session must not emit in append mode")
    } finally q.stop()
  }
}
