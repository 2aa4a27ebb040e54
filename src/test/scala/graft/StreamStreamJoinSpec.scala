package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join with watermarks on both sides — the
  * streaming twin of the batch as-of join: purchases match clicks by the
  * same user within the preceding 10 minutes, and both state stores are
  * evictable because the join condition bounds event-time on each side.
  */
class StreamStreamJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2025-01-01 10:$minute%02d:00")

  test("purchases join clicks by user within a bounded event-time interval") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp)]
    val c = clicks.toDF().toDF("c_user", "c_ts").withWatermark("c_ts", "10 minutes")
    val p = purchases.toDF().toDF("p_user", "p_ts").withWatermark("p_ts", "10 minutes")
    val joined = p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts(0)), (2L, ts(1)))
      purchases.addData((1L, ts(5)), (2L, ts(20)), (3L, ts(6)))
      q.processAllAvailable()
      // advance both watermarks so results finalize
      clicks.addData((9L, ts(40)))
      purchases.addData((9L, ts(41)))
      q.processAllAvailable()
      val rows = spark.table("ssjoin").collect()
        .map(r => (r.getAs[Long]("p_user"), r.getAs[Timestamp]("c_ts").toString))
      // user 1: click at 10:00 within [09:55,10:05] of purchase -> match
      // user 2: click at 10:01 is 19 min before purchase at 10:20 -> no match
      // user 3: no clicks -> no match
      assert(rows.count(_._1 == 1L) === 1)
      assert(!rows.exists(_._1 == 2L))
      assert(!rows.exists(_._1 == 3L))
    } finally q.stop()
  }

  test("left outer: unmatched purchases emit a null click only after the watermark closes the window") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp)]
    val c = clicks.toDF().toDF("c_user", "c_ts").withWatermark("c_ts", "10 minutes")
    val p = purchases.toDF().toDF("p_user", "p_ts").withWatermark("p_ts", "10 minutes")
    // outer stream-stream joins REQUIRE the event-time bound: it is what
    // lets the engine prove a purchase can no longer match and emit its
    // null row exactly once, instead of holding state forever
    val joined = p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES"),
      "leftOuter")
    val q = joined.writeStream.format("memory").queryName("ssjoin_outer")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts(0)))
      purchases.addData((1L, ts(5)), (2L, ts(6)))
      q.processAllAvailable()
      def rows() = spark.table("ssjoin_outer").collect()
        .map(r => (r.getAs[Long]("p_user"), Option(r.getAs[Timestamp]("c_ts"))))
      // user 1 matches immediately; user 2's null result MUST NOT have
      // been emitted yet — a click inside its window could still arrive
      assert(rows().toSeq === Seq((1L, Some(ts(0)))))
      // advance both watermarks well past user 2's join window
      clicks.addData((9L, ts(40)))
      purchases.addData((9L, ts(41)))
      q.processAllAvailable()
      val afterClose = rows().filter(_._1 == 2L)
      assert(afterClose.toSeq === Seq((2L, None)),
        "the unmatched purchase emits exactly one null-padded row after window close")
    } finally q.stop()
  }
}
