package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{ScoredPost, SubredditState}

class StatefulOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("state accumulates across micro-batches per subreddit") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[ScoredPost]
    val out = StatefulOps.runningSubredditStats(spark, input.toDS())
    val q = out.writeStream.format("memory").queryName("substats")
      .outputMode("update").start()
    try {
      input.addData(ScoredPost("depression", 40), ScoredPost("depression", 20),
        ScoredPost("anxiety", 0))
      q.processAllAvailable()
      input.addData(ScoredPost("depression", 100))
      q.processAllAvailable()
      val rows = spark.table("substats")
        .groupBy("subreddit").max("posts", "total_risk", "high_risk")
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(rows("depression") === ((3L, 160L, 2L)))
      assert(rows("anxiety") === ((1L, 0L, 0L)))
    } finally q.stop()
  }

  test("update function is pure: fold semantics without a stream") {
    // GroupState is stream-bound; exercise the arithmetic via the typed
    // API on a one-key batch instead.
    val stats = StatefulOps.updateSubreddit(
      "s", Iterator(ScoredPost("s", 30), ScoredPost("s", 10)),
      new TestGroupState(None)).toSeq
    assert(stats.head.posts === 2 && stats.head.total_risk === 40
      && stats.head.high_risk === 1 && stats.head.avg_risk === 20.0)
    val carried = StatefulOps.updateSubreddit(
      "s", Iterator(ScoredPost("s", 100)),
      new TestGroupState(Some(SubredditState(2, 40, 1)))).toSeq
    assert(carried.head.posts === 3 && carried.head.total_risk === 140
      && carried.head.high_risk === 2)
  }
}

/** Minimal GroupState stub for pure-function testing. */
class TestGroupState[S](initial: Option[S])
    extends org.apache.spark.sql.streaming.GroupState[S] {
  private var v: Option[S] = initial
  override def exists: Boolean = v.isDefined
  override def get: S = v.get
  override def getOption: Option[S] = v
  override def update(newState: S): Unit = v = Some(newState)
  override def remove(): Unit = v = None
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(durationMs: Long): Unit = ()
  override def setTimeoutDuration(duration: String): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
