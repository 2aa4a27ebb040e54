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

  test("transformWithState on RocksDB matches the fMGWS totals") {
    implicit val sc = spark.sqlContext
    // transformWithState requires the RocksDB provider (the off-heap
    // store a 100-TB keyspace runs); restore the default after so the
    // shared session's other suites keep their store
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[ScoredPost]
      val out = StatefulOps.runningSubredditStatsTws(spark, input.toDS())
      val q = out.writeStream.format("memory").queryName("substats_tws")
        .outputMode("update").start()
      try {
        input.addData(ScoredPost("depression", 40), ScoredPost("depression", 20),
          ScoredPost("anxiety", 0))
        q.processAllAvailable()
        input.addData(ScoredPost("depression", 100))
        q.processAllAvailable()
        val rows = spark.table("substats_tws")
          .groupBy("subreddit").max("posts", "total_risk", "high_risk")
          .collect()
          .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
          .toMap
        // identical to the flatMapGroupsWithState totals above: the API
        // migration is wiring, not semantics
        assert(rows("depression") === ((3L, 160L, 2L)))
        assert(rows("anxiety") === ((1L, 0L, 0L)))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("transformWithState TTL evicts idle state (skip-guarded)") {
    // TTL (state-v2 ProcessingTime time-mode) was documented-blocked in
    // r5: the micro-batch engine kept scheduling clock-advancing epochs
    // and processAllAvailable never quiesced in-process. This re-attempt
    // is guarded: each drain runs under a hard timeout and the test
    // CANCELS (keeping the documented block current) instead of hanging
    // the suite if the engine still refuses to drain.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.DurationInt
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[ScoredPost]
      val out = StatefulOps.runningSubredditStatsTtl(spark, input.toDS(), ttlMs = 2000L)
      val q = out.writeStream.format("memory").queryName("substats_ttl")
        .outputMode("update").start()
      def drainOrCancel(): Unit =
        try Await.result(Future(q.processAllAvailable()), 90.seconds)
        catch {
          case _: java.util.concurrent.TimeoutException =>
            try q.stop() finally {}
            cancel("ProcessingTime time-mode still does not quiesce in-process — " +
              "documented block in StatefulOps.RunningRiskProcessor stands")
        }
      try {
        input.addData(ScoredPost("depression", 40), ScoredPost("depression", 20))
        drainOrCancel()
        // let the TTL lapse with the key idle, then revive it
        Thread.sleep(3000L)
        input.addData(ScoredPost("depression", 100))
        drainOrCancel()
        val rows = spark.table("substats_ttl")
          .collect().map(r => (r.getAs[Long]("posts"), r.getAs[Long]("total_risk")))
          .toSet
        // batch 1 emitted the accumulated (2, 60); batch 2 must restart
        // from zero — (1, 100), NOT (3, 160) — because the idle state
        // outlived its TTL and was evicted
        assert(rows.contains((2L, 60L)), s"first batch totals missing: $rows")
        assert(rows.contains((1L, 100L)) && !rows.contains((3L, 160L)),
          s"state survived past its TTL: $rows")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("TTL unit twin: config plumbing + eviction semantics at the handle level") {
    // The e2e ProcessingTime TTL path above self-retries every run and
    // cancels while the engine still can't quiesce in-process; this twin
    // asserts the two things the processor itself owns, engine-free:
    // (1) init registers the value state under the EXACT TTLConfig the
    // operator was built with, and (2) given a store that evicts per
    // that config, a revived key restarts from zero while an inside-TTL
    // key accumulates.
    val ttl = new StatefulOps.RunningRiskProcessorTtl(2000L)
    val handle = new RecordingHandle
    ttl.setHandle(handle)
    ttl.init(org.apache.spark.sql.streaming.OutputMode.Update(),
      org.apache.spark.sql.streaming.TimeMode.ProcessingTime())
    assert(handle.registered === Seq(("counts",
      org.apache.spark.sql.streaming.TTLConfig(java.time.Duration.ofMillis(2000L)))),
      "init must register 'counts' under TTLConfig(ttlMs), not NONE")

    def batch(posts: ScoredPost*) =
      ttl.handleInputRows("depression", posts.iterator, null).toSeq.head
    val first = batch(ScoredPost("depression", 40), ScoredPost("depression", 20))
    assert((first.posts, first.total_risk, first.high_risk) === ((2L, 60L, 1L)))
    // within the TTL the state accumulates...
    handle.nowMs = 1500L
    val second = batch(ScoredPost("depression", 5))
    assert((second.posts, second.total_risk) === ((3L, 65L)))
    // ...and once idle past it, the store evicts and the key restarts
    handle.nowMs = 1500L + 2500L
    val revived = batch(ScoredPost("depression", 100))
    assert((revived.posts, revived.total_risk) === ((1L, 100L)),
      s"state outlived its TTL: $revived")
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

  test("sessionize: in-batch gap split, timeout close, state removal") {
    import StatefulOps.{ClosedSession, SessionState, UserEvent}
    val fn = StatefulOps.sessionize(60000L) _
    // one batch containing a gap: first session closes inline, second stays open
    val s0 = new TestGroupState[SessionState](None)
    val closed = fn(1L, Iterator(
      UserEvent(1L, 0L), UserEvent(1L, 30000L), UserEvent(1L, 200000L)), s0).toSeq
    assert(closed === Seq(ClosedSession(1L, 0L, 30000L, 2L)))
    assert(s0.get === SessionState(200000L, 200000L, 1L))
    // timeout branch: emit the open session once and clear the state
    val s1 = new TestGroupState[SessionState](
      Some(SessionState(0L, 30000L, 2L)), timedOut = true)
    assert(fn(1L, Iterator.empty, s1).toSeq
      === Seq(ClosedSession(1L, 0L, 30000L, 2L)))
    assert(s1.getOption.isEmpty)
    // out-of-order arrivals inside a batch fold in event-time order
    val s2 = new TestGroupState[SessionState](None)
    assert(fn(1L, Iterator(UserEvent(1L, 50000L), UserEvent(1L, 10000L)), s2).isEmpty)
    assert(s2.get === SessionState(10000L, 50000L, 2L))
  }

  test("event-time timeout closes sessions exactly once across the stream") {
    import StatefulOps.{ClosedSession, UserEvent}
    implicit val sc = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val out = StatefulOps.closedSessions(spark, input.toDS(), gapMs = 60000L)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    // base offset: the pre-first-batch watermark is epoch 0, and events
    // AT the watermark are dropped as late — event times must sit above it
    val t0 = 86400000L
    try {
      // user 1: two events 30s apart — one open session, deadline t0+90s
      input.addData(UserEvent(1L, t0), UserEvent(1L, t0 + 30000L))
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 0, "session closed too early")
      // a much later event advances the watermark far past the deadline...
      input.addData(UserEvent(2L, t0 + 300000L))
      q.processAllAvailable()
      // ...and the timeout fires on the following trigger (the new
      // watermark takes effect in the next batch)
      input.addData(UserEvent(2L, t0 + 310000L))
      q.processAllAvailable()
      val closed = spark.table("sessions").as[ClosedSession].collect().toSeq
      assert(closed === Seq(ClosedSession(1L, t0, t0 + 30000L, 2L)),
        s"expected exactly user 1's session, got $closed")
    } finally q.stop()
  }
}

/** Minimal StatefulProcessorHandle stub: records each getValueState
  * registration and serves a ValueState that honors the registered TTL
  * against a settable clock — the eviction contract the real RocksDB
  * store implements, reduced to what a unit test can drive. */
class RecordingHandle extends org.apache.spark.sql.streaming.StatefulProcessorHandle {
  import org.apache.spark.sql.streaming.{ListState, MapState, QueryInfo, TTLConfig, ValueState}
  var nowMs: Long = 0L
  var registered: Seq[(String, TTLConfig)] = Nil

  private class TtlValueState[T](ttl: TTLConfig) extends ValueState[T] {
    private var v: Option[(T, Long)] = None
    private def live: Option[T] = v.collect {
      case (x, wrote) if ttl.ttlDuration == null ||
        nowMs - wrote < ttl.ttlDuration.toMillis => x
    }
    override def exists(): Boolean = live.isDefined
    override def get(): T = live.getOrElse(
      throw new NoSuchElementException("state absent or TTL-evicted"))
    override def update(newState: T): Unit = v = Some((newState, nowMs))
    override def clear(): Unit = v = None
  }

  override def getValueState[T](stateName: String,
      valEncoder: org.apache.spark.sql.Encoder[T], ttlConfig: TTLConfig): ValueState[T] = {
    registered :+= ((stateName, ttlConfig))
    new TtlValueState[T](ttlConfig)
  }
  override def getValueState[T](stateName: String, ttlConfig: TTLConfig)(
      implicit valEncoder: org.apache.spark.sql.Encoder[T]): ValueState[T] =
    getValueState(stateName, valEncoder, ttlConfig)
  override def getListState[T](stateName: String,
      valEncoder: org.apache.spark.sql.Encoder[T], ttlConfig: TTLConfig): ListState[T] =
    throw new UnsupportedOperationException
  override def getListState[T](stateName: String, ttlConfig: TTLConfig)(
      implicit valEncoder: org.apache.spark.sql.Encoder[T]): ListState[T] =
    throw new UnsupportedOperationException
  override def getMapState[K, V](stateName: String,
      userKeyEnc: org.apache.spark.sql.Encoder[K],
      valEncoder: org.apache.spark.sql.Encoder[V], ttlConfig: TTLConfig): MapState[K, V] =
    throw new UnsupportedOperationException
  override def getMapState[K, V](stateName: String, ttlConfig: TTLConfig)(
      implicit userKeyEnc: org.apache.spark.sql.Encoder[K],
      valEncoder: org.apache.spark.sql.Encoder[V]): MapState[K, V] =
    throw new UnsupportedOperationException
  override def getQueryInfo(): QueryInfo = throw new UnsupportedOperationException
  override def registerTimer(expiryTimestampMs: Long): Unit = ()
  override def deleteTimer(expiryTimestampMs: Long): Unit = ()
  override def listTimers(): Iterator[Long] = Iterator.empty
  override def deleteIfExists(stateName: String): Unit = ()
}

/** Minimal GroupState stub for pure-function testing. */
class TestGroupState[S](initial: Option[S], timedOut: Boolean = false)
    extends org.apache.spark.sql.streaming.GroupState[S] {
  private var v: Option[S] = initial
  override def exists: Boolean = v.isDefined
  override def get: S = v.get
  override def getOption: Option[S] = v
  override def update(newState: S): Unit = v = Some(newState)
  override def remove(): Unit = v = None
  override def hasTimedOut: Boolean = timedOut
  override def setTimeoutDuration(durationMs: Long): Unit = ()
  override def setTimeoutDuration(duration: String): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
