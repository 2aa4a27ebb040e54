package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state beyond what dropDuplicates/window give for free
  * (SURVEY.md §2.9 ST-4 extension): per-subreddit running risk telemetry
  * via flatMapGroupsWithState — the KeyValueGroupedDataset state API the
  * reference's Python consumer approximated with process-local dicts.
  *
  * State is per-key and bounded (a handful of counters), so the state
  * store scales with #subreddits, not #posts — the property that matters
  * at stream scale.
  */
object StatefulOps {

  /** Minimal input projection for the stateful op. */
  case class ScoredPost(subreddit: String, risk_score: Int)

  /** Accumulated per-subreddit state. */
  case class SubredditState(posts: Long, totalRisk: Long, highRisk: Long)

  /** Emitted once per (subreddit, micro-batch) with updated totals. */
  case class SubredditStats(
      subreddit: String, posts: Long, total_risk: Long,
      high_risk: Long, avg_risk: Double)

  /** The state-update function: fold this batch's posts for one key into
    * the running counters, emit one stats row. Pure and deterministic —
    * unit-testable without a stream. */
  def updateSubreddit(
      subreddit: String,
      posts: Iterator[ScoredPost],
      state: GroupState[SubredditState]): Iterator[SubredditStats] = {
    val prev = state.getOption.getOrElse(SubredditState(0L, 0L, 0L))
    var n = prev.posts
    var total = prev.totalRisk
    var high = prev.highRisk
    posts.foreach { p =>
      n += 1
      total += p.risk_score
      if (p.risk_score >= 30) high += 1
    }
    val next = SubredditState(n, total, high)
    state.update(next)
    Iterator(SubredditStats(subreddit, n, total, high,
      if (n == 0) 0.0 else total.toDouble / n))
  }

  /** Wire the stateful op onto an enriched post stream (columns
    * subreddit, risk_score — i.e. Pipeline.enrich output). Update mode:
    * each trigger re-emits the keys it touched. */
  def runningSubredditStats(spark: SparkSession,
      posts: Dataset[ScoredPost]): Dataset[SubredditStats] = {
    import spark.implicits._
    posts
      .groupByKey(_.subreddit)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        updateSubreddit)
  }

  // ---- event-time session with timeout-driven finalization ----

  /** A user event carrying its event-time in epoch millis. */
  case class UserEvent(user_id: Long, ts_ms: Long)

  /** Open-session state: bounds + count. */
  case class SessionState(start_ms: Long, last_ms: Long, n_events: Long)

  /** Emitted ONLY when a session closes (the watermark passed its gap). */
  case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** Session finalization via EventTimeTimeout — the GroupStateTimeout
    * facet `session_window` hides: state carries the open session, the
    * timeout is re-armed at (last event + gap) on every arrival, and the
    * session is EMITTED EXACTLY ONCE, from the timeout branch, when the
    * watermark finally passes that deadline. Expired state is removed, so
    * the store holds only OPEN sessions — bounded by concurrently active
    * keys, the property that keeps a stateful job alive on an unbounded
    * stream. Events later than the gap open a fresh session (same
    * semantics as the built-in session_window, which [[graft.operators.TimeWindowOps]]
    * oracles in batch mode — this is the custom-state formulation that
    * can carry arbitrary per-session payload).
    */
  def sessionize(gapMs: Long)(
      userId: Long,
      events: Iterator[UserEvent],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(ClosedSession(userId, s.start_ms, s.last_ms, s.n_events))
    } else {
      // fold in event-time order so batch/shuffle order cannot split
      // sessions differently
      val closed = List.newBuilder[ClosedSession]
      var cur = state.getOption
      events.toSeq.sortBy(_.ts_ms).foreach { e =>
        cur match {
          case Some(s) if e.ts_ms - s.last_ms <= gapMs =>
            cur = Some(SessionState(s.start_ms, math.max(s.last_ms, e.ts_ms),
              s.n_events + 1))
          case Some(s) => // gap exceeded inside the batch: close + reopen
            closed += ClosedSession(userId, s.start_ms, s.last_ms, s.n_events)
            cur = Some(SessionState(e.ts_ms, e.ts_ms, 1L))
          case None =>
            cur = Some(SessionState(e.ts_ms, e.ts_ms, 1L))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last_ms + gapMs)
      }
      closed.result().iterator
    }
  }

  /** Wire sessionization onto a (user_id, ts_ms) event stream. The
    * watermark drives the timeouts, so late data beyond it can never
    * reopen an emitted session — the exactly-once-per-session guarantee.
    */
  def closedSessions(spark: SparkSession, events: Dataset[UserEvent],
      gapMs: Long = 30 * 60 * 1000L): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .withColumn("event_time", (col("ts_ms") / 1000).cast("timestamp"))
      .withWatermark("event_time", "0 seconds")
      .as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        sessionize(gapMs) _)
  }

  /** The same running telemetry on the transformWithState API (Spark
    * 4's arbitrary-state v2): typed `ValueState` behind an explicit
    * `StatefulProcessor`, mandatory RocksDB state store — the API/store
    * pairing that holds state off-heap with incremental changelog
    * checkpointing, i.e. the configuration a 100-TB keyspace actually
    * runs. Semantics are identical to [[runningSubredditStats]]
    * (the spec asserts both paths emit the same totals), so the
    * migration between the APIs is a wiring change, not a semantic one.
    *
    * DELIBERATELY TimeMode.None / TTLConfig.NONE: a TTL-evicting
    * variant (ValueState + TTLConfig(duration), TimeMode.ProcessingTime)
    * was attempted three times (and re-attempted with a timeout guard —
    * see [[RunningRiskProcessorTtl]]) and cannot be tested in this
    * environment. Under ProcessingTime time-mode the micro-batch engine
    * schedules clock-advancing batches continuously, so
    * `processAllAvailable` never quiesces — and `Trigger.AvailableNow`
    * + `awaitTermination` does NOT escape it either: the drained query
    * kept issuing empty epochs (observed epoch 99+ in 120 s) without
    * terminating. Re-verified on Spark 4.1.2's stabilized state-v2 TTL
    * config: the skip-guarded spec still times out at 90 s and cancels
    * with this note. On a real cluster TTL state is the right retention
    * knob for unbounded keyspaces; in-process it is untestable, so the
    * wired [[RunningRiskProcessorTtl]] path stays guarded rather than
    * asserted.
    */
  class RunningRiskProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, ScoredPost, SubredditStats] {
    @transient private var counts:
      org.apache.spark.sql.streaming.ValueState[SubredditState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      counts = getHandle.getValueState[SubredditState]("counts",
        org.apache.spark.sql.Encoders.product[SubredditState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[ScoredPost],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[SubredditStats] = {
      val prev = if (counts.exists()) counts.get() else SubredditState(0L, 0L, 0L)
      var n = prev.posts
      var total = prev.totalRisk
      var high = prev.highRisk
      rows.foreach { p =>
        n += 1
        total += p.risk_score
        if (p.risk_score >= 30) high += 1
      }
      counts.update(SubredditState(n, total, high))
      Iterator.single(SubredditStats(key, n, total, high,
        if (n == 0) 0.0 else total.toDouble / n))
    }
  }

  /** Wire [[RunningRiskProcessor]] onto the post stream. Callers must
    * run the query with the RocksDB state store provider —
    * transformWithState rejects the HDFS-backed default. */
  def runningSubredditStatsTws(spark: SparkSession,
      posts: Dataset[ScoredPost]): Dataset[SubredditStats] = {
    import spark.implicits._
    posts
      .groupByKey(_.subreddit)
      .transformWithState(new RunningRiskProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** [[RunningRiskProcessor]] with a processing-time TTL on the value
    * state — the retention knob an unbounded keyspace needs (keys that
    * go quiet longer than the TTL are evicted instead of accumulating
    * forever; a revived key restarts from zero). Requires
    * TimeMode.ProcessingTime, which is exactly the mode whose
    * in-process quiescing has been the documented blocker (see the
    * [[RunningRiskProcessor]] scaladoc); the spec exercising this is
    * skip-guarded and cancels with the block note if the engine still
    * refuses to drain. */
  class RunningRiskProcessorTtl(ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, ScoredPost, SubredditStats] {
    @transient private var counts:
      org.apache.spark.sql.streaming.ValueState[SubredditState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      counts = getHandle.getValueState[SubredditState]("counts",
        org.apache.spark.sql.Encoders.product[SubredditState],
        org.apache.spark.sql.streaming.TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(key: String, rows: Iterator[ScoredPost],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[SubredditStats] = {
      val prev = if (counts.exists()) counts.get() else SubredditState(0L, 0L, 0L)
      var n = prev.posts
      var total = prev.totalRisk
      var high = prev.highRisk
      rows.foreach { p =>
        n += 1
        total += p.risk_score
        if (p.risk_score >= 30) high += 1
      }
      counts.update(SubredditState(n, total, high))
      Iterator.single(SubredditStats(key, n, total, high,
        if (n == 0) 0.0 else total.toDouble / n))
    }
  }

  /** Wire [[RunningRiskProcessorTtl]] onto the post stream (RocksDB
    * provider required, as with the non-TTL variant). */
  def runningSubredditStatsTtl(spark: SparkSession,
      posts: Dataset[ScoredPost], ttlMs: Long): Dataset[SubredditStats] = {
    import spark.implicits._
    posts
      .groupByKey(_.subreddit)
      .transformWithState(new RunningRiskProcessorTtl(ttlMs),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(), OutputMode.Update())
  }
}
