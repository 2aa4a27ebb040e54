package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
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
}
