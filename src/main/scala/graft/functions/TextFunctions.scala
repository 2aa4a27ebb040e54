package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's two signature scalar operations, re-expressed as pure
  * Column algebra instead of Python UDFs, so they stay inside whole-stage
  * codegen and remain pushdown/pruning-transparent to Catalyst.
  *
  * Reference implementations (both Python UDFs / plain functions):
  *  - clean_text: spark_jobs/preprocessing_streaming.py:39-50 and
  *    spark_jobs/kafka_consumer_simple.py:25-33
  *  - calculate_risk_score: spark_jobs/preprocessing_streaming.py:53-68 and
  *    spark_jobs/kafka_consumer_simple.py:35-47
  */
object TextFunctions {

  /** The 16 distress keywords, identical lists at
    * spark_jobs/kafka_consumer_simple.py:18-23 and
    * spark_jobs/preprocessing_streaming.py:13-18.
    */
  val riskKeywords: Seq[String] = Seq(
    "suicide", "kill myself", "end it all", "no reason to live",
    "hopeless", "worthless", "give up", "can't go on",
    "depressed", "anxious", "panic", "overwhelmed",
    "lonely", "isolated", "scared", "die",
  )

  /** lower → strip URLs → keep [a-z0-9\s] → collapse whitespace → trim;
    * "" on null. Exact regexes from the reference
    * (spark_jobs/preprocessing_streaming.py:44-47): `http\S+|www\S+`,
    * `[^a-z0-9\s]`, `\s+`. Spark regexp_replace replaces ALL matches
    * (DuckDB oracle needs the 'g' flag).
    */
  def cleanText(c: Column): Column = {
    val lowered   = lower(coalesce(c, lit("")))
    val noUrls    = regexp_replace(lowered, "http\\S+|www\\S+", "")
    val alnumOnly = regexp_replace(noUrls, "[^a-z0-9\\s]", "")
    trim(regexp_replace(alnumOnly, "\\s+", " "))
  }

  /** +10 for EACH keyword substring-contained (once per keyword, regardless
    * of occurrence count) in the lowercased RAW text, capped at 100; 0 on
    * null/empty. Matching is plain substring, not word-boundary ("die"
    * matches "died"/"diet") — semantics pinned by the golden fixture
    * (reference data/processed_posts_realtime.json:31,37).
    *
    * Pure codegen'd Column algebra: a sum of boolean contains() casts — the
    * 16 literals constant-fold and the whole thing stays in one
    * WholeStageCodegen stage.
    */
  def riskScore(c: Column): Column = {
    val lowered = lower(coalesce(c, lit("")))
    val hits = riskKeywords
      .map(k => lowered.contains(lit(k)).cast("int"))
      .reduce(_ + _)
    least(lit(100), hits * lit(10))
  }

  /** SQL fragment computing the identical risk score in DuckDB, for oracle
    * parity. `expr` must be an already-lowercased string expression.
    */
  def riskScoreDuckDbSql(expr: String): String = {
    val hits = riskKeywords
      .map(k => s"(CASE WHEN contains($expr, '${k.replace("'", "''")}') THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"least(100, 10 * ($hits))"
  }

  /** SQL fragment for cleanText in DuckDB (regexp_replace needs 'g'). */
  def cleanTextDuckDbSql(expr: String): String =
    s"trim(regexp_replace(regexp_replace(regexp_replace(lower(coalesce($expr, '')), " +
      s"'http\\S+|www\\S+', '', 'g'), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))"
}
