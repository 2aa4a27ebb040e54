package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.model.Tables

/** The reference's streaming pipeline (reference:
  * spark_jobs/preprocessing_streaming.py:89-170) rebuilt as pure
  * DataFrame transforms, source-agnostic: apply `process` to any frame
  * with a Kafka-shaped `value` column — a real Kafka source
  * (`spark.readStream.format("kafka")...subscribe=reddit-posts`), a
  * MemoryStream in tests, or a batch DataFrame (identical semantics,
  * Structured Streaming's batch/stream unification).
  *
  * The two Python UDFs of the reference (clean_text, risk_score) are
  * native Column algebra here, so the whole pipeline is one
  * WholeStageCodegen stage per micro-batch — no JVM↔Python worker
  * boundary, which was the reference's only non-Catalyst execution cost.
  */
object Pipeline {

  /** P-2 + P-3: Kafka value bytes → JSON parse with the authoritative
    * post schema → flattened columns
    * (reference: spark_jobs/preprocessing_streaming.py:102-104). */
  def parse(raw: DataFrame): DataFrame =
    raw
      .selectExpr("CAST(value AS STRING) AS json")
      .select(from_json(col("json"), Tables.postSchema).as("data"))
      .select("data.*")

  /** P-4: the withColumn enrichment chain
    * (reference: spark_jobs/preprocessing_streaming.py:109-121).
    * risk_score runs on the RAW combined text, not the cleaned text —
    * semantics pinned by the golden fixture (SURVEY.md §2.10). */
  def enrich(posts: DataFrame): DataFrame =
    posts
      .withColumn("combined_text", concat_ws(" ", col("title"), col("text")))
      .withColumn("cleaned_text", TextFunctions.cleanText(col("combined_text")))
      .withColumn("risk_score", TextFunctions.riskScore(col("combined_text")))
      .withColumn("processed_at", current_timestamp())

  /** P-5: final 9-column pruning
    * (reference: spark_jobs/preprocessing_streaming.py:124-134). */
  def prune(enriched: DataFrame): DataFrame =
    enriched.select(
      col("id"), col("author"), col("subreddit"), col("title"),
      col("risk_score"), col("score"), col("num_comments"),
      col("timestamp"), col("processed_at"),
    )

  /** Full pipeline: Kafka-shaped frame in, processed posts out. */
  def process(raw: DataFrame): DataFrame = prune(enrich(parse(raw)))

  /** SRC-2 wire format: serialize post rows back to the Kafka value shape
    * (reference: kafka_producer/reddit_collector_kafka.py:16-21 — dict →
    * JSON bytes). `parse(serialize(df))` is the identity on the post
    * columns, which is what makes the Kafka sink/source pair an
    * exactly-once-compatible boundary with the checkpointed reader.
    */
  def serialize(posts: DataFrame): DataFrame =
    posts.select(to_json(struct(posts.columns.map(col): _*)).as("value"))

  /** SRC-2 with the producer's record KEY: (key, value) in the Kafka
    * producer-record shape `KafkaSpoolSink` consumes. Keying by post id
    * is what gives per-post total order within a partition — the
    * guarantee the reference leans on implicitly by publishing from one
    * single-threaded producer loop.
    */
  def serializeKeyed(posts: DataFrame, keyCol: String = "id"): DataFrame =
    posts.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(posts.columns.map(col): _*)).as("value"))

  /** P-7 as streaming state: watermarked dedup by post id — the scalable
    * twin of the producer's in-memory `seen_ids` set (reference:
    * kafka_producer/reddit_collector_kafka.py:48,78-81), with state the
    * store can evict once the watermark passes.
    */
  def dedupWithinWatermark(posts: DataFrame, delay: String = "10 minutes"): DataFrame =
    posts
      .withColumn("event_time", to_timestamp(col("timestamp")))
      .withWatermark("event_time", delay)
      .dropDuplicatesWithinWatermark("id")
}
