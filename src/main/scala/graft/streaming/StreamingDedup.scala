package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the stateful twin of the batch
  * MinHash/LSH path (SURVEY.md §2.9 ST-4 × §2.11 ML-4): documents arrive
  * on an unbounded stream, each is mapped to its LSH band buckets with
  * EXACTLY the batch operators' Column expressions
  * (`DedupOps.withSignature` — stateless per-row maps,
  * so the same plan fragment runs under a streaming source), and a
  * per-bucket `flatMapGroupsWithState` remembers which documents each
  * bucket has seen. A new arrival colliding with remembered documents
  * emits (bucket, earlier_id, new_id) candidate pairs in the SAME
  * micro-batch — streaming ingestion dedup, where the batch job would
  * re-scan the corpus.
  *
  * Scale posture: state is keyed by (band, bucket) and CAPPED at
  * `bucketCap` remembered ids per bucket (the same degenerate-bucket
  * guard as the batch `bucketedJaccard` cap), so the state store grows
  * with the number of DISTINCT buckets, never with stream length, and
  * per-arrival emission is bounded by the cap. Within one micro-batch a
  * bucket's arrivals fold in doc_id order, making output deterministic
  * under shuffle/arrival reordering.
  */
object StreamingDedup {

  /** One row per (document, band bucket). */
  case class BucketedDoc(bucket: String, doc_id: Long)

  /** Remembered per-bucket arrivals (ascending doc_id, size ≤ cap). */
  case class BucketState(docIds: List[Long])

  /** A candidate near-dup pair surfaced by a bucket collision. */
  case class CandidatePair(bucket: String, a_id: Long, b_id: Long)

  /** Fold one micro-batch's arrivals for one bucket into its remembered
    * set, emitting a pair per (remembered, new) collision. Pure and
    * deterministic — unit-testable without a stream. */
  def updateBucket(bucketCap: Int)(
      bucket: String,
      docs: Iterator[BucketedDoc],
      state: GroupState[BucketState]): Iterator[CandidatePair] = {
    var kept = state.getOption.map(_.docIds).getOrElse(Nil)
    val out = List.newBuilder[CandidatePair]
    // doc_id order: a micro-batch delivers a group's rows in shuffle
    // order, which must not change what gets emitted or remembered
    docs.toSeq.sortBy(_.doc_id).foreach { d =>
      if (!kept.contains(d.doc_id) && kept.size < bucketCap) {
        kept.foreach(a => out += CandidatePair(bucket, a, d.doc_id))
        kept = kept :+ d.doc_id
      }
    }
    state.update(BucketState(kept))
    out.result().iterator
  }

  /** Wire the stateful op onto a (doc_id, text) stream: minhash → band
    * buckets (the batch expressions, unchanged) → per-bucket collision
    * state. Append mode: pairs are emitted exactly once, when the newer
    * document arrives. */
  def candidatePairs(spark: SparkSession, docs: DataFrame,
      bucketCap: Int = 20): Dataset[CandidatePair] = {
    import spark.implicits._
    graft.operators.DedupOps.withBandBuckets(
        graft.operators.DedupOps.withSignature(docs))
      .select(concat_ws("|", col("band"), col("bucket")).as("bucket"), col("doc_id"))
      .as[BucketedDoc]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        updateBucket(bucketCap))
  }
}
