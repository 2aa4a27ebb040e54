package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Multimodal-column plumbing: payloads as opaque `binary` columns with a
  * typed metadata struct, and batch feature extraction via mapPartitions
  * — the Scala twin of a vectorized pandas-UDF decode stage
  * (`mapInPandas`). Real image/audio codecs aren't in this container, so
  * the DECODE step is a deterministic byte-statistics stub; the
  * Spark-side contract — schema, opaque payload handling, partition-
  * parallel batched extraction — is the real operator and is what would
  * carry a JPEG decoder at 100 TB (payload bytes never shuffle; features
  * do).
  */
object MultimodalOps {

  /** Extracted per-payload features (mean/max/min byte stand in for the
    * decoded-feature vector). */
  case class MediaFeatures(doc_id: Long, n_bytes: Long,
      mean_byte: Double, max_byte: Int, min_byte: Int)

  /** Attach an opaque binary payload + queryable metadata struct. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        length(col("text")).cast("long").as("n_bytes"),
        lit("text/plain").as("mime"),
      ).as("media_meta"),
    )

  /** Batch "decode" over payload bytes: one pass per partition, rows
    * processed as an iterator (never materialized wholesale), emitting a
    * narrow typed feature row per payload.
    */
  def extractFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    withPayload(Tables.fanOut(Tables.documents(spark, dir)))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          var sum = 0L
          var mx = 0
          var mn = 255
          bytes.foreach { b =>
            val v = b & 0xff
            sum += v
            if (v > mx) mx = v
            if (v < mn) mn = v
          }
          MediaFeatures(id, bytes.length.toLong, sum.toDouble / bytes.length, mx, mn)
        }
      }
  }

  /** Oracle-facing projection (mean rounded like every other float). */
  def features(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(spark, dir)
      .toDF()
      .select(col("doc_id"), col("n_bytes"),
        round(col("mean_byte"), 6).as("mean_byte"),
        col("max_byte"), col("min_byte"))
      .orderBy(col("doc_id"))
}
