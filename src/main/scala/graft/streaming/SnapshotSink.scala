package graft.streaming

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** ST-4 / S-6 / SNK-2: the consumer's last-100 ring buffer + whole-file
  * JSON snapshot (reference: spark_jobs/kafka_consumer_simple.py:14,
  * 49-61,104,143-146) as a foreachBatch sink.
  *
  * The reference rewrites the entire file once PER MESSAGE (O(buffer)
  * write amplification per record); here the snapshot is rewritten once
  * per MICRO-BATCH. The buffer is bounded (maxRows), so the per-batch
  * `limit(maxRows).collect()` is a constant-size driver transfer no
  * matter how large the batch — the unbounded part of the stream never
  * reaches the driver.
  */
class SnapshotSink(path: String, maxRows: Int = 100,
    arrivalCols: Seq[String] = Seq("timestamp", "id")) extends Serializable {

  /** Ring buffer in arrival order, newest at the end (deque maxlen twin). */
  private val buffer = mutable.ArrayDeque.empty[Row]

  def snapshotRows: Seq[Row] = synchronized(buffer.toSeq)

  /** Process one micro-batch: keep only the newest maxRows of the batch,
    * append in arrival order, evict oldest, rewrite the snapshot file.
    */
  def update(batch: DataFrame, batchId: Long): Unit = synchronized {
    val ordered = batch
      .orderBy(arrivalCols.map(c => col(c).desc): _*)
      .limit(maxRows)
      .collect()
      .reverse // back to ascending arrival order
    ordered.foreach { r =>
      buffer.append(r)
      if (buffer.size > maxRows) buffer.removeHead()
    }
    val spark = batch.sparkSession
    spark.createDataFrame(buffer.toList.asJava, batch.schema)
      .coalesce(1)
      .write.mode("overwrite").json(path)
  }

  /** Attach to a streaming DataFrame. */
  def attach(df: DataFrame, checkpointDir: String): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: Dataset[Row], id: Long) => update(b, id))
      .start()
}
