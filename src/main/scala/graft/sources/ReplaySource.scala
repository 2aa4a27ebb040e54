package graft.sources

import java.nio.file.{Files, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SRC-1 in production shape: a DataSource V2 micro-batch source with the
  * reference's polling structure (reference:
  * kafka_producer/reddit_collector_kafka.py:62-125 — poll N records per
  * cycle, emit downstream, sleep out rate limits). The network poll is
  * stubbed to a local line-delimited JSON spool file (no egress in this
  * environment); each trigger consumes up to `rowsPerBatch` lines, and a
  * `{"status":429}` control line reproduces the reference's 60-second
  * rate-limit sleep (`reddit_collector_kafka.py:115-117`) as
  * `backoffCycles` fetch-nothing poll cycles. Output is Kafka-shaped
  * (a single `value` STRING column) so `graft.streaming.Pipeline.process`
  * consumes it unchanged.
  *
  * Usage:
  * {{{
  * spark.readStream
  *   .format("graft.sources.ReplaySourceProvider")
  *   .option("path", spool).option("rowsPerBatch", "25")
  *   .load()
  * }}}
  */
class ReplaySourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ReplaySourceProvider.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ReplayTable(
      properties.get("path"),
      Option(properties.get("rowsPerBatch")).map(_.toInt).getOrElse(25),
      Option(properties.get("backoffCycles")).map(_.toInt).getOrElse(2))
}

object ReplaySourceProvider {
  /** Kafka wire shape: the JSON post as an opaque value. */
  val schema: StructType = StructType(Seq(StructField("value", StringType)))

  /** Spool control line standing in for an HTTP 429 response (reference:
    * kafka_producer/reddit_collector_kafka.py:115-117 sleeps 60 s on
    * rate-limit). Never emitted downstream. */
  val RateLimitMarker: String = """{"status":429}"""
}

private[graft] class ReplayTable(path: String, rowsPerBatch: Int,
    backoffCycles: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_replay($path)"
  override def schema(): StructType = ReplaySourceProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ReplaySourceProvider.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ReplayMicroBatchStream(path, rowsPerBatch, backoffCycles)
      }
    }
}

/** Offset = number of lines consumed so far. */
private[graft] case class ReplayOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[graft] class ReplayMicroBatchStream(path: String, rowsPerBatch: Int,
    backoffCycles: Int) extends MicroBatchStream {

  private lazy val lines: Array[String] =
    Files.readAllLines(Paths.get(path)).asScala.toArray.filter(_.nonEmpty)

  // Advances by one "poll" per trigger, like the reference's per-cycle
  // fetch; monotone and replayable from any committed offset.
  private var available: Long = 0L
  // Remaining poll cycles to sit out after a rate-limit line — the
  // reference's 60-second sleep, expressed in trigger cycles so the
  // state machine is deterministic and testable.
  private var inBackoff: Int = 0

  private def isRateLimit(line: String): Boolean =
    line == ReplaySourceProvider.RateLimitMarker

  override def initialOffset(): Offset = ReplayOffset(0L)

  override def latestOffset(): Offset = synchronized {
    if (inBackoff > 0) {
      // backing off: this poll cycle fetches nothing
      inBackoff -= 1
    } else if (available < lines.length) {
      if (isRateLimit(lines(available.toInt))) {
        // consume the 429 itself (it is filtered from output) and sleep
        // for the configured number of cycles
        available += 1
        inBackoff = backoffCycles
      } else {
        var advanced = 0
        while (advanced < rowsPerBatch && available < lines.length &&
            !isRateLimit(lines(available.toInt))) {
          available += 1
          advanced += 1
        }
      }
    }
    ReplayOffset(available)
  }

  override def deserializeOffset(json: String): Offset = ReplayOffset(json.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ReplayOffset].n.toInt
    val e = end.asInstanceOf[ReplayOffset].n.toInt
    Array(ReplayPartition(lines.slice(s, e).filterNot(isRateLimit)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val rows = partition.asInstanceOf[ReplayPartition].rows
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow =
            new GenericInternalRow(Array[Any](UTF8String.fromString(rows(i))))
          override def close(): Unit = ()
        }
      }
    }
}

private[graft] case class ReplayPartition(rows: Array[String]) extends InputPartition
