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
  * cycle, emit downstream). The network poll is stubbed to a local
  * line-delimited JSON spool file (no egress in this environment); each
  * trigger consumes up to `rowsPerBatch` lines. Output is Kafka-shaped
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
      Option(properties.get("rowsPerBatch")).map(_.toInt).getOrElse(25))
}

object ReplaySourceProvider {
  /** Kafka wire shape: the JSON post as an opaque value. */
  val schema: StructType = StructType(Seq(StructField("value", StringType)))
}

private[sources] class ReplayTable(path: String, rowsPerBatch: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_replay($path)"
  override def schema(): StructType = ReplaySourceProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ReplaySourceProvider.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ReplayMicroBatchStream(path, rowsPerBatch)
      }
    }
}

/** Offset = number of lines consumed so far. */
private[sources] case class ReplayOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] class ReplayMicroBatchStream(path: String, rowsPerBatch: Int)
    extends MicroBatchStream {

  private lazy val lines: Array[String] =
    Files.readAllLines(Paths.get(path)).asScala.toArray.filter(_.nonEmpty)

  // Advances by one "poll" per trigger, like the reference's per-cycle
  // fetch; monotone and replayable from any committed offset.
  private var available: Long = 0L

  override def initialOffset(): Offset = ReplayOffset(0L)

  override def latestOffset(): Offset = synchronized {
    available = math.min(lines.length.toLong, available + rowsPerBatch)
    ReplayOffset(available)
  }

  override def deserializeOffset(json: String): Offset = ReplayOffset(json.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ReplayOffset].n.toInt
    val e = end.asInstanceOf[ReplayOffset].n.toInt
    Array(ReplayPartition(lines.slice(s, e)))
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

private[sources] case class ReplayPartition(rows: Array[String]) extends InputPartition
