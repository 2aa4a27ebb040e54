package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Streaming read face of [[VersionedTable]]: a DataSource V2 micro-batch
  * source that TAILS THE COMMIT LOG — the stream offset IS the table
  * version, and each micro-batch serves exactly the files ADDED by the
  * commits in the claimed window (append-mode change-data feed, the
  * public Delta/Iceberg streaming-source pattern). Together with
  * [[VersionedTable.appendBatch]] (exactly-once streaming ingest) this
  * closes the lake loop: a pipeline can stream INTO the table and any
  * number of downstream consumers can stream OUT of it, each resuming
  * from its own checkpointed version, never seeing a partial commit
  * (commits are atomic renames) and never rereading served data.
  *
  * Scale shape: discovering a batch costs one log-directory listing plus
  * the window's log files — never a data-directory listing, never a
  * snapshot scan (the defect that makes file-watching streams O(table)
  * per trigger). One input partition per added file preserves the
  * writer's parallelism. Overwrite commits surface their ADD side (the
  * re-frozen snapshot rows); their remove side is not streamable in an
  * append feed and is served by the batch [[VersionedTable.changesBetween]]
  * instead. Tailing a window whose files were [[VersionedTable.vacuum]]ed
  * fails loudly rather than silently skipping history.
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft.sources.VersionedStreamProvider")
  *   .option("path", tableRoot)           // required
  *   .option("startingVersion", "0")      // default 0 = full history
  *   .load()
  * }}}
  */
class VersionedStreamProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VersionedStreamProvider.tableSchema(options.get("path"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new VersionedStreamTable(
      properties.get("path"),
      Option(properties.get("startingVersion")).map(_.toLong).getOrElse(0L),
      schema)
}

object VersionedStreamProvider {
  /** Table schema straight from the parquet FOOTER of one live file at
    * the head version — metadata only. The supported lattice is the
    * engine's primitive surface (the versioned table stores columnar
    * relational data, not nested documents). */
  def tableSchema(root: String): StructType = {
    val t = new VersionedTable(root)
    val head = t.version
    require(head >= 0, s"cannot infer a schema from empty table $root")
    fromParquet(footerSchema(t.filesAt(head).head))
  }

  private[sources] def footerSchema(file: String): MessageType = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file), new Configuration()))
    try r.getFooter.getFileMetaData.getSchema finally r.close()
  }

  private[sources] def fromParquet(m: MessageType): StructType = {
    import PrimitiveType.PrimitiveTypeName._
    StructType(m.getFields.asScala.map { f =>
      require(f.isPrimitive, s"nested field ${f.getName} not supported")
      val p = f.asPrimitiveType()
      val dt = p.getPrimitiveTypeName match {
        case INT64 => LongType
        case INT32 => IntegerType
        case DOUBLE => DoubleType
        case FLOAT => FloatType
        case BOOLEAN => BooleanType
        case BINARY
          if p.getLogicalTypeAnnotation ==
            LogicalTypeAnnotation.stringType() => StringType
        case BINARY => BinaryType
        case other =>
          throw new IllegalArgumentException(
            s"unsupported parquet type $other for field ${f.getName}")
      }
      StructField(f.getName, dt,
        nullable = f.getRepetition != org.apache.parquet.schema.Type.Repetition.REQUIRED)
    }.toSeq)
  }
}

private[graft] class VersionedStreamTable(root: String, startingVersion: Long,
    schema0: StructType) extends Table with SupportsRead {
  override def name(): String = s"graft_versioned($root)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema0
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new VersionedMicroBatchStream(root, startingVersion, schema0)
      }
    }
}

/** Offset = highest table version already served. */
private[graft] case class VersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

private[graft] class VersionedMicroBatchStream(root: String,
    startingVersion: Long, schema: StructType)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private val table = new VersionedTable(root)

  // AvailableNow contract: pin the head at prepare time so the run
  // drains exactly the commits that existed when it started, then
  // terminates — commits racing in after prepare wait for the next run.
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(table.version)

  override def initialOffset(): Offset = VersionOffset(startingVersion - 1)

  // One log listing per trigger; a new commit is a new offset. Serving
  // lags the head by zero — the atomic rename IS publication.
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control source: use latestOffset(start, limit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    VersionOffset(availableNowCap.fold(table.version)(math.min(table.version, _)))

  override def deserializeOffset(json: String): Offset = VersionOffset(json.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].v
    val e = end.asInstanceOf[VersionOffset].v
    ((s + 1) to e).flatMap(table.filesAddedAt)
      .map(f => VersionedFilePartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VersionedReaderFactory(schema)
}

private[graft] case class VersionedFilePartition(file: String) extends InputPartition

/** Reads one committed parquet file into InternalRows via the public
  * parquet-mr record API, driven by the stream's inferred schema (the
  * table's own writer produced these files, so positions line up). */
private[graft] class VersionedReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[VersionedFilePartition].file
    new PartitionReader[InternalRow] {
      private val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file), new Configuration()))
      private val fileSchema = reader.getFooter.getFileMetaData.getSchema
      private val columnIO = new ColumnIOFactory().getColumnIO(fileSchema)
      private var groupReader: org.apache.parquet.io.RecordReader[Group] = _
      private var rowsLeft: Long = 0L
      private var current: Group = _

      private def advanceRowGroup(): Boolean = {
        val pages = reader.readNextRowGroup()
        if (pages == null) false
        else {
          groupReader = columnIO.getRecordReader(
            pages, new GroupRecordConverter(fileSchema))
          rowsLeft = pages.getRowCount
          true
        }
      }

      override def next(): Boolean = {
        while (rowsLeft == 0L) if (!advanceRowGroup()) return false
        current = groupReader.read()
        rowsLeft -= 1
        true
      }

      override def get(): InternalRow = {
        val vals = new Array[Any](schema.length)
        var i = 0
        while (i < schema.length) {
          vals(i) =
            if (current.getFieldRepetitionCount(i) == 0) null
            else schema(i).dataType match {
              case LongType => current.getLong(i, 0)
              case IntegerType => current.getInteger(i, 0)
              case DoubleType => current.getDouble(i, 0)
              case FloatType => current.getFloat(i, 0)
              case BooleanType => current.getBoolean(i, 0)
              case StringType =>
                UTF8String.fromBytes(current.getBinary(i, 0).getBytes)
              case BinaryType => current.getBinary(i, 0).getBytes
              case other =>
                throw new IllegalStateException(s"unsupported type $other")
            }
          i += 1
        }
        new GenericInternalRow(vals)
      }

      override def close(): Unit = reader.close()
    }
  }
}
