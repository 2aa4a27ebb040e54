package graft.sources

import java.nio.file.{Files, Paths}
import java.util.UUID

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

/** DSv2 WRITE path into [[VersionedTable]] — the two-phase lake writer:
  * every task streams its partition into its own parquet file under
  * `data/` (content-unique name, INVISIBLE until some commit references
  * it — staging is free by construction), its commit message carries the
  * file name, row count and optional min/max of the `statsCol` option
  * (harvested DURING the write, so the zone map costs nothing extra),
  * and the DRIVER then folds all messages into ONE atomic commit-log
  * rename. Task retries/speculation are safe: a losing attempt's file is
  * simply never referenced (and falls to vacuum). This is exactly the
  * Delta/Iceberg commit protocol shape; on a 1000-executor cluster the
  * only serialization point is the final single-file rename.
  *
  * Batch: `df.write.format("graft.sources.VersionedStreamProvider")
  * .option("path", root).mode("append"|"overwrite").save()` — append
  * commits add-only; overwrite arrives as SupportsTruncate and rebases
  * its remove set against the head on every race retry.
  *
  * Streaming: `df.writeStream.format(...)` — each epoch commits under
  * its epochId through the SAME batchId ledger [[VersionedTable.appendBatch]]
  * uses, so a replayed epoch (post-crash re-delivery) is recognized and
  * its staged files are dropped instead of committed: exactly-once table
  * state from an at-least-once stream, now as a first-class sink.
  */
private[graft] class VersionedWriteBuilder(root: String, info: LogicalWriteInfo,
    statsCol: Option[String]) extends WriteBuilder with SupportsTruncate {
  private var replace = false

  override def truncate(): WriteBuilder = { replace = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new VersionedBatchWrite(root, info.schema(), replace, statsCol)
    override def toStreaming: StreamingWrite =
      new VersionedStreamingWrite(root, info.schema(), statsCol)
  }
}

/** One staged file's coordinates, shipped task → driver. `stats` carries
  * an integer zone map, `sstats` a string one (col, minB64, maxB64 —
  * truncated bounds, same discipline as the library write path);
  * `bytes` is the staged file's on-disk size and `nulls` the stats
  * column's null count — all harvested DURING the task write, so the
  * committed add action carries the same `rows`/`bytes`/`nulls` fields
  * the library write path records (stats-served admission, planner row
  * counts, and null pruning work identically on DSv2-written tables). */
private[graft] case class StagedFileMessage(name: String, rows: Long,
    bytes: Long,
    stats: Option[(String, Long, Long)],
    sstats: Option[(String, String, String)] = None,
    nulls: Option[(String, Long)] = None) extends WriterCommitMessage

private[graft] class VersionedBatchWrite(root: String, schema: StructType,
    replace: Boolean, statsCol: Option[String]) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new VersionedWriterFactory(root, schema, statsCol)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val t = new VersionedTable(root)
    val adds = VersionedWriteCommit.addActions(messages)
    var validated: Map[String, String] = null
    var committed = false
    while (!committed) {
      val head = t.version
      val st = t.stateAtOrEmpty(head) // ONE fold per attempt
      // CHECK constraints gate this path too: staged files are invisible
      // until the commit, so reading them back pre-commit is race-free;
      // a violation throws and the engine's abort() drops the staging
      val cs = st.constraints.toMap
      if (cs != validated) {
        VersionedWriteCommit.enforceStaged(t, root, messages, cs)
        validated = cs
      }
      val current = st.schemaB64.map(VersionedTable.decodeSchema)
      val actions =
        if (replace) {
          val removes = st.adds.keys.toSeq
          t.metaLine("overwrite", schema) +:
            (removes.map(f => t.removeLine(f, st)) ++ adds)
        } else
          t.metaLine("append", t.unionSchema(current, schema)) +: adds
      committed = t.commit(head + 1, actions)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    VersionedWriteCommit.dropStaged(root, messages)
}

private[graft] class VersionedStreamingWrite(root: String, schema: StructType,
    statsCol: Option[String]) extends StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new VersionedWriterFactory(root, schema, statsCol)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val t = new VersionedTable(root)
    val adds = VersionedWriteCommit.addActions(messages)
    var validated: Map[String, String] = null
    var done = false
    while (!done) {
      val head = t.version
      val st = t.stateAtOrEmpty(head) // ONE fold per attempt
      if (st.batchIds.contains(epochId)) {
        // replayed epoch: the first delivery won — drop the duplicates
        VersionedWriteCommit.dropStaged(root, messages)
        done = true
      } else {
        val cs = st.constraints.toMap
        if (cs != validated) {
          VersionedWriteCommit.enforceStaged(t, root, messages, cs)
          validated = cs
        }
        val current = st.schemaB64.map(VersionedTable.decodeSchema)
        val actions = t.metaLine("append",
          t.unionSchema(current, schema), s""","batchId":$epochId""") +: adds
        done = t.commit(head + 1, actions)
      }
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    VersionedWriteCommit.dropStaged(root, messages)
}

private[graft] object VersionedWriteCommit {
  def addActions(messages: Array[WriterCommitMessage]): Seq[String] =
    messages.toSeq.collect {
      case StagedFileMessage(name, rows, bytes, stats, sstats, nulls)
          if rows > 0 =>
        // same additive stats fields as the library write path
        // (VersionedTable.stageMulti): rows + bytes always, the stats
        // column's null count when one was requested — a DSv2-written
        // table admits, reports statistics, and null-prunes identically
        val recorded = s""","rows":$rows,"bytes":$bytes""" +
          nulls.map { case (c, n) => s""","nulls":"$c:$n"""" }.getOrElse("")
        (stats, sstats) match {
          case (Some((c, lo, hi)), _) =>
            s"""{"op":"add","file":"$name","col":"$c","min":$lo,"max":$hi$recorded}"""
          case (_, Some((c, mn, mx))) =>
            s"""{"op":"add","file":"$name","scol":"$c","smin":"$mn","smax":"$mx"$recorded}"""
          case _ => s"""{"op":"add","file":"$name"$recorded}"""
        }
    }

  def dropStaged(root: String, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case m: StagedFileMessage =>
        Files.deleteIfExists(Paths.get(root, "data", m.name))
      case _ =>
    }

  /** Validate the epoch's staged (still-invisible) files against the
    * table's CHECK constraints — the DSv2 twin of the table-API write
    * gate. One parquet read-back of just-written files, one aggregate. */
  def enforceStaged(t: VersionedTable, root: String,
      messages: Array[WriterCommitMessage], cs: Map[String, String]): Unit = {
    if (cs.isEmpty) return
    val files = messages.toSeq.collect {
      case m: StagedFileMessage if m.rows > 0 =>
        Paths.get(root, "data", m.name).toString
    }
    if (files.isEmpty) return
    t.enforce(org.apache.spark.sql.SparkSession.active.read.parquet(files: _*),
      cs, "staged DSv2 write")
  }

  /** StructType → parquet message type for the engine's primitive
    * lattice (inverse of [[VersionedStreamProvider.fromParquet]]). */
  def toParquet(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      f.dataType match {
        case LongType => b.addField(Types.optional(INT64).named(f.name))
        case IntegerType => b.addField(Types.optional(INT32).named(f.name))
        case DoubleType => b.addField(Types.optional(DOUBLE).named(f.name))
        case FloatType => b.addField(Types.optional(FLOAT).named(f.name))
        case BooleanType => b.addField(Types.optional(BOOLEAN).named(f.name))
        case StringType => b.addField(Types.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name))
        case BinaryType => b.addField(Types.optional(BINARY).named(f.name))
        case other => throw new IllegalArgumentException(
          s"unsupported type $other for field ${f.name}")
      }
    }
    b.named("spark_schema")
  }
}

private[graft] class VersionedWriterFactory(root: String, schema: StructType,
    statsCol: Option[String])
    extends DataWriterFactory with StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new VersionedDataWriter(root, schema, statsCol, partitionId, taskId)

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new VersionedDataWriter(root, schema, statsCol, partitionId, taskId)
}

private[graft] class VersionedDataWriter(root: String, schema: StructType,
    statsCol: Option[String], partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val name =
    s"${UUID.randomUUID().toString.take(8)}-p$partitionId-t$taskId.parquet"
  private val file = Paths.get(root, "data", name)
  Files.createDirectories(file.getParent)

  private val messageType = VersionedWriteCommit.toParquet(schema)
  private val groups = new SimpleGroupFactory(messageType)
  private val writer = ExampleParquetWriter
    .builder(new HPath(file.toString)).withType(messageType).build()

  private val statsIdx = statsCol.map(schema.fieldIndex)
  private val statsIsString = statsIdx.exists(i => schema(i).dataType == StringType)
  private var rows = 0L
  private var statNulls = 0L
  private var lo = Long.MaxValue
  private var hi = Long.MinValue
  private var sLo: Array[Byte] = null
  private var sHi: Array[Byte] = null

  override def write(row: InternalRow): Unit = {
    val g = groups.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val n = schema(i).name
        schema(i).dataType match {
          case LongType => g.append(n, row.getLong(i))
          case IntegerType => g.append(n, row.getInt(i))
          case DoubleType => g.append(n, row.getDouble(i))
          case FloatType => g.append(n, row.getFloat(i))
          case BooleanType => g.append(n, row.getBoolean(i))
          case StringType => g.append(n,
            Binary.fromConstantByteArray(row.getUTF8String(i).getBytes))
          case BinaryType => g.append(n,
            Binary.fromConstantByteArray(row.getBinary(i)))
          case other => throw new IllegalStateException(s"unsupported $other")
        }
      }
      i += 1
    }
    statsIdx.foreach { s =>
      if (row.isNullAt(s)) statNulls += 1
      else {
        schema(s).dataType match {
          case LongType | IntegerType =>
            val v = if (schema(s).dataType == LongType) row.getLong(s)
              else row.getInt(s).toLong
            if (v < lo) lo = v
            if (v > hi) hi = v
          case StringType =>
            // getBytes may return the row's shared buffer — copy before
            // keeping a reference across rows
            val b = row.getUTF8String(s).getBytes
            if (sLo == null || VersionedTable.ucmp(b, sLo) < 0)
              sLo = java.util.Arrays.copyOf(b, b.length)
            if (sHi == null || VersionedTable.ucmp(b, sHi) > 0)
              sHi = java.util.Arrays.copyOf(b, b.length)
          case other => throw new IllegalStateException(
            s"statsCol must be integer- or string-typed, got $other")
        }
      }
    }
    writer.write(g)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    if (rows == 0) {
      Files.deleteIfExists(file)
      return StagedFileMessage(name, 0L, 0L, None)
    }
    val bytes = Files.size(file)
    val nc = statsCol.map((_, statNulls))
    if (statsIsString) {
      // truncated bounds, same soundness discipline as the library path;
      // an un-incrementable max drops the stat (file stays a candidate)
      val ss = for {
        mn <- Option(sLo).map(VersionedTable.truncMin)
        mx <- Option(sHi).flatMap(VersionedTable.truncMax)
        c <- statsCol
      } yield (c, VersionedTable.b64(mn), VersionedTable.b64(mx))
      StagedFileMessage(name, rows, bytes, None, ss, nc)
    } else StagedFileMessage(name, rows, bytes,
      statsCol.filter(_ => lo <= hi).map((_, lo, hi)), None, nc)
  }

  override def abort(): Unit = { writer.close(); Files.deleteIfExists(file) }

  override def close(): Unit = ()
}
