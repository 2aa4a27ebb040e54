package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SRC-2 in production shape: the Kafka PRODUCER side of the pipeline
  * (reference: kafka_producer/reddit_collector_kafka.py:16-30 — a
  * KafkaProducer publishing JSON-serialized posts to a topic) as a full
  * DataSource V2 streaming sink. There is no broker in this environment,
  * so the topic is a local partitioned spool directory — but every piece
  * of the producer CONTRACT is real and is what a broker-backed sink
  * would run:
  *
  *   - '''Key partitioning''': each record lands in partition
  *     `murmur2(keyBytes) & 0x7fffffff % numPartitions`, Kafka's default
  *     partitioner (the public murmur2 algorithm with Kafka's seed
  *     `0x9747b28c`), so records for one key are totally ordered within
  *     one partition — the ordering guarantee consumers rely on. Null
  *     keys fall back deterministically to the task's Spark partition id
  *     (the testable stand-in for Kafka's sticky null-key partitioner).
  *   - '''Executor-side data, driver-side metadata''': writer tasks
  *     append records straight to per-(epoch, task, partition) staging
  *     files; the commit message carries only PATHS. At 100 TB the data
  *     plane never funnels through the driver — `commit` is a rename +
  *     one marker write, exactly the FileStreamSink/transactional-
  *     producer split.
  *   - '''Exactly-once publish''': an epoch becomes visible via a single
  *     atomic commit-marker write in `_commits/`; a replayed epoch
  *     (failure after data movement, before/after the marker) is
  *     idempotent — deterministic file names make re-moves overwrite
  *     bit-identical content and an existing marker turns the whole
  *     commit into a no-op, Kafka's (producerId, epoch) transactional
  *     dedup in file-system form. Readers (`KafkaSpool.readCommitted`)
  *     see only marked epochs: read-committed isolation.
  *
  * Wire shape in = wire shape out: the sink consumes the
  * `Pipeline.serialize` frame (`key` STRING nullable, `value` STRING),
  * and each spool line is exactly the bytes a Kafka consumer's
  * `CAST(value AS STRING)` would see, so
  * `Pipeline.parse(KafkaSpool.readCommitted(...))` closes the loop.
  */
class KafkaSpoolSinkProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaSpool.wireSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KafkaSpoolTable(
      properties.get("path"),
      Option(properties.get("numPartitions")).map(_.toInt).getOrElse(4),
      schema)
}

object KafkaSpool {
  import org.apache.spark.sql.types.{StringType, StructField}

  /** Producer record shape: nullable key, required value. */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = false)))

  /** Kafka's murmur2 (public algorithm, seed 0x9747b28c) — the hash
    * behind the default partitioner. Implemented here because no Kafka
    * client exists in this environment; pinned by `KafkaSpoolSinkSpec`
    * (avalanche + stability properties and the positive-mask contract).
    */
  def murmur2(data: Array[Byte]): Int = {
    val length = data.length
    val m = 0x5bd1e995
    val r = 24
    var h = 0x9747b28c ^ length
    var i = 0
    while (i + 4 <= length) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 4
    }
    val tail = length & ~3
    (length % 4) match {
      case 3 =>
        h ^= (data(tail + 2) & 0xff) << 16
        h ^= (data(tail + 1) & 0xff) << 8
        h ^= data(tail) & 0xff
        h *= m
      case 2 =>
        h ^= (data(tail + 1) & 0xff) << 8
        h ^= data(tail) & 0xff
        h *= m
      case 1 =>
        h ^= data(tail) & 0xff
        h *= m
      case _ => ()
    }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }

  /** Default-partitioner assignment: positive-masked murmur2 mod N. */
  def partitionFor(key: String, numPartitions: Int): Int =
    (murmur2(key.getBytes(StandardCharsets.UTF_8)) & 0x7fffffff) % numPartitions

  /** Read-committed consumer view of a spool: only epochs whose commit
    * marker exists are visible. Returns (partition INT, value STRING)
    * with the partition recovered from the directory layout.
    */
  private def listDir(p: Path): List[Path] =
    if (!Files.isDirectory(p)) Nil
    else {
      val s = Files.list(p)
      try s.iterator().asScala.toList finally s.close()
    }

  def readCommitted(spark: SparkSession, root: String): DataFrame = {
    val committed = committedEpochs(root).toSet
    val files = listDir(Paths.get(root))
      .filter(_.getFileName.toString.startsWith("p="))
      .flatMap(listDir)
      .filter { f =>
        val n = f.getFileName.toString
        n.startsWith("epoch-") &&
          committed.contains(n.stripPrefix("epoch-").takeWhile(_ != '-').toLong)
      }
      .map(_.toString)
    if (files.isEmpty) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          org.apache.spark.sql.types.StructField("partition",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.StringType))))
    } else {
      spark.read.textFile(files: _*).toDF("value")
        .withColumn("partition",
          regexp_extract(input_file_name(), "p=(\\d+)/", 1).cast("int"))
        .select(col("partition"), col("value"))
    }
  }

  def committedEpochs(root: String): Seq[Long] =
    listDir(Paths.get(root, "_commits"))
      .map(_.getFileName.toString)
      .filterNot(_.startsWith("."))
      .map(_.toLong).sorted
}

private[graft] class KafkaSpoolTable(path: String, numPartitions: Int,
    schema0: StructType) extends Table with SupportsWrite {
  override def name(): String = s"graft_kafka_spool($path)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.STREAMING_WRITE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite =
          new KafkaSpoolStreamingWrite(path, numPartitions, info.schema())
      }
    }
}

/** Commit message: only the staged file paths and their target
  * partitions — the data plane stays on the executors.
  */
private[graft] case class SpoolStaged(
    files: Seq[(Int, String)], sparkPartitionId: Int) extends WriterCommitMessage

private[graft] class KafkaSpoolStreamingWrite(root: String, numPartitions: Int,
    schema: StructType) extends StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val keyIdx = schema.fieldNames.indexOf("key")
    val valueIdx = schema.fieldNames.indexOf("value")
    require(valueIdx >= 0, "kafka spool sink needs a `value` column")
    new KafkaSpoolWriterFactory(root, numPartitions, keyIdx, valueIdx)
  }

  /** Publish an epoch: move staged segments to their deterministic
    * committed names, then write the commit marker atomically. A replay
    * of an already-marked epoch is a no-op; a replay of a half-moved
    * epoch re-moves bit-identical files to the same names.
    *
    * A replay is NOT guaranteed the same task layout as the crashed
    * attempt (task ids shift, a null-key fallback partition follows the
    * Spark partition id) — so before the marker is written, any
    * `epoch-$epochId-*` file the crashed attempt moved under a name THIS
    * commit does not produce is swept, otherwise it would become visible
    * as duplicate records the moment the marker lands. The epoch's
    * `_staging` directory is removed after publication; both sweeps key
    * on the epoch id, so concurrent epochs are untouched.
    */
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val marker = Paths.get(root, "_commits", epochId.toString)
    if (Files.exists(marker)) return // idempotent replay
    val produced = scala.collection.mutable.Set.empty[Path]
    messages.foreach {
      case SpoolStaged(files, pid) => files.foreach { case (k, staged) =>
        val from = Paths.get(staged)
        val dir = Paths.get(root, s"p=$k")
        val dst = dir.resolve(s"epoch-$epochId-task-$pid.txt")
        if (Files.exists(from)) {
          Files.createDirectories(dir)
          Files.move(from, dst, StandardCopyOption.REPLACE_EXISTING)
        }
        // an already-moved replay (staged gone, dst present) still OWNS
        // its committed name — record it either way
        produced += dst.toAbsolutePath.normalize
      }
      case _ => ()
    }
    // sweep the crashed attempt's orphans: epoch files nobody re-produced
    listDir(Paths.get(root))
      .filter(_.getFileName.toString.startsWith("p="))
      .flatMap(listDir)
      .filter(_.getFileName.toString.startsWith(s"epoch-$epochId-"))
      .filterNot(f => produced.contains(f.toAbsolutePath.normalize))
      .foreach(Files.deleteIfExists(_))
    val stagingDir = Paths.get(root, "_staging", s"epoch-$epochId")
    listDir(stagingDir).foreach(Files.deleteIfExists(_))
    // a zombie/speculative task may stage a NEW segment between the
    // listing and this delete; its file is unreferenced (falls to the
    // next replay's sweep) and must not fail the commit
    try Files.deleteIfExists(stagingDir)
    catch { case _: java.nio.file.DirectoryNotEmptyException => () }
    Files.createDirectories(marker.getParent)
    val tmp = marker.getParent.resolve(s".${epochId}.tmp")
    Files.write(tmp, Array.emptyByteArray)
    Files.move(tmp, marker, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def listDir(p: Path): List[Path] =
    if (!Files.isDirectory(p)) Nil
    else {
      val s = Files.list(p)
      try s.iterator().asScala.toList finally s.close()
    }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case SpoolStaged(files, _) =>
        files.foreach { case (_, staged) =>
          Files.deleteIfExists(Paths.get(staged))
        }
      case _ => ()
    }
}

private[graft] class KafkaSpoolWriterFactory(root: String, numPartitions: Int,
    keyIdx: Int, valueIdx: Int) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new KafkaSpoolDataWriter(root, numPartitions, keyIdx, valueIdx,
      partitionId, taskId, epochId)
}

private[graft] class KafkaSpoolDataWriter(root: String, numPartitions: Int,
    keyIdx: Int, valueIdx: Int, sparkPartitionId: Int, taskId: Long,
    epochId: Long) extends DataWriter[InternalRow] {

  // One staged segment per target partition this task actually hits;
  // opened lazily so an idle (partition, task) stages nothing.
  private val open = scala.collection.mutable.Map.empty[Int, java.io.BufferedWriter]
  private val staged = scala.collection.mutable.Map.empty[Int, Path]

  private def writerFor(k: Int): java.io.BufferedWriter =
    open.getOrElseUpdate(k, {
      val dir = Paths.get(root, "_staging", s"epoch-$epochId")
      Files.createDirectories(dir)
      val p = dir.resolve(s"task-$sparkPartitionId-$taskId-p$k.txt")
      staged(k) = p
      Files.newBufferedWriter(p, StandardCharsets.UTF_8,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    })

  override def write(row: InternalRow): Unit = {
    val value = row.getUTF8String(valueIdx).toString
    val k =
      if (keyIdx >= 0 && !row.isNullAt(keyIdx))
        KafkaSpool.partitionFor(row.getUTF8String(keyIdx).toString, numPartitions)
      else sparkPartitionId % numPartitions
    val w = writerFor(k)
    w.write(value)
    w.write('\n')
  }

  override def commit(): WriterCommitMessage = {
    open.values.foreach(_.close())
    SpoolStaged(staged.toSeq.map { case (k, p) => (k, p.toString) },
      sparkPartitionId)
  }

  override def abort(): Unit = {
    open.values.foreach(_.close())
    staged.values.foreach(Files.deleteIfExists(_))
  }

  override def close(): Unit = ()
}
