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
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, Literal => V2Literal, NamedReference, NullOrdering, SortDirection, SortOrder}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsPushDownTopN, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxBytes, ReadMaxFiles, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual}
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
  * The same provider also serves BATCH reads with planner-integrated
  * pruning (`versionAsOf` time travel, zone-map file skipping from
  * pushed filters, physical column pruning down to the parquet chunks)
  * — see [[VersionedScanBuilder]].
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft.sources.VersionedStreamProvider")
  *   .option("path", tableRoot)           // required
  *   .option("startingVersion", "0")      // default 0 = full history
  *   .option("maxFilesPerTrigger", "8")   // admission control: cap the
  *   .option("maxRowsPerTrigger", "100000") // commits claimed per batch
  *   .option("maxBytesPerTrigger", "134217728") // by file/row/byte budget
  *   .option("changeFeed", "true")        // CDC rows with _change_type/
  *                                        //   _commit_version columns
  *   .option("failOnDataLoss", "false")   // skip vacuumed windows
  *                                        //   instead of failing (the
  *                                        //   Delta-shaped control;
  *                                        //   default true = fail loud)
  *   .load()
  * spark.read.format("graft.sources.VersionedStreamProvider")
  *   .option("path", tableRoot)
  *   .option("versionAsOf", "1")          // default: head version
  *   .load()
  * }}}
  */
class VersionedStreamProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val base = VersionedStreamProvider.tableSchema(options.get("path"))
    // the change feed widens the row with its CDC tag column — the
    // Delta readChangeFeed shape. The name is RESERVED under the
    // option (Delta reserves its CDF columns the same way): a table
    // that already carries a column of that name would both duplicate
    // the field and let stale file values masquerade as feed tags.
    if (options.getBoolean("changeFeed", false)) {
      Seq(VersionedStreamProvider.ChangeTypeCol,
          VersionedStreamProvider.ChangeVersionCol).foreach { c =>
        require(!base.fieldNames.contains(c),
          s"table already has a '$c' column; the name is reserved by " +
            "the changeFeed option")
      }
      base.add(VersionedStreamProvider.ChangeTypeCol, StringType, nullable = false)
        .add(VersionedStreamProvider.ChangeVersionCol, LongType, nullable = false)
    } else base
  }

  // writes hand us the frame's schema directly instead of forcing an
  // inferSchema on a possibly-empty table
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    val changeFeed = Option(properties.get("changeFeed")).exists(_.toBoolean)
    // Re-validate the changeFeed schema contract HERE, where the FINAL
    // schema is known: a reader supplying an explicit schema via
    // spark.readStream.schema(...) bypasses inferSchema entirely, and
    // without this check it would silently stream a feed missing its
    // tag columns — or let a user-declared `_change_type` masquerade
    // as the synthesized one.
    if (changeFeed) {
      Seq(VersionedStreamProvider.ChangeTypeCol,
          VersionedStreamProvider.ChangeVersionCol).foreach { c =>
        require(schema.fieldNames.contains(c),
          s"changeFeed schema must carry the '$c' column the feed " +
            "synthesizes; omit .schema(...) to infer it")
      }
      val t = new VersionedTable(path)
      if (t.version >= 0) {
        val base = VersionedStreamProvider.tableSchema(path)
        Seq(VersionedStreamProvider.ChangeTypeCol,
            VersionedStreamProvider.ChangeVersionCol).foreach { c =>
          require(!base.fieldNames.contains(c),
            s"table already has a '$c' column; the name is reserved by " +
              "the changeFeed option")
        }
      }
    }
    new VersionedStreamTable(
      path,
      Option(properties.get("startingVersion")).map(_.toLong).getOrElse(0L),
      Option(properties.get("versionAsOf")).map(_.toLong),
      Option(properties.get("statsCol")),
      Option(properties.get("maxFilesPerTrigger")).map(_.toInt),
      Option(properties.get("maxRowsPerTrigger")).map(_.toLong),
      Option(properties.get("maxBytesPerTrigger")).map(_.toLong),
      changeFeed,
      Option(properties.get("failOnDataLoss")).forall(_.toBoolean),
      schema)
  }
}

object VersionedStreamProvider {
  /** The CDC tag column the `changeFeed` streaming option appends:
    * `insert` for rows a commit added, `delete` for rows a merge-on-read
    * delete's vector growth removed. */
  val ChangeTypeCol = "_change_type"

  /** The CDC ordering column the `changeFeed` option appends: the
    * commit version each change row belongs to — what a consumer
    * reconciling out-of-order or replayed windows keys its merge on
    * (the Delta readChangeFeed `_commit_version` shape; this table's
    * log records no wall-clock, so there is no timestamp twin). */
  val ChangeVersionCol = "_commit_version"

  /** Table schema: the LOG-CARRIED schema of the head version when
    * recorded (so evolved columns appear even though old files lack
    * them), else straight from one parquet FOOTER — metadata only either
    * way. The supported lattice is the engine's primitive surface (the
    * versioned table stores columnar relational data, not nested
    * documents). */
  def tableSchema(root: String): StructType = {
    val t = new VersionedTable(root)
    val head = t.version
    require(head >= 0, s"cannot infer a schema from empty table $root")
    t.schemaAt(head).getOrElse {
      val files = t.filesAt(head)
      require(files.nonEmpty,
        s"table $root head v$head has no live files and no recorded " +
          "schema; cannot infer (only possible in pre-schema-tracking logs)")
      fromParquet(footerSchema(files.head))
    }
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
    versionAsOf: Option[Long], statsCol: Option[String],
    maxFilesPerTrigger: Option[Int], maxRowsPerTrigger: Option[Long],
    maxBytesPerTrigger: Option[Long], changeFeed: Boolean,
    failOnDataLoss: Boolean, schema0: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_versioned($root)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new VersionedScanBuilder(root, startingVersion, versionAsOf,
      maxFilesPerTrigger, maxRowsPerTrigger, maxBytesPerTrigger,
      changeFeed, failOnDataLoss, schema0)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new VersionedWriteBuilder(root, info, statsCol)
}

/** Planner-integrated pruning: column pruning reaches the parquet CHUNK
  * reads (only projected columns' pages are decoded) and comparison
  * filters on integer columns reach the commit log's zone maps (files
  * whose recorded [min, max] cannot match are never opened). Both arrive
  * through the standard DSv2 pushdown hooks, so `.explain` shows them on
  * the scan — no out-of-band `readWhere` call needed. Filters are also
  * kept as residuals (Spark re-evaluates row-level), so skipping only
  * has to be SOUND, never complete. */
private[graft] class VersionedScanBuilder(root: String, startingVersion: Long,
    versionAsOf: Option[Long], maxFilesPerTrigger: Option[Int],
    maxRowsPerTrigger: Option[Long], maxBytesPerTrigger: Option[Long],
    changeFeed: Boolean, failOnDataLoss: Boolean, schema0: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit
    with SupportsPushDownTopN {

  private var requested: StructType = schema0
  private var skipping: Array[Filter] = Array.empty
  private var limitN: Option[Int] = None
  private var topN: Option[TopNSpec] = None
  private var aggServed: Option[(StructType, Array[Any])] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    skipping = filters.filter(VersionedScan.statsUsable)
    filters // every filter stays a residual: zone maps skip files, not rows
  }

  override def pushedFilters(): Array[Filter] = skipping

  override def pruneColumns(required: StructType): Unit = requested = required

  /** LIMIT pushdown: serve only enough FILES to cover `n` rows
    * ([[VersionedScan.planInputPartitions]] caps the candidate list by
    * the log's recorded visible-row counts). Always partial — Spark
    * keeps its own Limit on top, so over-serving is trimmed and a
    * stats-less candidate (unknown rows) never under-delivers (it
    * counts as zero known rows, so the cap keeps admitting files).
    * Spark only pushes a limit when every filter above the scan was
    * FULLY pushed; this source keeps all filters as residuals, so the
    * pushdown fires exactly on bare `table.limit(n)` scans — where a
    * 10-row peek at a 10k-file table plans one partition, not 10k. */
  override def pushLimit(n: Int): Boolean = { limitN = Some(n); true }

  override def isPartiallyPushed(): Boolean = true

  /** TopN (ORDER BY + LIMIT) pushdown, the ordered twin of
    * [[pushLimit]]: when the LEADING sort key is an integer column,
    * the scan serves only the files whose recorded interval can hold
    * one of the n extreme rows ([[VersionedScan.planInputPartitions]]
    * runs the coverage proof against the zone maps). Pruning on the
    * first key alone is sound for a multi-key order — any row whose
    * leading value lies beyond n provably-covered rows can never enter
    * the lexicographic top-n — and the pushdown is always PARTIAL
    * (Spark keeps the full Sort+Limit), so the scan only has to serve
    * a SUPERSET of the true top-n. This is the "newest 100 events of a
    * time-ordered 100-TB table" shape: the plan reads the tail files,
    * not the table. */
  override def pushTopN(orders: Array[SortOrder], n: Int): Boolean = {
    if (changeFeed || skipping.nonEmpty || orders.isEmpty) return false
    val head = orders.head
    val col = head.expression() match {
      case f: NamedReference if f.fieldNames().length == 1 =>
        Some(f.fieldNames()(0))
      case _ => None
    }
    col.filter(c => schema0.find(_.name == c).map(_.dataType)
        .exists(t => t == LongType || t == IntegerType)) match {
      case Some(c) =>
        topN = Some(TopNSpec(c,
          head.direction() == SortDirection.DESCENDING,
          head.nullOrdering() == NullOrdering.NULLS_FIRST, n))
        true
      case None => false
    }
  }

  /** Aggregate pushdown: answer a global aggregate STRAIGHT FROM THE
    * COMMIT LOG when the recorded stats prove the exact result — the
    * lake engines' metadata-only `SELECT count(*)` (zero data files
    * opened at any table size). Complete pushdown only, and only when
    * provably exact:
    *   - `count(*)` = Σ(recorded rows − deletion-vector cardinality):
    *     exact even under merge-on-read deletes;
    *   - `count(col)` = Σ(rows − recorded null count of col), only on
    *     DV-free files (a vector could have removed null or non-null
    *     rows — unknowable from metadata);
    *   - `min/max(col)` from the INTEGER zone maps, only on DV-free
    *     files (a vector could have removed the extreme row) and never
    *     from string bounds (those are truncated — sound for pruning,
    *     not exact for answers); recorded all-null files contribute
    *     nothing, exactly like the aggregate semantics.
    * Any file missing the needed stat refuses the WHOLE pushdown and
    * the ordinary scan runs — exactness is proven, never assumed. A
    * grouped, filtered (residuals pending — Spark never offers those),
    * distinct, or changeFeed aggregation always refuses. */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    serveAggregation(agg)

  override def pushAggregation(agg: Aggregation): Boolean =
    serveAggregation(agg)

  private def serveAggregation(agg: Aggregation): Boolean = {
    if (aggServed.isDefined) return true // supportCompletePushDown ran
    if (changeFeed || skipping.nonEmpty || limitN.isDefined ||
        topN.isDefined || agg.groupByExpressions().nonEmpty) return false
    val table = new VersionedTable(root)
    val head = versionAsOf.getOrElse(table.version)
    if (head < 0) return false // empty table: nothing provable to serve
    val st = table.stateAt(head)
    val cand = st.adds.toSeq
    def colName(e: V2Expression): Option[String] = e match {
      case f: NamedReference if f.fieldNames().length == 1 =>
        Some(f.fieldNames()(0))
      case _ => None
    }
    def dvCard(f: String): Long = st.dv.get(f).map(_.cardinality).getOrElse(0L)
    def intType(c: String): Option[DataType] =
      schema0.find(_.name == c).map(_.dataType)
        .filter(t => t == LongType || t == IntegerType)
    def retyped(v: Long, dt: DataType): Any =
      if (dt == IntegerType) Int.box(v.toInt) else Long.box(v)
    val out = agg.aggregateExpressions().toSeq.map {
      case _: CountStar =>
        val rows = cand.map { case (f, line) =>
          VersionedTable.nullStatsOf(line).map(_._1 - dvCard(f))
        }
        if (rows.exists(_.isEmpty)) return false
        Some((StructField("count_star", LongType, nullable = false),
          Long.box(math.max(0L, rows.flatten.sum)): Any))
      case c: Count if !c.isDistinct =>
        colName(c.column()).flatMap { col =>
          // a deletion vector makes the null-ness of the removed rows
          // unknowable — EXCEPT when the file records zero nulls on the
          // column, where every removed row was provably non-null and
          // the visible count is rows − cardinality exactly
          val counts = cand.map { case (f, line) =>
            VersionedTable.nullStatsOf(line).collect {
              case (r, nulls) if nulls.contains(col) &&
                  (dvCard(f) == 0L || nulls(col) == 0L) =>
                r - nulls(col) - dvCard(f)
            }
          }
          if (counts.exists(_.isEmpty)) None
          else Some((StructField(s"count_$col", LongType, nullable = false),
            Long.box(math.max(0L, counts.flatten.sum)): Any))
        }
      case m: Min =>
        colName(m.column()).flatMap(col => intType(col).flatMap { dt =>
          boundSide(cand, st, col, isMax = false).map(b =>
            (StructField(s"min_$col", dt, nullable = true),
              b.map(x => retyped(x, dt)).orNull: Any))
        })
      case m: Max =>
        colName(m.column()).flatMap(col => intType(col).flatMap { dt =>
          boundSide(cand, st, col, isMax = true).map(b =>
            (StructField(s"max_$col", dt, nullable = true),
              b.map(x => retyped(x, dt)).orNull: Any))
        })
      case _ => None
    }
    if (out.exists(_.isEmpty)) return false
    val fields = out.flatten
    aggServed = Some((StructType(fields.map(_._1)), fields.map(_._2).toArray))
    true
  }

  /** One PROVABLE extreme of `col` over the candidate files, from the
    * integer zone maps. A DV-FREE file ATTAINS its recorded bound (the
    * footer min/max is exact and all its rows are live); a DV'd file's
    * live rows merely lie WITHIN its interval — they may attain
    * neither end, or all be deleted. So the global extreme is provable
    * exactly when the best DV-free bound DOMINATES every DV'd file's
    * interval on that side: the answer is attained by a live row and
    * nothing vectored could exceed it. A vector on a NON-extreme file
    * never blocks the answer, and min can stay provable while max is
    * not. Some(None) = every file is provably all-null/empty (the
    * aggregate is NULL); None = unprovable (missing bounds on a
    * non-all-null file, or a DV'd interval past the free bound). */
  private def boundSide(cand: Seq[(String, String)], st: TableState,
      col: String, isMax: Boolean): Option[Option[Long]] = {
    def better(a: Long, b: Long): Long = if (isMax) math.max(a, b) else math.min(a, b)
    var free: Option[Long] = None
    var dvd: Option[Long] = None
    cand.foreach { case (f, line) =>
      val zm = VersionedTable.longStatsOf(line).toMap.get(col)
      val allNull =
        VersionedTable.allNullOn(line, col) ||
          VersionedTable.nullStatsOf(line).exists(_._1 == 0L)
      if (!allNull) {
        if (zm.isEmpty) return None
        val v = if (isMax) zm.get._2 else zm.get._1
        if (st.dv.get(f).exists(_.cardinality > 0L))
          dvd = Some(dvd.fold(v)(better(_, v)))
        else free = Some(free.fold(v)(better(_, v)))
      }
    }
    free match {
      case None => if (dvd.isEmpty) Some(None) else None
      case Some(fv) =>
        if (dvd.exists(dv => better(dv, fv) != fv)) None else Some(Some(fv))
    }
  }

  override def build(): Scan = aggServed match {
    case Some((schema, row)) => new VersionedAggScan(root, schema, row)
    case None =>
      new VersionedScan(root, startingVersion, versionAsOf,
        maxFilesPerTrigger, maxRowsPerTrigger, maxBytesPerTrigger,
        changeFeed, failOnDataLoss, requested, skipping, limitN, topN)
  }
}

/** One pushed ORDER BY <col> [DESC] [NULLS FIRST] LIMIT n — only the
  * LEADING sort key, which is all file-level pruning needs. */
private[graft] case class TopNSpec(col: String, desc: Boolean,
    nullsFirst: Boolean, n: Int)

/** The metadata-answered aggregate scan: ONE input partition carrying
  * the already-proven values ([[VersionedScanBuilder.pushAggregation]]),
  * one emitted row, zero data files opened. */
private[graft] class VersionedAggScan(root: String, schema: StructType,
    row: Array[Any]) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_versioned($root, metadata-aggregate ${schema.fieldNames.mkString(",")})"
  override def planInputPartitions(): Array[InputPartition] =
    Array(VersionedAggPartition(row))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var served = false
          override def next(): Boolean =
            if (served) false else { served = true; true }
          override def get(): InternalRow =
            new GenericInternalRow(
              p.asInstanceOf[VersionedAggPartition].values.clone())
          override def close(): Unit = ()
        }
    }
}

private[graft] case class VersionedAggPartition(values: Array[Any])
    extends InputPartition

private[graft] class VersionedScan(root: String, startingVersion: Long,
    versionAsOf: Option[Long], maxFilesPerTrigger: Option[Int],
    maxRowsPerTrigger: Option[Long], maxBytesPerTrigger: Option[Long],
    changeFeed: Boolean, failOnDataLoss: Boolean,
    requested: StructType, skipping: Array[Filter],
    limitN: Option[Int] = None, topN: Option[TopNSpec] = None)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeV2Filtering {
  private val table = new VersionedTable(root)

  override def readSchema(): StructType = requested

  override def description(): String = {
    val v = versionAsOf.map(v => s"versionAsOf=$v").getOrElse("head")
    s"graft_versioned($root, $v, skipFilters=${skipping.mkString("[", ",", "]")})"
  }

  override def toBatch: Batch = {
    require(!changeFeed,
      "changeFeed is a STREAMING option (readStream); batch consumers " +
        "read VersionedTable.changesBetween for windowed CDC")
    this
  }

  // set when this scan serves a STREAM: estimateStatistics then
  // reports unknown — head-snapshot stats would mis-describe a
  // micro-batch (the drain replays history, not the head) and the
  // per-trigger computeStats would otherwise pay an O(live files)
  // stat sweep, the exact per-trigger table scan this source forswears
  @volatile private var streamingMode = false

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    streamingMode = true
    new VersionedMicroBatchStream(root, startingVersion,
      maxFilesPerTrigger, maxRowsPerTrigger, maxBytesPerTrigger,
      changeFeed, failOnDataLoss, requested)
  }

  /** Runtime filters Catalyst delivered AFTER planning started —
    * dynamic file pruning (the DSv2 twin of dynamic partition
    * pruning): when a selective dimension filter feeds a join's build
    * side, Spark executes the build side first, collects the join-key
    * values, and hands them here as an IN-set; [[planInputPartitions]]
    * then re-prunes the candidate files against the SAME zone maps the
    * static pushed filters used. Arrives at most once per scan, before
    * partition planning (the BatchScanExec contract). */
  @volatile private var runtime: Array[Filter] = Array.empty

  /** Every projected column is runtime-filterable: the pruning is
    * sound on any column (files without stats on it just stay
    * candidates), and a join key is by construction in the scan's
    * output. */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    requested.fieldNames.map(
      org.apache.spark.sql.connector.expressions.Expressions.column)

  /** The NATIVE V2 runtime-filter face ([[SupportsRuntimeV2Filtering]]
    * — implemented directly rather than riding the interface's default
    * `PredicateUtils.toV1` bridge): V2 predicates translate straight
    * into the probe shapes the shared prune engine consumes, which
    * keeps filter shapes the V1 detour loses — a conjunction FLATTENS
    * into independent file probes (the bridge yields one
    * `sources.And`, which no zone-map probe consumes), null-safe
    * equality prunes through its null-rejecting twin, and a literal on
    * either side of a comparison normalizes to the column-first form.
    * Untranslatable shapes contribute no probe — sound, the residual
    * row filter keeps results exact. */
  override def filter(predicates: Array[V2Predicate]): Unit =
    filter(predicates.flatMap(VersionedScan.v2Probes))

  /** The V1-shaped probe sink the V2 face feeds (and specs drive
    * directly): keep only what the zone maps can act on. */
  private[graft] def filter(filters: Array[Filter]): Unit =
    runtime = filters.filter(VersionedScan.statsUsable)

  /** The candidate (file name, add line) set the pushed filters leave,
    * plus the folded state (for DV descriptors) — a LAZY SNAPSHOT
    * shared by partition planning and statistics reporting, so the two
    * resolve the SAME head version (a concurrent commit between stats
    * and planning cannot invalidate a broadcast decision) and a query
    * pays the log fold + per-line stats parse once, not per consumer.
    * Runtime filters do NOT enter the snapshot: they re-prune this
    * list at partition-planning time ([[planInputPartitions]]), so the
    * statistics Catalyst already planned on stay those of the static
    * scan, and the same head version serves both passes. */
  private lazy val candidates: (TableState, Seq[(String, String)]) = {
    val v = versionAsOf.getOrElse(table.version)
    val st = table.stateAt(v)
    (st, VersionedScan.prune(st.adds.toSeq, skipping))
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (st, cand) = candidates
    // dynamic file pruning: the runtime IN-set (if any) re-prunes the
    // statically-pruned snapshot — always a SUBSET of the planned
    // candidates, as BatchScanExec's re-planning contract requires
    val pruned =
      if (runtime.isEmpty) cand else VersionedScan.prune(cand, runtime)
    // pushed LIMIT: stop admitting files once the log-recorded visible
    // rows (add-time count minus DV cardinality) PROVABLY cover n —
    // a stats-less file counts as zero known rows, so the cap can only
    // over-serve (Spark's retained Limit trims), never under-deliver.
    // Only reachable filter-free (Spark's pushdown contract; the
    // runtime guard is belt-and-braces — a join on top of a Limit
    // never re-plans this scan). A pushed TOP-N instead keeps exactly
    // the files whose interval can hold one of the n extreme rows.
    val served = (topN, limitN) match {
      case (Some(t), _) if skipping.isEmpty && runtime.isEmpty =>
        topNServe(st, pruned, t)
      case (_, Some(n)) if skipping.isEmpty && runtime.isEmpty =>
        var known = 0L
        pruned.takeWhile { case (name, line) =>
          val take = known < n
          if (take) known += math.max(0L,
            VersionedTable.nullStatsOf(line).map(_._1).getOrElse(0L) -
              st.dv.get(name).map(_.cardinality).getOrElse(0L))
          take
        }
      case _ => pruned
    }
    VersionedScan.recordPlanned(root, served.size)
    // Each partition carries the file's deletion vector so the reader
    // subtracts merge-on-read deletes positionally.
    served.map { case (name, _) =>
      (st.dv.get(name) match {
        case Some(DvInline(pos)) =>
          VersionedFilePartition(table.dataDir.resolve(name).toString, pos)
        case Some(DvSidecar(sc, _)) =>
          // the sidecar is LOADED BY THE TASK (createReader), never
          // here: the plan ships a reference, not positions
          VersionedFilePartition(table.dataDir.resolve(name).toString,
            Array.emptyLongArray, Some(table.dataDir.resolve(sc).toString))
        case None =>
          VersionedFilePartition(table.dataDir.resolve(name).toString)
      }): InputPartition
    }.toArray
  }

  /** Planner-visible statistics of the PRUNED scan: on-disk bytes of
    * the candidate files (never the whole table — zone-map skipping
    * shrinks what the optimizer sees, exactly like a lake format's
    * file-level stats), and an exact row count whenever every candidate
    * add recorded its footer row count (the r14 `rows` field), minus
    * the files' deletion-vector cardinality. This is what lets Catalyst
    * AUTO-BROADCAST a selective probe over the versioned table in a
    * join — without it a DSv2 relation defaults to "infinitely large"
    * and every such join shuffles.
    *
    * BATCH ONLY: a scan serving a stream (or the change feed) reports
    * UNKNOWN — head-snapshot numbers would mis-describe a micro-batch
    * (a drain replays history; the head may be tiny after deletes),
    * tempting Catalyst to broadcast the streaming side of a
    * stream-static join, and the per-trigger computeStats would pay an
    * O(live files) stat sweep every trigger. An unstat-able candidate
    * file likewise degrades size to unknown, never to an understatement
    * the planner would broadcast on. */
  override def estimateStatistics(): Statistics = {
    if (streamingMode || changeFeed)
      return new Statistics {
        override def sizeInBytes(): util.OptionalLong = util.OptionalLong.empty()
        override def numRows(): util.OptionalLong = util.OptionalLong.empty()
      }
    val (st, cand) = candidates
    var bytes = 0L
    var bytesKnown = true
    var rows = 0L
    var rowsKnown = true
    cand.foreach { case (name, line) =>
      // recorded bytes first (the r15 field — zero file-system calls
      // when the live set carries it); Files.size only as the
      // pre-recording fallback
      VersionedTable.byteStatsOf(line) match {
        case Some(b) => bytes += b
        case None =>
          try bytes += java.nio.file.Files.size(table.dataDir.resolve(name))
          catch { case _: java.io.IOException => bytesKnown = false }
      }
      VersionedTable.nullStatsOf(line) match {
        case Some((r, _)) =>
          rows += r - st.dv.get(name).map(_.cardinality).getOrElse(0L)
        case None => rowsKnown = false
      }
    }
    val sb = if (bytesKnown) util.OptionalLong.of(bytes)
      else util.OptionalLong.empty()
    val nr = if (rowsKnown) util.OptionalLong.of(math.max(0L, rows))
      else util.OptionalLong.empty()
    new Statistics {
      override def sizeInBytes(): util.OptionalLong = sb
      override def numRows(): util.OptionalLong = nr
    }
  }

  /** The TOP-N file cap: serve exactly the candidate files that can
    * hold one of the n extreme rows under ORDER BY col [DESC]
    * [NULLS FIRST]. The coverage proof: walk the value-bounded files
    * from the extreme end (ascending lo / descending hi), accumulating
    * each file's PROVABLE non-null visible rows (recorded rows − null
    * count − DV cardinality — a deletion vector conservatively eats
    * non-nulls); once ≥ n rows are covered, the prefix's far bound B
    * bounds the n-th value (n rows exist at-or-inside B, so no row
    * beyond B can enter the top-n on the leading key). Kept: files
    * whose interval reaches B, files with no bounds and no all-null
    * proof (unknowable — always served), and, when nulls sort FIRST,
    * every file that may hold a null on the column (nulls are the
    * top-n's prefix). When nulls sort LAST the proven n non-null rows
    * all precede every null, so all-null files drop. If coverage can't
    * be proven (stats-less history, tiny table), every candidate
    * serves — the cap only ever removes provably-irrelevant files. */
  private def topNServe(st: TableState, cand: Seq[(String, String)],
      t: TopNSpec): Seq[(String, String)] = {
    final case class F(name: String, zm: Option[(Long, Long)],
        nn: Option[Long], rows: Option[Long], allNull: Boolean)
    val fs = cand.map { case (name, line) =>
      val ns = VersionedTable.nullStatsOf(line)
      F(name, VersionedTable.longStatsOf(line).toMap.get(t.col),
        ns.flatMap(_._2.get(t.col)), ns.map(_._1),
        VersionedTable.allNullIn(ns, t.col))
    }
    def contrib(f: F): Long = (f.rows, f.nn) match {
      case (Some(r), Some(nn)) => math.max(0L,
        r - nn - st.dv.get(f.name).map(_.cardinality).getOrElse(0L))
      case _ => 0L
    }
    val valueFiles = fs.filter(_.zm.isDefined)
    val sorted =
      if (t.desc) valueFiles.sortBy(_.zm.get._2)(Ordering[Long].reverse)
      else valueFiles.sortBy(_.zm.get._1)
    var acc = 0L
    val prefix = sorted.takeWhile { f =>
      val take = acc < t.n
      if (take) acc += contrib(f)
      take
    }
    if (acc < t.n) return cand // coverage unprovable: serve everything
    val bound =
      if (t.desc) prefix.map(_.zm.get._1).min else prefix.map(_.zm.get._2).max
    // unknown null count counts as may-hold-nulls; Some(0) does not
    def nullSuspect(f: F): Boolean = f.allNull || f.nn.forall(_ > 0L)
    val keep = fs.filter { f =>
      (f.zm.isEmpty && !f.allNull) ||
        f.zm.exists(z => if (t.desc) z._2 >= bound else z._1 <= bound) ||
        (t.nullsFirst && nullSuspect(f))
    }.map(_.name).toSet
    cand.filter { case (name, _) => keep(name) }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VersionedReaderFactory(requested)
}

private[graft] object VersionedScan {
  /** File partitions planned by the LAST `planInputPartitions` call
    * per table root — the observability seam the dynamic-file-pruning
    * spec reads: after runtime filters land, BatchScanExec re-plans
    * THROUGH the scan, so the post-filter partition count is not
    * otherwise visible from outside the physical plan. Bounded: a
    * long-lived session scanning ephemeral roots must not grow JVM
    * state without limit, so the map resets past a small cap (it is
    * diagnostics, not correctness state). */
  private[graft] val lastPlanned =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]

  private def recordPlanned(root: String, n: Int): Unit = {
    if (lastPlanned.size > 1024) lastPlanned.clear()
    lastPlanned.put(root, Integer.valueOf(n))
  }

  private def intBound(v: Any): Boolean =
    v.isInstanceOf[Long] || v.isInstanceOf[Int]
  private def strBound(v: Any): Boolean = v.isInstanceOf[String]
  private def num(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case other => throw new IllegalStateException(s"non-integer bound $other")
  }

  /** Translate one V2 runtime predicate into the V1 probe shapes the
    * shared prune engine consumes — the native
    * [[SupportsRuntimeV2Filtering]] leg. Soundness contract: a probe is
    * emitted only when it is IMPLIED by the predicate (so skipping a
    * file the probe rejects can never drop a matching row), and any
    * shape that doesn't translate emits NO probe. Per shape:
    *   - `AND` flattens to both sides' probes (each conjunct must hold,
    *     so each prunes independently);
    *   - `IN` keeps its non-null values (a NULL in the list matches no
    *     row, so the narrowed list is equivalent for pruning); an
    *     all-null list emits nothing;
    *   - comparisons accept the literal on EITHER side (`5 >= id`
    *     normalizes to `id <= 5`); a null literal emits nothing (the
    *     predicate matches no row — no probe is trivially sound);
    *   - `<=>` (null-safe equality) against a non-null literal prunes
    *     exactly like `=` (null rows can't match a non-null literal);
    *     against NULL it IS the `IS NULL` probe.
    * String literals arrive as catalyst `UTF8String` and convert to the
    * external form the probe engine's byte-bound compares expect. */
  private[sources] def v2Probes(p: V2Predicate): Seq[Filter] = {
    def ref(e: V2Expression): Option[String] = e match {
      case f: NamedReference if f.fieldNames().length == 1 =>
        Some(f.fieldNames()(0))
      case _ => None
    }
    def lit(e: V2Expression): Option[Any] = e match {
      case l: V2Literal[_] => Some(l.value() match {
        case u: UTF8String => u.toString
        case other => other
      })
      case _ => None
    }
    def cmp(op: String, c: String, v: Any): Seq[Filter] =
      if (v == null) { if (op == "<=>") Seq(IsNull(c)) else Nil }
      else op match {
        case "=" | "<=>" => Seq(EqualTo(c, v))
        case ">" => Seq(GreaterThan(c, v))
        case ">=" => Seq(GreaterThanOrEqual(c, v))
        case "<" => Seq(LessThan(c, v))
        case "<=" => Seq(LessThanOrEqual(c, v))
        case _ => Nil
      }
    def flip(op: String): String = op match {
      case ">" => "<"
      case ">=" => "<="
      case "<" => ">"
      case "<=" => ">="
      case other => other // = and <=> are symmetric
    }
    val kids = p.children()
    p.name() match {
      case "AND" =>
        kids.toSeq.collect { case q: V2Predicate => v2Probes(q) }.flatten
      case "IN" if kids.length >= 2 =>
        (ref(kids.head), kids.tail.toSeq.map(lit)) match {
          case (Some(c), vs) if vs.forall(_.isDefined) =>
            val nonNull = vs.flatten.filter(_ != null)
            if (nonNull.isEmpty) Nil else Seq(In(c, nonNull.toArray))
          case _ => Nil
        }
      case "IS_NULL" if kids.length == 1 => ref(kids(0)).map(IsNull(_)).toSeq
      case "IS_NOT_NULL" if kids.length == 1 =>
        ref(kids(0)).map(IsNotNull(_)).toSeq
      case op @ ("=" | "<=>" | ">" | ">=" | "<" | "<=") if kids.length == 2 =>
        (ref(kids(0)), lit(kids(1)), ref(kids(1)), lit(kids(0))) match {
          case (Some(c), Some(v), _, _) => cmp(op, c, v)
          case (_, _, Some(c), Some(v)) => cmp(flip(op), c, v)
          case _ => Nil
        }
      case _ => Nil
    }
  }

  /** Filters the zone maps / null counts can act on — ONE gate shared
    * by the static pushdown ([[VersionedScanBuilder.pushFilters]]) and
    * the runtime-filter face ([[VersionedScan.filter]]). IN lists
    * prune for BOTH string values (recorded truncated byte bounds)
    * and integer values (recorded [min, max] intervals) — the integer
    * shape is exactly what a runtime join-key filter arrives in. */
  private[sources] def statsUsable(f: Filter): Boolean = f match {
    case EqualTo(_, v) => intBound(v) || strBound(v)
    case In(_, vs) =>
      vs.nonEmpty && (vs.forall(strBound) || vs.forall(intBound))
    case GreaterThan(_, v) => intBound(v) || strBound(v)
    case GreaterThanOrEqual(_, v) => intBound(v) || strBound(v)
    case LessThan(_, v) => intBound(v) || strBound(v)
    case LessThanOrEqual(_, v) => intBound(v) || strBound(v)
    // null probes prune on the recorded per-file null counts — and
    // Spark pushes IsNotNull alongside EVERY comparison filter, so
    // all-null files drop out of ordinary range scans for free
    case IsNull(_) => true
    case IsNotNull(_) => true
    case _ => false
  }

  /** First index in `sorted` holding a value >= x (sorted.length when
    * none) — the binary-search probe a large runtime IN-set needs so a
    * 10⁵-key dynamic filter tests each file in O(log n), not O(n). */
  private def lowerBound(sorted: Array[Long], x: Long): Int = {
    val i = java.util.Arrays.binarySearch(sorted, x)
    if (i >= 0) i else -(i + 1)
  }

  /** Apply one filter array's FILE-LEVEL probes to a candidate (file
    * name, add line) list — the single pruning pass both the static
    * snapshot and the runtime re-prune run, so the two can never
    * diverge on soundness. A file survives only if EVERY probed column
    * it has stats for can intersect its probe: integer bounds and
    * integer IN-sets test the recorded [min, max] intervals
    * (multi-column zone maps — z-ordered layouts — prune on all
    * clustered dimensions at once); string equality/IN and string
    * ranges compare unsigned-lexicographic against the recorded
    * truncated intervals; a recorded ALL-NULL column fails every value
    * probe (the bounds-less blind spot closed by the null counts); and
    * null probes prune on the recorded null counts alone. Files with
    * no stats on a probed column always survive — skipping is sound,
    * never complete; the residual row-level filter keeps results
    * exact. */
  private[sources] def prune(cand: Seq[(String, String)],
      filters: Array[Filter]): Seq[(String, String)] = {
    // per-column [lo, hi] bounds from integer comparisons — the
    // intersection of every constraint on the column
    val bs = filters.collect {
      case EqualTo(c, v) if intBound(v) => (c, num(v), num(v))
      case GreaterThan(c, v) if intBound(v) => (c, num(v) + 1, Long.MaxValue)
      case GreaterThanOrEqual(c, v) if intBound(v) => (c, num(v), Long.MaxValue)
      case LessThan(c, v) if intBound(v) => (c, Long.MinValue, num(v) - 1)
      case LessThanOrEqual(c, v) if intBound(v) => (c, Long.MinValue, num(v))
    }.foldLeft(Map.empty[String, (Long, Long)]) { case (acc, (c, lo, hi)) =>
      val (l0, h0) = acc.getOrElse(c, (Long.MinValue, Long.MaxValue))
      acc.updated(c, (math.max(l0, lo), math.min(h0, hi)))
    }
    // per-column SORTED integer IN-sets — intersected across
    // predicates; the runtime join-key shape
    val ivs = filters.collect {
      case In(c, vs) if vs.nonEmpty && vs.forall(intBound) =>
        (c, vs.map(num).toSet)
    }.foldLeft(Map.empty[String, Set[Long]]) { case (acc, (c, vs)) =>
      acc.updated(c, acc.get(c).map(_ intersect vs).getOrElse(vs))
    }.map { case (c, vs) => (c, vs.toArray.sorted) }
    // per-column string candidate value sets — intersected, so
    // `c = 'a' AND c IN ('a','b')` probes only 'a'
    val svs = filters.collect {
      case EqualTo(c, v: String) => (c, Set(v))
      case In(c, vs) if vs.nonEmpty && vs.forall(strBound) =>
        (c, vs.map(_.asInstanceOf[String]).toSet)
    }.foldLeft(Map.empty[String, Set[String]]) { case (acc, (c, vs)) =>
      acc.updated(c, acc.get(c).map(_ intersect vs).getOrElse(vs))
    }.map { case (c, vs) => (c, vs.toSeq.map(_.getBytes("UTF-8"))) }
    // per-column [lo, hi] BYTE ranges from string comparisons; strict
    // and non-strict both prune with the CLOSED bound — sound, the
    // residual keeps the strict edge exact
    val srs = {
      def bytes(v: Any): Array[Byte] = v.asInstanceOf[String].getBytes("UTF-8")
      filters.collect {
        case GreaterThan(c, v: String) => (c, Some(bytes(v)), None)
        case GreaterThanOrEqual(c, v: String) => (c, Some(bytes(v)), None)
        case LessThan(c, v: String) => (c, None, Some(bytes(v)))
        case LessThanOrEqual(c, v: String) => (c, None, Some(bytes(v)))
      }.foldLeft(
        Map.empty[String, (Option[Array[Byte]], Option[Array[Byte]])]) {
        case (acc, (c, lo, hi)) =>
          val (l0, h0) = acc.getOrElse(c, (None, None))
          def tighter(a: Option[Array[Byte]], b: Option[Array[Byte]],
              keepA: (Array[Byte], Array[Byte]) => Boolean) = (a, b) match {
            case (Some(x), Some(y)) => Some(if (keepA(x, y)) x else y)
            case _ => a.orElse(b)
          }
          acc.updated(c, (
            tighter(l0, lo, (x, y) => VersionedTable.ucmp(x, y) >= 0),
            tighter(h0, hi, (x, y) => VersionedTable.ucmp(x, y) <= 0)))
      }
    }
    // (column, isNull) probes from null filters
    val nps = filters.collect {
      case IsNull(c) => (c, true)
      case IsNotNull(c) => (c, false)
    }.toSeq
    cand.filter { case (_, line) =>
      val zm = VersionedTable.longStatsOf(line).toMap
      val sm = VersionedTable.strStatsOf(line).toMap
      val ns = VersionedTable.nullStatsOf(line) // ONE parse per file
      bs.forall { case (c, (lo, hi)) =>
        zm.get(c).map { case (fLo, fHi) => fHi >= lo && fLo <= hi }
          .getOrElse(!VersionedTable.allNullIn(ns, c))
      } && ivs.forall { case (c, sorted) =>
        zm.get(c).map { case (fLo, fHi) =>
          val i = lowerBound(sorted, fLo)
          i < sorted.length && sorted(i) <= fHi
        }.getOrElse(!VersionedTable.allNullIn(ns, c))
      } && svs.forall { case (c, vals) =>
        sm.get(c).map { case (mn, mx) =>
          vals.exists(x =>
            VersionedTable.ucmp(mn, x) <= 0 && VersionedTable.ucmp(x, mx) <= 0)
        }.getOrElse(!VersionedTable.allNullIn(ns, c))
      } && srs.forall { case (c, (lo, hi)) =>
        sm.get(c).map { case (mn, mx) =>
          lo.forall(l => VersionedTable.ucmp(l, mx) <= 0) &&
            hi.forall(h => VersionedTable.ucmp(mn, h) <= 0)
        }.getOrElse(!VersionedTable.allNullIn(ns, c))
      } && nps.forall { case (c, isNull) =>
        VersionedTable.nullCandidateIn(ns, c, isNull)
      }
    }
  }
}

/** Offset = highest table version already served. */
private[graft] case class VersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** Append-only log tail — serves each commit's ADDED files.
  *
  * Delete visibility contract (default): MERGE-ON-READ DELETES ARE
  * INVISIBLE to this feed. A `delete_mor` commit adds no files (its
  * `dvset` actions carry positions), so the window it lands in serves
  * nothing, and a historical window replays its files WITHOUT
  * subtracting vectors a LATER delete committed — consistent with
  * per-commit add semantics (the rows genuinely were live when their
  * commit landed), same as Delta's streaming source without
  * `readChangeFeed`.
  *
  * The opt-in `changeFeed` option (the Delta readChangeFeed shape)
  * changes that: every row carries a `_change_type` column and each
  * commit streams its FULL file-CDC window — added files as `insert`
  * rows, REMOVED files as `delete` rows (read minus their prior
  * deletion vector, so copy-on-write deletes/overwrites/merges/
  * restores reach the feed; a rewrite emits its carried rows as both
  * delete and insert, the same contract
  * [[VersionedTable.changesBetween]] documents), and a `dvset`
  * commit's vector GROWTH as positional `delete` rows — so log-tailing
  * consumers (index invalidation, downstream GDPR propagation) observe
  * every delete flavor without a side batch query. The grown-position
  * diff is computed BY THE TASK from the two sidecar references the
  * partition carries — positions never ride the plan. Two deliberate
  * exceptions: MAINTENANCE commits (compact/zorder) are logical no-ops
  * and serve nothing (Delta's dataChange=false discipline), and
  * restore-style vector SHRINKS serve nothing (changesBetween emits
  * restore re-inserts; the streaming feed is delete-observing). */
private[graft] class VersionedMicroBatchStream(root: String,
    startingVersion: Long, maxFilesPerTrigger: Option[Int],
    maxRowsPerTrigger: Option[Long], maxBytesPerTrigger: Option[Long],
    changeFeed: Boolean, failOnDataLoss: Boolean,
    schema: StructType)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private[graft] val table = new VersionedTable(root)

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

  /** The engine's requested rate limit, from the source options. With
    * no option set every trigger drains all outstanding commits. */
  override def getDefaultReadLimit: ReadLimit = {
    val limits = maxFilesPerTrigger.map(ReadLimit.maxFiles).toSeq ++
      maxRowsPerTrigger.map(ReadLimit.maxRows).toSeq ++
      maxBytesPerTrigger.map(ReadLimit.maxBytes).toSeq
    limits match {
      case Seq() => ReadLimit.allAvailable()
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[VersionOffset].v
    val head = availableNowCap.fold(table.version)(math.min(table.version, _))
    VersionOffset(admitUpTo(s, head, limit))
  }

  /** Admission control: walk the commits in (s, head] and stop BEFORE
    * the commit that would overflow the limit. A commit is the atomic
    * publication unit (offset = version), so the first outstanding
    * commit is always admitted whole even when it alone exceeds the
    * cap — rate limiting bounds batches, it cannot split a commit.
    * Costs one log-file read per considered commit, METADATA ONLY:
    * ReadMaxRows serves each add's recorded `rows` stat straight from
    * the log line (a parquet footer opens only as the fallback for
    * stats-less adds — see [[VersionedTable.rowsAddedAt]]), and
    * ReadMaxBytes is one `Files.size` per added file. Never a data
    * scan.
    *
    * Under `changeFeed` a commit is costed AS THE FEED SERVES IT
    * ([[VersionedTable.cdcCostsAt]]): a CoW delete's removed files and
    * a MoR delete's dvset partitions count toward files/rows/bytes —
    * the add-only accessors would let a pure-delete commit admit as
    * zero cost, unbounding a paced CDC drain over delete-heavy
    * history. Still one log read per commit, stats served from the
    * remove/dvset lines' carried fields. */
  private def admitUpTo(s: Long, head: Long, limit: ReadLimit): Long =
    limit match {
      case _: ReadAllAvailable => head
      case mf: ReadMaxFiles =>
        admitWhile(s, head, mf.maxFiles())(v =>
          if (changeFeed) table.cdcCostsAt(v, failOnDataLoss)._1
          else table.filesAddedAt(v, failOnDataLoss).size.toLong)
      case mr: ReadMaxRows =>
        admitWhile(s, head, mr.maxRows())(v =>
          if (changeFeed) table.cdcCostsAt(v, failOnDataLoss)._2
          else table.rowsAddedAt(v, failOnDataLoss))
      case mb: ReadMaxBytes =>
        admitWhile(s, head, mb.maxBytes())(v =>
          if (changeFeed) table.cdcCostsAt(v, failOnDataLoss)._3
          else table.bytesAddedAt(v, failOnDataLoss))
      case c: CompositeReadLimit =>
        c.getReadLimits.map(admitUpTo(s, head, _)).min
      case _ => head // ReadMinRows etc.: this source has no rate floor
    }

  private def admitWhile(s: Long, head: Long, cap: Long)(
      cost: Long => Long): Long = {
    var v = s
    var used = 0L
    var stop = false
    while (!stop && v < head) {
      val c = cost(v + 1)
      if (v > s && used + c > cap) stop = true
      else { v += 1; used += c }
    }
    v
  }

  override def deserializeOffset(json: String): Offset = VersionOffset(json.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  /** The change-feed fold CARRIED ACROSS TRIGGERS: the table state
    * advanced to the version the last window ended at, reused as the
    * next window's seed whenever the offsets line up (the steady-state
    * CDC tail), so a long-running drain folds each commit EXACTLY ONCE
    * per stream lifetime — O(window) log reads per trigger instead of
    * re-seeding from a checkpoint + tail every trigger. A retried or
    * out-of-order window (offsets that don't extend the carried state)
    * just re-seeds from the log, correct either way. */
  private var carriedFold: Option[(Long, TableState)] = None

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].v
    val e = end.asInstanceOf[VersionOffset].v
    if (!changeFeed)
      ((s + 1) to e).flatMap(v => table.filesAddedAt(v, failOnDataLoss))
        .map(f => VersionedFilePartition(f): InputPartition).toArray
    else {
      // ONE incremental fold for the whole drain window — seeded from
      // the carried state when this window extends the last one — then
      // three partition kinds per commit (see changeWindowsBetween)
      val windows = synchronized {
        val seed = carriedFold match {
          case Some((v, st)) if v == s => st
          case _ => table.stateAtOrEmpty(s)
        }
        val ws = table.changeWindowsFrom(seed, s, e, failOnDataLoss)
        carriedFold = Some((e, seed)) // seed was MUTATED forward to e
        ws
      }
      windows.flatMap { w =>
        def sidecar(ref: String): Option[String] =
          Some(ref).filter(_.nonEmpty)
            .map(r => table.dataDir.resolve(r).toString)
        val inserts = w.added.map(f =>
          VersionedFilePartition(f, feedTag = Some("insert"),
            feedVersion = w.version): InputPartition)
        // a removed file's rows AS VISIBLE before this commit: the
        // plain exclude-mode read minus its PRIOR vector, tagged delete
        val removals = w.removed.map { case (f, (pRef, pInline)) =>
          VersionedFilePartition(f, deleted = pInline, dvRef = sidecar(pRef),
            feedTag = Some("delete"), feedVersion = w.version): InputPartition
        }
        // one partition per dvset file: the task loads BOTH descriptors
        // (sidecars by reference) and serves exactly new − prior — the
        // rows THIS commit deleted
        val grown = w.grown.map { case (f, newD, priorD) =>
          val (nRef, nInline) = table.descForm(Some(newD))
          val (pRef, pInline) = table.descForm(priorD)
          VersionedFilePartition(f,
            deleted = nInline, dvRef = sidecar(nRef),
            feedTag = Some("delete"), grownOnly = true,
            priorDeleted = pInline,
            priorDvRef = sidecar(pRef), feedVersion = w.version): InputPartition
        }
        inserts ++ removals ++ grown
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VersionedReaderFactory(schema)
}

/** One committed parquet file, plus its deletion vector — inline
  * positions for legacy (r12) vectors, or a sidecar path the TASK
  * loads ([[VersionedReaderFactory.createReader]]), so bulk vectors
  * never ride the serialized plan. Empty for the default streaming
  * feed, which is append-only by contract.
  *
  * Change-feed fields: `feedTag` stamps every emitted row's
  * `_change_type`; `grownOnly` flips the reader from EXCLUDE mode
  * (serve all rows minus the vector) to INCLUDE mode (serve exactly
  * the positions in `deleted`/`dvRef` MINUS `priorDeleted`/`priorDvRef`
  * — the rows one commit's vector growth deleted), with the set diff
  * computed task-side from the two references. */
private[graft] case class VersionedFilePartition(file: String,
    deleted: Array[Long] = Array.emptyLongArray,
    dvRef: Option[String] = None,
    feedTag: Option[String] = None,
    grownOnly: Boolean = false,
    priorDeleted: Array[Long] = Array.emptyLongArray,
    priorDvRef: Option[String] = None,
    feedVersion: Long = -1L) extends InputPartition

/** Reads one committed parquet file into InternalRows via the public
  * parquet-mr record API. Column pruning is physical: the projected
  * subset is handed to `setRequestedSchema`, so only those columns'
  * chunks are read and decoded; an EMPTY projection (count(*)) reads no
  * data pages at all and emits the footer's row count (minus the
  * deletion vector's). Deletion-vector positions are skipped by a
  * running row index against the sorted DV — O(1) per row, no lookup
  * structure. */
private[graft] class VersionedReaderFactory(requested: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[VersionedFilePartition]
    val file = part.file
    // sidecar vectors load HERE, on the executor, once per task
    val deleted = part.dvRef
      .map(r => VersionedTable.readDvSidecar(java.nio.file.Paths.get(r)))
      .getOrElse(part.deleted)
    // change-feed INCLUDE mode: the rows one commit's vector growth
    // deleted = new vector − prior vector, diffed here on the task
    val include: Array[Long] =
      if (!part.grownOnly) null
      else {
        val prior = part.priorDvRef
          .map(r => VersionedTable.readDvSidecar(java.nio.file.Paths.get(r)))
          .getOrElse(part.priorDeleted)
        VersionedTable.diffSorted(deleted, prior)
      }
    val tagU: UTF8String = part.feedTag.map(UTF8String.fromString).orNull
    new PartitionReader[InternalRow] {
      private val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file), new Configuration()))
      private val fileSchema = reader.getFooter.getFileMetaData.getSchema
      // projection in FILE order (parquet contract), then a positional
      // map back to the REQUESTED order for the output row
      private val wanted = requested.fieldNames.toSet
      private val projected = new MessageType(fileSchema.getName,
        fileSchema.getFields.asScala.filter(f => wanted(f.getName)).asJava)
      private val outPos: Array[Int] = requested.fieldNames
        .map(n => projected.getFields.asScala.indexWhere(_.getName == n))
      reader.setRequestedSchema(projected)
      private val columnIO = new ColumnIOFactory().getColumnIO(projected)
      private var groupReader: org.apache.parquet.io.RecordReader[Group] = _
      private var rowsLeft: Long = 0L
      private var current: Group = _
      // footer-count path: no columns requested (count(*), or only the
      // change-feed tag), or the file predates every requested column —
      // no data pages to read either way; DV'd rows never count, and an
      // INCLUDE-mode partition counts exactly its grown positions
      private val noChunks = projected.getFieldCount == 0
      private var emptyRowsLeft: Long =
        if (!noChunks) 0L
        else if (include != null) include.length.toLong
        else reader.getRecordCount - deleted.length
      // running absolute row position in the file (the _metadata.row_index
      // coordinate the deletion vector is recorded in) and cursors into
      // the sorted DV (exclude mode) / grown set (include mode)
      private var rowIdx: Long = -1L
      private var delPtr: Int = 0
      private var incPtr: Int = 0
      // include mode: per-row-group row counts from the footer, so the
      // reader SKIPS whole groups containing no wanted position — a
      // needle-delete window over a large file costs the grown rows'
      // groups, not a full-file decode
      private val blockRows: Array[Long] =
        if (include == null) null
        else reader.getFooter.getBlocks.asScala.map(_.getRowCount.toLong).toArray
      private var blockIdx: Int = 0

      private def advanceRowGroup(): Boolean = {
        val pages = reader.readNextRowGroup()
        if (pages == null) false
        else {
          groupReader = columnIO.getRecordReader(
            pages, new GroupRecordConverter(projected))
          rowsLeft = pages.getRowCount
          true
        }
      }

      override def next(): Boolean = {
        if (noChunks) {
          if (emptyRowsLeft == 0L) return false
          emptyRowsLeft -= 1
          return true
        }
        if (include != null) {
          // INCLUDE mode: emit exactly the grown positions, in order;
          // once the set is exhausted the task is done — no tail scan
          if (incPtr >= include.length) return false
          while (true) {
            while (rowsLeft == 0L) {
              // the next group spans [rowIdx+1, rowIdx+rows]: skip it
              // outright when the next wanted position lies beyond it
              while (blockIdx < blockRows.length &&
                  include(incPtr) > rowIdx + blockRows(blockIdx)) {
                reader.skipNextRowGroup()
                rowIdx += blockRows(blockIdx)
                blockIdx += 1
              }
              if (!advanceRowGroup()) return false
              blockIdx += 1
            }
            current = groupReader.read()
            rowsLeft -= 1
            rowIdx += 1
            if (rowIdx == include(incPtr)) { incPtr += 1; return true }
          }
        }
        while (true) {
          while (rowsLeft == 0L) if (!advanceRowGroup()) return false
          current = groupReader.read()
          rowsLeft -= 1
          rowIdx += 1
          while (delPtr < deleted.length && deleted(delPtr) < rowIdx) delPtr += 1
          if (delPtr >= deleted.length || deleted(delPtr) != rowIdx) return true
          // position is deletion-vectored: skip and read on
        }
        false // unreachable
      }

      // the change-feed tag and commit version are synthesized per
      // partition, never read from the file — they fill the requested
      // `_change_type`/`_commit_version` slots in both the data and
      // the footer-count paths
      private def synthesized(i: Int): Any =
        if (tagU == null) null
        else if (requested(i).name == VersionedStreamProvider.ChangeTypeCol) tagU
        else if (requested(i).name == VersionedStreamProvider.ChangeVersionCol)
          java.lang.Long.valueOf(part.feedVersion)
        else null

      override def get(): InternalRow = {
        if (noChunks) {
          val vals = new Array[Any](requested.length)
          var i = 0
          while (i < requested.length) { vals(i) = synthesized(i); i += 1 }
          return new GenericInternalRow(vals)
        }
        val vals = new Array[Any](requested.length)
        var i = 0
        while (i < requested.length) {
          val p = outPos(i)
          vals(i) =
            // p < 0: the column was born after this file was written —
            // or is the synthesized change-feed tag
            if (p < 0) synthesized(i)
            else if (current.getFieldRepetitionCount(p) == 0) null
            else requested(i).dataType match {
              case LongType => current.getLong(p, 0)
              case IntegerType => current.getInteger(p, 0)
              case DoubleType => current.getDouble(p, 0)
              case FloatType => current.getFloat(p, 0)
              case BooleanType => current.getBoolean(p, 0)
              case StringType =>
                UTF8String.fromBytes(current.getBinary(p, 0).getBytes)
              case BinaryType => current.getBinary(p, 0).getBytes
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
