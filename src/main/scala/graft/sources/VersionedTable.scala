package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Snapshot-isolated versioned parquet table — the transactional-lake
  * discipline (the public Delta/Iceberg commit-log pattern) in its
  * minimal engine form. The reference overwrites its JSON snapshot in
  * place (dashboard/app.py reads whatever half-state exists); a 100-TB
  * corpus store instead needs: readers that NEVER see a partial write,
  * concurrent writers that cannot corrupt each other, and the ability to
  * pin any historical snapshot (the corpus-freeze requirement:
  * "train run X read table version N", reproducible forever).
  *
  * Mechanics, all file-system-atomic:
  *   - Data files land in `data/` under content-unique names; an
  *     unreferenced data file is invisible, so staging costs nothing.
  *   - A commit is ONE atomic rename into `_log/`: version v is file
  *     `_log/%012d.json`, whose lines are add/remove actions. The rename
  *     fails if the version exists — optimistic concurrency; the loser
  *     re-reads the head and retries on top (append never conflicts
  *     semantically; overwrite rebases its remove set).
  *   - A snapshot is the fold of actions over `_log/0..v` — so
  *     `readAsOf(v)` is total history reconstruction, and the latest
  *     read is just the fold at the head. Nothing is ever rewritten in
  *     place; old versions stay readable until an explicit [[vacuum]]
  *     ends their time-travel guarantee (a deliberate operator call,
  *     never a side effect).
  *
  * This composes with the rest of the engine: the incremental dedup/
  * admission jobs (`q_incremental_dedup`/`_neardup`) read "history" —
  * here that history gets a pinned version; `q_corpus_freeze` produces
  * a snapshot — here the snapshot gets a commit. `q_time_travel` is the
  * oracle-checked registry face of this class.
  */
class VersionedTable(val root: String) {
  private def logDir: Path = Paths.get(root, "_log")
  private[sources] def dataDir: Path = Paths.get(root, "data")

  private def listDir(p: Path): List[Path] =
    if (!Files.isDirectory(p)) Nil
    else {
      val s = Files.list(p)
      try s.iterator().asScala.toList finally s.close()
    }

  private def logName(v: Long): String = f"$v%012d.json"

  /** Latest committed version, -1 for an empty table. */
  def version: Long =
    listDir(logDir).map(_.getFileName.toString)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong)
      .foldLeft(-1L)(math.max)

  /** (version, operation, filesAdded, filesRemoved) per commit. */
  def history: Seq[(Long, String, Int, Int)] =
    (0L to version).map { v =>
      val lines = Files.readAllLines(logDir.resolve(logName(v))).asScala
      val op = lines.collectFirst {
        case l if l.contains("\"op\":\"meta\"") =>
          "\"operation\":\"([a-z_]+)\"".r.findFirstMatchIn(l).map(_.group(1))
            .getOrElse("?")
      }.getOrElse("?")
      (v, op,
        lines.count(_.contains("\"op\":\"add\"")),
        lines.count(_.contains("\"op\":\"remove\"")))
    }

  /** The live file set at version v: fold add/remove over _log/0..v. */
  def filesAt(v: Long): Seq[String] = {
    require(v >= 0 && v <= version, s"version $v outside [0, $version]")
    val file = "\"file\":\"([^\"]+)\"".r
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    (0L to v).foreach { i =>
      Files.readAllLines(logDir.resolve(logName(i))).asScala.foreach { l =>
        file.findFirstMatchIn(l).foreach { m =>
          if (l.contains("\"op\":\"add\"")) live += m.group(1)
          else if (l.contains("\"op\":\"remove\"")) live -= m.group(1)
        }
      }
    }
    live.toSeq.map(n => dataDir.resolve(n).toString)
  }

  /** Files ADDED by commit v alone — the micro-batch a log-tailing
    * streaming consumer ([[VersionedStreamProvider]]) serves for that
    * version. Fails loudly when the window's files were vacuumed:
    * silently skipping history would break the consumer's exactly-once
    * story. */
  def filesAddedAt(v: Long): Seq[String] = {
    require(v >= 0 && v <= version, s"version $v outside [0, $version]")
    val file = "\"file\":\"([^\"]+)\"".r
    Files.readAllLines(logDir.resolve(logName(v))).asScala.toSeq
      .filter(_.contains("\"op\":\"add\""))
      .flatMap(l => file.findFirstMatchIn(l).map(_.group(1)))
      .map { n =>
        val p = dataDir.resolve(n)
        require(Files.exists(p),
          s"commit $v data file $n was vacuumed; this window is no longer streamable")
        p.toString
      }
  }

  def read(spark: SparkSession): DataFrame = readAsOf(spark, version)

  /** Snapshot read under the LOG-CARRIED schema of that version (the
    * public Delta pattern: schema evolution lives in the commit meta,
    * not in a footer union scan). Files written before a column existed
    * are null-filled by the parquet reader; commits from before schema
    * tracking fall back to footer inference. A version with NO live
    * files (a delete-all, or a restore to one) reads as an empty frame
    * under its recorded schema — only schema-less empty logs (possible
    * solely in pre-tracking history) are unreadable. */
  def readAsOf(spark: SparkSession, v: Long): DataFrame = {
    val files = filesAt(v)
    val sch = schemaAt(v)
    if (files.isEmpty) {
      require(sch.isDefined, s"version $v has no live files and no recorded schema")
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), sch.get)
    } else sch.map(spark.read.schema).getOrElse(spark.read).parquet(files: _*)
  }

  /** The table schema AS OF version v — the newest schema recorded in
    * `_log/0..v`. None for logs written before schema tracking. */
  def schemaAt(v: Long): Option[StructType] = {
    require(v >= 0 && v <= version, s"version $v outside [0, $version]")
    val b64 = "\"schemaB64\":\"([^\"]+)\"".r
    (0L to v).reverse.iterator.flatMap { i =>
      Files.readAllLines(logDir.resolve(logName(i))).asScala
        .flatMap(l => b64.findFirstMatchIn(l).map(_.group(1)))
    }.nextOption().map(s => DataType.fromJson(
      new String(java.util.Base64.getDecoder.decode(s), "UTF-8"))
      .asInstanceOf[StructType])
  }

  private[sources] def metaLine(op: String, schema: StructType, extra: String = ""): String = {
    val b64 = java.util.Base64.getEncoder
      .encodeToString(schema.json.getBytes("UTF-8"))
    s"""{"op":"meta","operation":"$op"$extra,"schemaB64":"$b64"}"""
  }

  /** Widen the table schema by the incoming frame: columns shared with
    * the table must agree on type (schema ENFORCEMENT — a silent type
    * flip is corpus corruption), incoming-only columns are appended
    * (schema EVOLUTION — old files null-fill them at read), and an
    * incoming frame may omit existing columns (its rows read as null
    * there). */
  private[sources] def unionSchema(current: Option[StructType], incoming: StructType): StructType =
    current match {
      case None => incoming
      case Some(cur) =>
        incoming.fields.foreach { f =>
          cur.find(_.name == f.name).foreach { c =>
            require(c.dataType == f.dataType,
              s"schema conflict on '${f.name}': table has ${c.dataType}, " +
                s"incoming has ${f.dataType}")
          }
        }
        StructType(cur.fields ++
          incoming.fields.filterNot(f => cur.exists(_.name == f.name)))
    }

  /** Active CHECK constraints as of version v (name → SQL predicate),
    * folded add/drop over the log — the Delta-style table-level write
    * contract: once registered, EVERY writer validates incoming rows
    * against every active constraint before its commit can land. */
  def constraintsAt(v: Long): Map[String, String] = {
    if (v < 0) return Map.empty
    require(v <= version, s"version $v outside [0, $version]")
    val add =
      "\"operation\":\"add_constraint\",\"cname\":\"([^\"]+)\",\"exprB64\":\"([^\"]+)\"".r
    val drop = "\"operation\":\"drop_constraint\",\"cname\":\"([^\"]+)\"".r
    val live = scala.collection.mutable.LinkedHashMap.empty[String, String]
    (0L to v).foreach { i =>
      Files.readAllLines(logDir.resolve(logName(i))).asScala.foreach { l =>
        add.findFirstMatchIn(l).foreach(m => live(m.group(1)) = new String(
          java.util.Base64.getDecoder.decode(m.group(2)), "UTF-8"))
        drop.findFirstMatchIn(l).foreach(m => live -= m.group(1))
      }
    }
    live.toMap
  }

  /** Register a CHECK constraint (a boolean SQL expression over the
    * table's columns). The CURRENT snapshot must already satisfy it —
    * registering a constraint the data violates would make the contract
    * a lie — and every subsequent append/appendBatch/merge/overwrite
    * validates its incoming rows in ONE aggregate scan before
    * committing. Committed as a meta-only version, so the registration
    * itself is time-travelable and race-safe like any other commit.
    *
    * NULL semantics — STRICTER than SQL/Delta CHECK, deliberately: a
    * row where the predicate evaluates to NULL is REJECTED here, where
    * SQL's three-valued CHECK (and Delta Lake's) lets the maybe pass.
    * A write gate means provably true; if migrating a Delta constraint
    * that relies on NULL-passes, spell the tolerance out —
    * `col IS NULL OR <predicate>`. */
  def addConstraint(spark: SparkSession, name: String, sqlExpr: String): Long = {
    require(name.matches("[A-Za-z0-9_]+"),
      s"constraint name '$name' must be [A-Za-z0-9_]+")
    val b64 = java.util.Base64.getEncoder.encodeToString(sqlExpr.getBytes("UTF-8"))
    var committed = -1L
    while (committed < 0) {
      val head = version
      if (head >= 0 && filesAt(head).nonEmpty)
        enforce(readAsOf(spark, head), Map(name -> sqlExpr), "existing snapshot")
      val line = s"""{"op":"meta","operation":"add_constraint","cname":"$name","exprB64":"$b64"}"""
      if (commit(head + 1, Seq(line))) committed = head + 1
    }
    committed
  }

  /** Drop a CHECK constraint by name (meta-only commit). */
  def dropConstraint(name: String): Long = {
    var committed = -1L
    while (committed < 0) {
      val head = version
      require(constraintsAt(head).contains(name), s"no constraint '$name'")
      val line = s"""{"op":"meta","operation":"drop_constraint","cname":"$name"}"""
      if (commit(head + 1, Seq(line))) committed = head + 1
    }
    committed
  }

  /** Validate `df` against every constraint in ONE aggregate pass (a
    * conditional violation count per constraint); throws naming every
    * violated constraint. A row where the predicate is NULL counts as a
    * violation — CHECK means provably true, three-valued maybes don't
    * pass a write gate. */
  private[sources] def enforce(df: DataFrame, cs: Map[String, String],
      what: String = "incoming rows"): Unit = {
    if (cs.isEmpty) return
    import org.apache.spark.sql.functions.{expr, sum, when, lit}
    val names = cs.keys.toSeq
    val aggs = names.map { n =>
      val p = expr(cs(n))
      sum(when(p.isNull || !p, 1L).otherwise(0L)).as(s"_viol_$n")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val violated = names.zipWithIndex.collect {
      case (n, i) if !row.isNullAt(i) && row.getLong(i) > 0 =>
        s"'$n' (${cs(n)}): ${row.getLong(i)} row(s)"
    }
    require(violated.isEmpty,
      s"CHECK constraint(s) violated by $what: ${violated.mkString("; ")}")
  }

  /** Atomic commit of version v. Returns false when v was taken by a
    * concurrent writer (caller re-reads the head and retries). */
  private[graft] def commit(v: Long, actions: Seq[String]): Boolean = {
    Files.createDirectories(logDir)
    val tmp = logDir.resolve(s".tmp-${UUID.randomUUID()}")
    Files.write(tmp, actions.mkString("\n").getBytes("UTF-8"))
    try { Files.move(tmp, logDir.resolve(logName(v))); true }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp); false
    }
  }

  /** Per-file min/max of an INT64 column straight from the parquet
    * FOOTER — metadata only, zero data pages (at 100 TB these numbers
    * come from the writer's own row-group stats; here we read them back
    * the same way any lake engine's stats collector does). */
  private def footerMinMax(file: Path, column: String): Option[(Long, Long)] = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toString),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val chunks = r.getFooter.getBlocks.asScala.toList.flatMap { b =>
        b.getColumns.asScala.find(_.getPath.toDotString == column)
      }
      // mirror VersionedDataWriter's guard: anything but INT32/INT64
      // (double, string, boolean, ...) gets a diagnosable error, not a
      // bare MatchError out of the stats accessors below
      chunks.foreach { c =>
        import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
        val p = c.getPrimitiveType.getPrimitiveTypeName
        require(p == INT64 || p == INT32,
          s"statsCol must be integer-typed, got $p for column '$column'")
      }
      val stats = chunks.map(_.getStatistics)
      if (stats.isEmpty || stats.exists(s => s == null || !s.hasNonNullValue)) None
      else Some((
        stats.map(_.genericGetMin match {
          case l: java.lang.Long => l.longValue
          case i: java.lang.Integer => i.longValue
        }).min,
        stats.map(_.genericGetMax match {
          case l: java.lang.Long => l.longValue
          case i: java.lang.Integer => i.longValue
        }).max))
    } finally r.close()
  }

  /** Stage the frame's parquet files into data/ under unique names
    * (invisible until some commit references them), harvesting footer
    * min/max of `statsCol` for the commit log's skipping index. */
  private def stage(spark: SparkSession, df: DataFrame,
      statsCol: Option[String]): Seq[String] =
    stageMulti(spark, df, statsCol.toSeq)

  /** Multi-column variant: harvest footer min/max for EVERY column in
    * `statsCols`. One recorded column keeps the legacy single-stat add
    * action (older logs parse unchanged); two or more land in a packed
    * `multi` field — the multi-dimensional zone map a z-ordered layout
    * needs, since its whole point is that BOTH clustered columns have
    * tight per-file intervals. */
  private def stageMulti(spark: SparkSession, df: DataFrame,
      statsCols: Seq[String]): Seq[String] = {
    statsCols.foreach(c => require(c.matches("[A-Za-z0-9_]+"),
      s"stats column '$c' must be [A-Za-z0-9_]+"))
    Files.createDirectories(dataDir)
    val tmp = Paths.get(root, s"_tmp-${UUID.randomUUID()}")
    df.write.parquet(tmp.toString)
    val parts = listDir(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
    val actions = parts.zipWithIndex.map { case (p, i) =>
      val name = s"${UUID.randomUUID().toString.take(8)}-$i.parquet"
      val stats = statsCols.flatMap(c => footerMinMax(p, c).map((c, _)))
      Files.move(p, dataDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
      stats match {
        case Seq((c, (lo, hi))) =>
          s"""{"op":"add","file":"$name","col":"$c","min":$lo,"max":$hi}"""
        case Seq() => s"""{"op":"add","file":"$name"}"""
        case many =>
          val packed = many.map { case (c, (lo, hi)) => s"$c,$lo,$hi" }
            .mkString("|")
          s"""{"op":"add","file":"$name","multi":"$packed"}"""
      }
    }
    listDir(tmp).foreach(Files.deleteIfExists(_))
    Files.deleteIfExists(tmp)
    actions
  }

  private def fileOf(action: String): Option[String] =
    "\"file\":\"([^\"]+)\"".r.findFirstMatchIn(action).map(_.group(1))

  /** Append: stage once, then race for the next version number (an
    * append's actions are head-independent, so a lost race just retries
    * the rename). Returns the committed version. */
  def append(spark: SparkSession, df: DataFrame,
      statsCol: Option[String] = None): Long = {
    var validated = constraintsAt(version)
    enforce(df, validated) // before staging: a violating write costs no IO
    val adds = stage(spark, df, statsCol)
    var committed = -1L
    while (committed < 0) {
      val head = version
      // a constraint registered while we retried must still gate us
      val cs = constraintsAt(head)
      if (cs != validated) { enforce(df, cs); validated = cs }
      val s = unionSchema(if (head < 0) None else schemaAt(head), df.schema)
      if (commit(head + 1, metaLine("append", s) +: adds)) committed = head + 1
    }
    committed
  }

  /** Micro-batch ids already committed — the dedup ledger for
    * [[appendBatch]], read straight from the log's meta lines. */
  def committedBatchIds: Set[Long] = {
    val id = "\"batchId\":(-?\\d+)".r
    (0L to version).flatMap { v =>
      Files.readAllLines(logDir.resolve(logName(v))).asScala
        .flatMap(l => id.findFirstMatchIn(l).map(_.group(1).toLong))
    }.toSet
  }

  /** Exactly-once streaming ingest: append one micro-batch under its
    * batchId, skipping if that id is already in the log — the
    * foreachBatch idempotence contract that turns Structured Streaming's
    * at-least-once batch re-delivery into exactly-once TABLE state. The
    * id re-check sits INSIDE the commit retry loop, so even two racing
    * deliveries of the same batch commit it exactly once (the rename
    * loser re-reads the ledger and finds the winner's id). Returns the
    * committed version, or None when the batch was already in.
    */
  def appendBatch(spark: SparkSession, df: DataFrame,
      batchId: Long): Option[Long] = {
    if (committedBatchIds.contains(batchId)) return None
    var validated = constraintsAt(version)
    enforce(df, validated)
    val adds = stage(spark, df, None)
    while (true) {
      val head = version
      val cs = constraintsAt(head)
      if (cs != validated) { enforce(df, cs); validated = cs }
      val s = unionSchema(if (head < 0) None else schemaAt(head), df.schema)
      val actions = metaLine("append", s, s""","batchId":$batchId""") +: adds
      if (commit(head + 1, actions)) return Some(head + 1)
      if (committedBatchIds.contains(batchId)) return None
    }
    None // unreachable
  }

  /** Overwrite: stage once; the remove set is REBASED against the head
    * on every retry so a concurrent append's files are removed too —
    * overwrite means "the table becomes exactly this frame". */
  def overwrite(spark: SparkSession, df: DataFrame,
      statsCol: Option[String] = None): Long = {
    var validated = constraintsAt(version)
    enforce(df, validated)
    val adds = stage(spark, df, statsCol)
    var committed = -1L
    while (committed < 0) {
      val head = version
      val cs = constraintsAt(head)
      if (cs != validated) { enforce(df, cs); validated = cs }
      val removes =
        if (head < 0) Nil
        else filesAt(head).map(p => Paths.get(p).getFileName.toString)
      // overwrite REPLACES the state, so the schema resets to the frame's
      // (earlier versions keep reading under their own recorded schema)
      val actions = metaLine("overwrite", df.schema) +:
        (removes.map(f => s"""{"op":"remove","file":"$f"}""") ++ adds)
      if (commit(head + 1, actions)) committed = head + 1
    }
    committed
  }

  /** MERGE (upsert): the head snapshot's rows whose `key` appears in
    * `updates` are REPLACED, the rest kept, unmatched updates inserted —
    * committed as one new version tagged `merge`. Physically: one keyed
    * left-anti join (the survivors) unioned with the updates, staged,
    * then remove-head/add-all — the transactional upsert an SCD1 /
    * latest-state corpus store runs nightly. Unlike [[overwrite]], a
    * lost commit race cannot just retry the rename: the merged frame was
    * computed AGAINST the old head, so the loop re-reads the new head
    * and recomputes before re-staging (the serializable-transaction
    * retry discipline; a lost attempt's staged files stay invisible and
    * fall to [[vacuum]]). At 100 TB the join shuffles on the key with
    * the update side typically broadcast — never a snapshot rewrite per
    * updated row.
    */
  def merge(spark: SparkSession, updates: DataFrame, key: String,
      statsCol: Option[String] = None): Long = {
    // survivors were validated when THEY were written; only the updates
    // bring new values past the gate
    var validated: Map[String, String] = null
    var committed = -1L
    while (committed < 0) {
      val head = version
      val cs = constraintsAt(head)
      if (cs != validated) { enforce(updates, cs); validated = cs }
      val s = unionSchema(if (head < 0) None else schemaAt(head), updates.schema)
      val merged =
        if (head < 0) updates
        else readAsOf(spark, head)
          .join(updates.select(key), Seq(key), "left_anti")
          .unionByName(updates, allowMissingColumns = true)
      val adds = stage(spark, merged, statsCol)
      val removes =
        if (head < 0) Nil
        else filesAt(head).map(p => Paths.get(p).getFileName.toString)
      val actions = metaLine("merge", s) +:
        (removes.map(f => s"""{"op":"remove","file":"$f"}""") ++ adds)
      if (commit(head + 1, actions)) committed = head + 1
    }
    committed
  }

  /** Row-level DELETE of `column IN [lo, hi]`, copy-on-write with
    * file-granularity pruning: only live files whose recorded zone map
    * CAN intersect the predicate are rewritten (minus the matching
    * rows); every other file is carried by reference, untouched. On a
    * 100-TB table a targeted delete (the GDPR/right-to-be-forgotten
    * shape) then rewrites the few files holding the key range instead
    * of the snapshot. NULLs survive (the predicate is three-valued:
    * only rows provably inside the range are removed). Returns the new
    * version, or the current head when no file can match. The deleted
    * rows stay time-travelable until [[vacuum]] — an explicit,
    * operator-visible retention decision, exactly like the lake
    * engines' vacuum-completes-the-delete contract.
    */
  def deleteWhere(spark: SparkSession, column: String, lo: Long, hi: Long): Long = {
    import org.apache.spark.sql.functions.col
    var committed = -1L
    while (committed < 0) {
      val head = version
      require(head >= 0, "nothing to delete from")
      val touched = filesWithMultiStatsAt(head).collect {
        // a file dodges the rewrite only when it has stats ON THE
        // PREDICATE COLUMN and the interval provably misses
        case (p, st) if st.toMap.get(column)
          .forall { case (fLo, fHi) => fHi >= lo && fLo <= hi } => p
      }
      if (touched.isEmpty) return head
      val reader = schemaAt(head).map(spark.read.schema).getOrElse(spark.read)
      val survivors = reader.parquet(touched: _*)
        .filter(!col(column).between(lo, hi) || col(column).isNull)
      val adds = stage(spark, survivors, Some(column))
      val removes = touched.map(p => Paths.get(p).getFileName.toString)
      val metaL = schemaAt(head).map(metaLine("delete", _))
        .getOrElse("""{"op":"meta","operation":"delete"}""")
      val actions = metaL +:
        (removes.map(f => s"""{"op":"remove","file":"$f"}""") ++ adds)
      if (commit(head + 1, actions)) committed = head + 1
    }
    committed
  }

  /** The live (file, stats) set at v: the same log fold as [[filesAt]]
    * but keeping each add's recorded skipping interval (first recorded
    * column when several exist — the legacy single-column view). */
  def filesWithStatsAt(v: Long): Seq[(String, Option[(String, Long, Long)])] =
    filesWithMultiStatsAt(v).map { case (p, st) =>
      (p, st.headOption.map { case (c, (lo, hi)) => (c, lo, hi) })
    }

  /** The live (file, per-column zone map) set at v — every recorded
    * (col → [min, max]) interval per file, in recording order. Single-
    * column adds (the legacy action form) parse as a one-entry map. */
  def filesWithMultiStatsAt(v: Long): Seq[(String, Seq[(String, (Long, Long))])] = {
    require(v >= 0 && v <= version, s"version $v outside [0, $version]")
    val single = "\"col\":\"([^\"]+)\",\"min\":(-?\\d+),\"max\":(-?\\d+)".r
    val multi = "\"multi\":\"([^\"]+)\"".r
    val live = scala.collection.mutable.LinkedHashMap
      .empty[String, Seq[(String, (Long, Long))]]
    (0L to v).foreach { i =>
      Files.readAllLines(logDir.resolve(logName(i))).asScala.foreach { l =>
        fileOf(l).foreach { f =>
          if (l.contains("\"op\":\"add\"")) {
            val m = multi.findFirstMatchIn(l).map(_.group(1).split('|').toSeq
              .map { part =>
                val Array(c, lo, hi) = part.split(',')
                (c, (lo.toLong, hi.toLong))
              })
            val s = single.findFirstMatchIn(l).map(mm =>
              Seq((mm.group(1), (mm.group(2).toLong, mm.group(3).toLong))))
            live(f) = m.orElse(s).getOrElse(Nil)
          } else if (l.contains("\"op\":\"remove\"")) live -= f
        }
      }
    }
    live.toSeq.map { case (n, s) => (dataDir.resolve(n).toString, s) }
  }

  /** Data-skipping read: files whose recorded [min, max] interval on
    * `column` cannot intersect [lo, hi] are never opened (files with no
    * recorded stats are always read — skipping must be sound, not
    * complete). The residual filter still applies row-level, so the
    * result is exact regardless of how coarse the file intervals are.
    */
  def readWhere(spark: SparkSession, v: Long, column: String,
      lo: Long, hi: Long): DataFrame = {
    val files = prunedFiles(v, column, lo, hi)
    require(files.nonEmpty, s"no candidate files for [$lo, $hi] at version $v")
    spark.read.parquet(files: _*)
      .filter(org.apache.spark.sql.functions.col(column).between(lo, hi))
  }

  /** The candidate file list [[readWhere]] would open — exposed so the
    * skipping ratio is testable and auditable. Multi-column zone maps
    * prune on whichever recorded column the probe names. */
  def prunedFiles(v: Long, column: String, lo: Long, hi: Long): Seq[String] =
    filesWithMultiStatsAt(v).collect {
      case (path, st) if st.toMap.get(column)
        .forall { case (fLo, fHi) => fHi >= lo && fLo <= hi } => path
    }

  /** Compaction (the OPTIMIZE step): rewrite the current snapshot's
    * files into `targetFiles` larger ones and commit remove-all/add-all
    * — logically a no-op (the snapshot's rows are identical before and
    * after, which the spec asserts), physically the small-files repair
    * every streaming-ingested table needs. Older versions still resolve
    * to the ORIGINAL files, so time travel survives compaction until an
    * explicit [[vacuum]] reclaims them.
    *
    * Like [[merge]] (and unlike [[append]]), a lost commit race cannot
    * just retry the rename: the staged rewrite and the remove set were
    * computed against the OLD head, and re-committing them over a
    * concurrent deleteWhere/overwrite/merge would resurrect rows the
    * winner removed and duplicate its survivor files. The loop re-reads
    * the new head and recomputes both sides before retrying; a lost
    * attempt's staged files stay invisible and fall to [[vacuum]].
    */
  def compact(spark: SparkSession, targetFiles: Int = 1): Long = {
    var committed = -1L
    while (committed < 0) {
      val head = version
      require(head >= 0, "nothing to compact")
      val adds = stage(spark,
        readAsOf(spark, head).repartition(targetFiles), None)
      val removes = filesAt(head).map(p => Paths.get(p).getFileName.toString)
      val metaL = schemaAt(head).map(metaLine("compact", _))
        .getOrElse("""{"op":"meta","operation":"compact"}""")
      val actions = metaL +:
        (removes.map(f => s"""{"op":"remove","file":"$f"}""") ++ adds)
      if (commit(head + 1, actions)) committed = head + 1
    }
    committed
  }

  /** OPTIMIZE ZORDER BY: rewrite the current snapshot clustered on the
    * Morton interleave of two integer columns, recording BOTH columns'
    * per-file min/max in the commit log — after which
    * [[prunedFiles]]/[[readWhere]]/the DSv2 scan skip files on EITHER
    * dimension, where a linear clustering prunes only its sort key
    * (`q_cluster_compare` measures exactly this trade; this operation
    * is the maintenance job that buys it). Buckets are equal-width over
    * each column's observed range (swap in rank buckets for heavily
    * skewed keys); the rewrite is one range repartition on the morton
    * key. Logically a no-op like [[compact]], with the same lost-race
    * rebase discipline and time-travel guarantee. */
  def compactZOrder(spark: SparkSession, colA: String, colB: String,
      targetFiles: Int = 8, bits: Int = 8): Long = {
    import org.apache.spark.sql.functions.{col, expr, min, max}
    require(bits >= 1 && bits <= 16, s"bits $bits outside [1, 16]")
    var committed = -1L
    while (committed < 0) {
      val head = version
      require(head >= 0, "nothing to compact")
      val snap = readAsOf(spark, head)
      val r = snap.agg(
        min(col(colA).cast("long")), max(col(colA).cast("long")),
        min(col(colB).cast("long")), max(col(colB).cast("long"))).head()
      require(!r.isNullAt(0) && !r.isNullAt(2),
        s"cannot z-order on '$colA'/'$colB': a clustering column is all NULL")
      val (aLo, aHi, bLo, bHi) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      require(aHi - aLo >= 0 && bHi - bLo >= 0,
        s"observed range of '$colA'/'$colB' exceeds the BIGINT span; " +
          "z-order bucketing needs hi - lo representable")
      val n = 1L << bits
      // Small ranges take the multiply-first cut ((v-lo)·n div range):
      // it uses the full bucket space. Ranges near 2^63/n would overflow
      // that product and silently degrade the rewrite to near-random
      // clustering (pruning stays sound — zone maps come from real
      // footers — but the layout win evaporates), so they fall back to
      // divide-first (bucket = (v-lo) div (range div n + 1)), which is
      // overflow-free but uses only k/(k+1) of the bucket space at
      // range ≈ k·n. width > range/n guarantees bucket <= n - 1 for any
      // in-range v; the clamp only guards values outside [lo, hi]
      // (impossible here, cheap insurance).
      def bucket(c: String, lo: Long, hi: Long): String = {
        val range = hi - lo
        val expr =
          if (range < Long.MaxValue / n)
            s"((CAST($c AS BIGINT) - ${lo}L) * ${n}L) div ${range + 1L}L"
          else {
            val width = math.max(1L, range / n + 1L)
            s"(CAST($c AS BIGINT) - ${lo}L) div ${width}L"
          }
        s"least(${n - 1}L, greatest(0L, $expr))"
      }
      def spread(c: String): String = graft.functions.MortonSql.spread(c)
      val zdf = snap
        .withColumn("_bx", expr(bucket(colA, aLo, aHi)))
        .withColumn("_by", expr(bucket(colB, bLo, bHi)))
        .withColumn("_mz", expr(s"(${spread("_bx")}) | ((${spread("_by")}) * 2)"))
        .repartitionByRange(targetFiles, col("_mz"))
        .drop("_bx", "_by", "_mz")
      val adds = stageMulti(spark, zdf, Seq(colA, colB))
      val removes = filesAt(head).map(p => Paths.get(p).getFileName.toString)
      val metaL = schemaAt(head).map(metaLine("zorder", _))
        .getOrElse("""{"op":"meta","operation":"zorder"}""")
      val actions = metaL +:
        (removes.map(f => s"""{"op":"remove","file":"$f"}""") ++ adds)
      if (commit(head + 1, actions)) committed = head + 1
    }
    committed
  }

  /** name → its governing add action line (the LATEST add), live at v —
    * the payload [[restore]] replays so recorded zone maps (single- or
    * multi-column) survive a rollback by reference. */
  private def addActionsAt(v: Long): scala.collection.mutable.LinkedHashMap[String, String] = {
    require(v >= 0 && v <= version, s"version $v outside [0, $version]")
    val live = scala.collection.mutable.LinkedHashMap.empty[String, String]
    (0L to v).foreach { i =>
      Files.readAllLines(logDir.resolve(logName(i))).asScala.foreach { l =>
        fileOf(l).foreach { f =>
          if (l.contains("\"op\":\"add\"")) live(f) = l
          else if (l.contains("\"op\":\"remove\"")) live -= f
        }
      }
    }
    live
  }

  /** RESTORE TO VERSION AS OF: roll the head back to exactly version
    * `toVersion`'s snapshot as a NEW commit — the rollback after a bad
    * ingest, merge, or re-freeze. Pure metadata: live files the two
    * versions share are left untouched, the head's extras are removed,
    * and `toVersion`'s missing files are re-added BY REFERENCE, replaying
    * their ORIGINAL add actions so zone maps ride along and post-restore
    * pruning stays as selective as it was at `toVersion`. No data file
    * is moved or rewritten — O(log) work at any table size — and the
    * undone window remains time-travelable (the restore is itself a
    * commit) until an explicit [[vacuum]]. CHECK constraints registered
    * SINCE `toVersion` re-validate the restored snapshot: a rollback may
    * not resurrect rows the table's CURRENT contract forbids. Lost
    * commit races rebase — the remove set is recomputed against the new
    * head while the restore target stays pinned. Fails if the target's
    * files were vacuumed. A legitimately-EMPTY snapshot (e.g. right
    * after a delete-all) is restorable, matching Delta's RESTORE: every
    * head file becomes a remove and the constraint re-validation scan
    * is skipped (no rows, nothing to violate). */
  def restore(spark: SparkSession, toVersion: Long): Long = {
    val adds = addActionsAt(toVersion)
    adds.keys.foreach { n =>
      require(Files.exists(dataDir.resolve(n)),
        s"version $toVersion data file $n was vacuumed; cannot restore")
    }
    val metaL = schemaAt(toVersion).map(metaLine("restore", _))
      .getOrElse("""{"op":"meta","operation":"restore"}""")
    var validated: Option[Map[String, String]] = None
    var committed = -1L
    while (committed < 0) {
      val head = version
      require(toVersion <= head, s"version $toVersion outside [0, $head]")
      val cs = constraintsAt(head)
      if (adds.nonEmpty && !validated.contains(cs)) {
        enforce(readAsOf(spark, toVersion), cs, s"restored snapshot v$toVersion")
        validated = Some(cs)
      }
      val headNames = filesAt(head).map(p => Paths.get(p).getFileName.toString)
      val removes = headNames.filterNot(adds.contains)
      val readds = adds.filterNot { case (n, _) => headNames.contains(n) }
      val actions = metaL +:
        (removes.map(f => s"""{"op":"remove","file":"$f"}""") ++ readds.values)
      if (commit(head + 1, actions)) committed = head + 1
    }
    committed
  }

  /** Physical cleanup: delete every data file not live in ANY version
    * >= `keepFrom` (and not referenced by the head). Versions before
    * the horizon stop being readable — vacuum is the explicit,
    * operator-chosen end of their time-travel guarantee; the log itself
    * stays intact as the audit record. Returns the deleted file names.
    */
  def vacuum(keepFrom: Long): Seq[String] = {
    val head = version
    require(keepFrom >= 0 && keepFrom <= head,
      s"horizon $keepFrom outside [0, $head]")
    val live = (keepFrom to head)
      .flatMap(filesAt(_)).map(p => Paths.get(p).getFileName.toString).toSet
    val victims = listDir(dataDir)
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !live.contains(n))
    victims.foreach(n => Files.deleteIfExists(dataDir.resolve(n)))
    victims
  }

  /** Change feed between two snapshots: every row whose file was added
    * in (fromV, toV] tagged `insert`, every row whose file was removed
    * tagged `delete` — the incremental-consumer read (downstream dedup
    * admission, index refresh, cache invalidation) that replaces a full
    * snapshot diff. File-granularity identity is exact for this table's
    * only two operations (append = pure adds, overwrite = remove-all +
    * add-all); a file both added and removed INSIDE the window is net
    * invisible and contributes nothing, matching the snapshot algebra.
    */
  def changesBetween(spark: SparkSession, fromV: Long, toV: Long): DataFrame = {
    require(fromV <= toV && toV <= version,
      s"window ($fromV, $toV] outside history [0, $version]")
    val file = "\"file\":\"([^\"]+)\"".r
    val added = scala.collection.mutable.LinkedHashSet.empty[String]
    val removed = scala.collection.mutable.LinkedHashSet.empty[String]
    ((fromV + 1) to toV).foreach { i =>
      Files.readAllLines(logDir.resolve(logName(i))).asScala.foreach { l =>
        file.findFirstMatchIn(l).foreach { m =>
          val f = m.group(1)
          if (l.contains("\"op\":\"add\"")) added += f
          else if (l.contains("\"op\":\"remove\"")) {
            // removing a file added inside the window cancels it; a file
            // from BEFORE the window is a real delete
            if (added.contains(f)) added -= f else removed += f
          }
        }
      }
    }
    import org.apache.spark.sql.functions.lit
    // both sides read under the window-end schema: deletes from an older
    // layout null-fill columns born later, mirroring the snapshot reads
    val reader = schemaAt(toV).map(spark.read.schema).getOrElse(spark.read)
    def tagged(names: Iterable[String], tag: String): Option[DataFrame] =
      if (names.isEmpty) None
      else Some(reader
        .parquet(names.map(n => dataDir.resolve(n).toString).toSeq: _*)
        .withColumn("_change_type", lit(tag)))
    (tagged(added, "insert"), tagged(removed, "delete")) match {
      case (Some(a), Some(r)) => a.unionAll(r)
      case (Some(a), None) => a
      case (None, Some(r)) => r
      case (None, None) =>
        throw new IllegalArgumentException(
          s"window ($fromV, $toV] contains no file changes")
    }
  }
}
