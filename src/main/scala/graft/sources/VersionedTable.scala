package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  *     read is just the fold at the head. Nothing is ever rewritten;
  *     old versions stay readable until an explicit vacuum (not
  *     implemented — retention policy is an operational choice).
  *
  * This composes with the rest of the engine: the incremental dedup/
  * admission jobs (`q_incremental_dedup`/`_neardup`) read "history" —
  * here that history gets a pinned version; `q_corpus_freeze` produces
  * a snapshot — here the snapshot gets a commit. `q_time_travel` is the
  * oracle-checked registry face of this class.
  */
class VersionedTable(val root: String) {
  private def logDir: Path = Paths.get(root, "_log")
  private def dataDir: Path = Paths.get(root, "data")

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
          "\"operation\":\"([a-z]+)\"".r.findFirstMatchIn(l).map(_.group(1))
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

  def read(spark: SparkSession): DataFrame = readAsOf(spark, version)

  def readAsOf(spark: SparkSession, v: Long): DataFrame = {
    val files = filesAt(v)
    require(files.nonEmpty, s"version $v has no live files")
    spark.read.parquet(files: _*)
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

  /** Stage the frame's parquet files into data/ under unique names;
    * invisible until some commit references them. */
  private def stage(spark: SparkSession, df: DataFrame): Seq[String] = {
    Files.createDirectories(dataDir)
    val tmp = Paths.get(root, s"_tmp-${UUID.randomUUID()}")
    df.write.parquet(tmp.toString)
    val parts = listDir(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
    val names = parts.zipWithIndex.map { case (p, i) =>
      val name = s"${UUID.randomUUID().toString.take(8)}-$i.parquet"
      Files.move(p, dataDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
      name
    }
    listDir(tmp).foreach(Files.deleteIfExists(_))
    Files.deleteIfExists(tmp)
    names
  }

  private def act(op: String, file: String): String =
    s"""{"op":"$op","file":"$file"}"""

  /** Append: stage once, then race for the next version number (an
    * append's actions are head-independent, so a lost race just retries
    * the rename). Returns the committed version. */
  def append(spark: SparkSession, df: DataFrame): Long = {
    val names = stage(spark, df)
    val actions = """{"op":"meta","operation":"append"}""" +:
      names.map(act("add", _))
    var v = version + 1
    while (!commit(v, actions)) v = math.max(v + 1, version + 1)
    v
  }

  /** Overwrite: stage once; the remove set is REBASED against the head
    * on every retry so a concurrent append's files are removed too —
    * overwrite means "the table becomes exactly this frame". */
  def overwrite(spark: SparkSession, df: DataFrame): Long = {
    val names = stage(spark, df)
    var committed = -1L
    while (committed < 0) {
      val head = version
      val removes =
        if (head < 0) Nil
        else filesAt(head).map(p => Paths.get(p).getFileName.toString)
      val actions = """{"op":"meta","operation":"overwrite"}""" +:
        (removes.map(act("remove", _)) ++ names.map(act("add", _)))
      if (commit(head + 1, actions)) committed = head + 1
    }
    committed
  }
}
