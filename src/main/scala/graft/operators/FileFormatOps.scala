package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Tables

/** Text/columnar source-format round-trip faces: the documents table is
  * written ONCE per (app, dir) to CSV, JSONL, and ORC and each query
  * reads its format back and emits a per-(lang, source) content census —
  * row count, total characters, and an order-independent md5 digest sum.
  * The DuckDB oracle recomputes the SAME census straight from the raw
  * parquet (the `q_zorder_compact`/`q_lake_restore` pattern), so the
  * hash gate proves the format leg is LOSSLESS: every row back exactly
  * once, every byte of text intact through quoting/escaping.
  *
  * The synthetic corpus contains no commas, quotes, newlines, or tabs
  * (checked — it would make the CSV face vacuous), so four ADVERSARIAL
  * rows carrying exactly those hazards are unioned in deterministically
  * on BOTH sides (negative doc_ids, `zz`/`adversarial` cell) — the CSV
  * writer must quote-and-double, the JSON writer must \\-escape, and a
  * reader that mishandles any of it flips the digest.
  *
  * Scale shape: the write is a one-time layout artifact (the lake
  * convention — at 100 TB the CSV/JSONL dump already exists when the
  * audit runs); each query is then scan → one hash aggregate over the
  * bounded (lang × source) grid. No shuffle beyond the census agg.
  */
object FileFormatOps {

  /** (doc_id, lang, source, text) with the escaping-hazard rows, plus
    * the NULL-vs-empty-string pair — the distinction CSV dialects
    * classically lose (covered here by the `\\N` null sentinel) and a
    * property the corpus itself doesn't currently exercise but a
    * regenerated one might. */
  private val advRows = Seq(
    (-1L, "zz", "adversarial", "comma, separated, values"),
    (-2L, "zz", "adversarial", "she said \"hello\" twice"),
    (-3L, "zz", "adversarial", "line one\nline two"),
    (-4L, "zz", "adversarial", "tab\there and trailing space "),
    (-5L, "zz", "adversarial", ""),
    (-6L, "zz", "adversarial", null))

  private def baseDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .unionByName(advRows.toDF("doc_id", "lang", "source", "text"))
  }

  private val readSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("source", StringType), StructField("text", StringType)))

  /** Per-(lang, source) census with a salted order-independent digest:
    * Σ over rows of the first 32 md5 bits of salt:doc_id|text — ≤2^32
    * per row keeps the int64 sum safe to ~2×10⁹ rows per (lang, source)
    * cell (≈the whole-corpus cell count at 100 TB; a wider digest
    * overflowed in DuckDB exactly where Spark's long would wrap
    * silently), and long addition is order-independent so
    * partial-aggregation order can't flip a bit. NULL text digests and
    * counts as NULL-skipped chars on both engines; only n_docs sees it. */
  private def census(df: DataFrame, salt: String): DataFrame =
    df.groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("total_chars"),
        sum(conv(substring(md5(concat(lit(salt + ":"),
            col("doc_id").cast("string"), lit("|"), col("text"))), 1, 8),
          16, 10).cast("long")).as("content_digest"))
      .orderBy(col("lang"), col("source"))

  /** One-time format dump, lake-artifact style. `reader` re-reads it
    * under the explicit schema (no inference job at any scale). */
  private def roundTrip(spark: SparkSession, dir: String, fmt: String)(
      write: (DataFrame, String) => Unit)(
      read: String => DataFrame): DataFrame = {
    val path = ScaleOps.layoutOnce(spark, dir, s"fmt_$fmt") { dtag =>
      val out = ScaleOps.scratchPath(spark, s"fmt_${fmt}_$dtag/documents")
      write(baseDocs(spark, dir), out)
      out
    }
    // fanOut: the artifact is written from the single-split documents
    // scan (and the multiLine CSV leg is non-splittable), so the md5
    // census would otherwise hash on one core; the digest sum is
    // order-independent, so redistribution is free of hash risk
    census(Tables.fanOut(read(path)), fmt)
  }

  /** RFC-style CSV (quoteAll + doubled quotes, multiLine read for the
    * embedded newline) round-trip census.
    *
    * Scale trade, out loud: `multiLine=true` makes each CSV file
    * NON-SPLITTABLE (a record boundary can no longer be found mid-file,
    * so one task reads one whole file) — required here because the
    * adversarial embedded-newline row is exactly what line-splittable
    * CSV cannot carry. The post-read [[graft.model.Tables.fanOut]]
    * redistributes before the hash work, and this face is an audit, not
    * a bulk path; for splittable bulk text interchange use the JSONL
    * face ([[jsonlRoundtrip]]), whose one-record-per-line framing keeps
    * files splittable with newlines riding `\n` escapes. */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame =
    roundTrip(spark, dir, "csv") { (df, out) =>
      // the univocity WRITER trims leading/trailing whitespace by
      // default even under quoteAll — lossy; caught by the digest.
      // nullValue \N (the classic sentinel) keeps NULL distinguishable
      // from the quoted empty string, which quoteAll alone cannot do.
      df.write.option("header", "true").option("quoteAll", "true")
        .option("escape", "\"")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .option("nullValue", "\\N")
        .mode("overwrite").csv(out)
    } { path =>
      spark.read.schema(readSchema).option("header", "true")
        .option("multiLine", "true").option("escape", "\"")
        .option("nullValue", "\\N")
        .csv(path)
    }

  /** JSON-lines round-trip census (control chars ride JSON escapes). */
  def jsonlRoundtrip(spark: SparkSession, dir: String): DataFrame =
    roundTrip(spark, dir, "jsonl") { (df, out) =>
      df.write.mode("overwrite").json(out)
    } { path => spark.read.schema(readSchema).json(path) }

  /** ORC round-trip census — the non-parquet columnar face (binary-safe
    * by construction; the census proves the type mapping is too). */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame =
    roundTrip(spark, dir, "orc") { (df, out) =>
      df.write.mode("overwrite").orc(out)
    } { path => spark.read.schema(readSchema).orc(path) }
}
