package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Source-level invariant lints — structural guards for bug classes
  * that are invisible at one scale factor and fatal at another, so a
  * grep beats re-testing. The round-7 verdict's `q_cohort_ltv` failure
  * is the motivating case: `round(sum(value) * 100)` sums 2-dp doubles
  * BEFORE scaling, so the float partial-aggregation order (32 Spark
  * partitions vs DuckDB's serial sum) decides which side of a half-cent
  * the total lands on. The repo invariant is per-row integer conversion
  * — `sum(round(value * 100, 0).cast("long"))` — whose long addition is
  * order-independent; these lints pin that spelling everywhere, Scala
  * and oracle SQL alike.
  */
class SourceLintSpec extends AnyFunSuite {

  private def mainSources: Seq[(Path, String)] = {
    val root = Paths.get("src/main/scala")
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map(p => p -> new String(Files.readAllBytes(p), "UTF-8"))
      .toSeq
  }

  private def offenders(pattern: scala.util.matching.Regex): Seq[String] =
    mainSources.flatMap { case (path, text) =>
      text.linesIterator.zipWithIndex.collect {
        case (line, i) if pattern.findFirstIn(line).isDefined =>
          s"$path:${i + 1}: ${line.trim}"
      }
    }

  test("no money sum is scaled to cents AFTER a double aggregate") {
    // forbids `round(sum(<double>) * 100 ...)` in Column algebra and
    // `round(sum(<double>) * 100, 0)` in oracle SQL — both must convert
    // per row first. The `* 100` anchor plus the no-`/` guard keeps the
    // LEGIT spellings out of scope: a terminal division of an exact
    // integer-cents sum (`round(sum(cents) / (n * 100.0), 2)`) is
    // order-independent arithmetic on longs, only MULTIPLYING a double
    // sum back to cents is the order-dependent bug.
    val bad = offenders("""round\(sum\([^/\n]*\*\s*100""".r)
    assert(bad.isEmpty,
      s"sum-then-scale-then-round money pattern (convert per row instead):\n${bad.mkString("\n")}")
  }

  test("no oracle SQL casts a rounded double aggregate to BIGINT") {
    // the SQL twin of the lint above: `CAST(round(sum(...)...) AS
    // BIGINT)` makes an order-dependent double sum pose as an exact
    // integer — the oracle must sum per-row BIGINT cents instead.
    val bad = offenders("""CAST\(round\(sum\(""".r)
    assert(bad.isEmpty,
      s"round-after-sum integer cast in oracle SQL:\n${bad.mkString("\n")}")
  }
}
