package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.RiskScore
import graft.functions.TextFunctions

/** Property-based tests (SURVEY.md §5.2.3): ScalaCheck generates a messy
  * corpus (urls, unicode, punctuation, keywords, empties); one DataFrame
  * pass evaluates the REAL Column expressions over all samples, and the
  * properties are asserted per row. (Spark 4 Column trees are unresolved
  * until analysis, so per-sample direct eval isn't possible — batch
  * evaluation through the engine is both faster and more faithful.)
  */
class TextPropertiesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val vocabWord: Gen[String] = Gen.oneOf(
    "the", "Spark", "JOIN", "filter!", "http://x.co/a?b=1", "www.test",
    "a  b", "über", "naïve", "123", "don't", "...", "die", "panic",
    "suicide", "feeling depressed", "CAN'T GO ON", " ", "")

  private val unicodeStr: Gen[String] =
    Gen.listOf(Gen.choose(32.toChar, 0x2fff.toChar)).map(_.mkString)

  private val text: Gen[String] = for {
    words <- Gen.listOfN(12, Gen.oneOf(vocabWord, Gen.asciiPrintableStr, unicodeStr))
  } yield words.mkString(" ")

  /** 400 deterministic samples (fixed seed keeps CI stable). */
  private lazy val samples: Seq[String] =
    Gen.listOfN(400, text).apply(Gen.Parameters.default, Seed(42L)).get

  private lazy val rows = samples.toDF("t")
    .select(
      col("t"),
      TextFunctions.cleanText(col("t")).as("clean1"),
      TextFunctions.cleanText(TextFunctions.cleanText(col("t"))).as("clean2"),
      TextFunctions.riskScore(col("t")).as("risk"),
      TextFunctions.riskScore(
        concat(col("t"), lit(" "), lit("suicide"))).as("risk_plus_kw"),
    )
    .collect()

  test("clean is idempotent over 400 generated samples") {
    rows.foreach { r =>
      assert(r.getString(1) === r.getString(2), s"input: ${r.getString(0)}")
    }
  }

  test("clean output alphabet is [a-z0-9 ], trimmed, single-spaced") {
    rows.foreach { r =>
      val c = r.getString(1)
      assert(c.matches("[a-z0-9 ]*") && !c.startsWith(" ") && !c.endsWith(" ")
        && !c.contains("  "), s"input: ${r.getString(0)} clean: '$c'")
    }
  }

  test("risk is a multiple of 10 in [0,100]; appending a keyword never lowers it") {
    rows.foreach { r =>
      val risk = r.getInt(3)
      assert(risk >= 0 && risk <= 100 && risk % 10 == 0)
      assert(r.getInt(4) >= risk, s"input: ${r.getString(0)}")
    }
  }

  test("native RiskScore expression agrees with Column algebra on every sample") {
    samples.zip(rows).foreach { case (s, r) =>
      val native = RiskScore(org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType)).eval(null)
      assert(native === r.getInt(3), s"input: $s")
    }
  }
}
