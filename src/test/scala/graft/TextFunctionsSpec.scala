package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

/** U-1/U-2 unit tests against the reference's golden end-to-end capture
  * (reference: data/processed_posts_realtime.json) plus the edge cases
  * from FIXTURES.md §6. Fixture strings below are DATA copied from that
  * golden JSON (title/text/cleaned_text values), not code.
  */
class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cleanOf(title: String, text: String): String = {
    Seq((title, text)).toDF("title", "text")
      .select(substring(TextFunctions.cleanText(
        concat_ws(" ", col("title"), col("text"))), 1, 200).as("c"))
      .head().getString(0)
  }

  private def riskOf(s: String): Int =
    Seq(s).toDF("t")
      .select(TextFunctions.riskScore(col("t")).as("r"))
      .head().getInt(0)

  test("golden fixture 1: 'depressed' scores 10; cleaned_text truncated at 200") {
    val title = "Any therapy or counselling services in Malaysia that offer text-based sessions?"
    val text = "Hi everyone,\nI’m looking for any therapy or counselling services in Malaysia that allow sessions through text messages.\n\nI’ve been going through a tough time lately after a breakup and have been feeling pretty depressed."
    assert(riskOf(title + " " + text) === 10)
    val expected = "any therapy or counselling services in malaysia that offer textbased sessions hi everyone im looking for any therapy or counselling services in malaysia that allow sessions through text messages ive b"
    assert(cleanOf(title, text) === expected)
  }

  test("golden fixture 3: 'kms' slang scores 0 (substring, not semantic, matching)") {
    val title = "My life makes me wanna throw up"
    val text = "I wanna kms soo bad… i cant fix anything"
    assert(riskOf(title + " " + text) === 0)
    assert(cleanOf(title, text) ===
      "my life makes me wanna throw up i wanna kms soo bad i cant fix anything")
  }

  test("risk: each keyword counts once; >=10 distinct keywords cap at 100") {
    val tenKw = "suicide hopeless worthless depressed anxious panic overwhelmed lonely isolated scared"
    assert(riskOf(tenKw) === 100)
    val elevenKw = tenKw + " die"
    assert(riskOf(elevenKw) === 100)
    assert(riskOf("suicide suicide suicide") === 10)
  }

  test("risk: substring hits ('died'/'diet' contain 'die'); case-insensitive") {
    assert(riskOf("he died yesterday") === 10)
    assert(riskOf("on a diet") === 10)
    assert(riskOf("DEPRESSED") === 10)
  }

  test("risk: ascii apostrophe matches \"can't go on\", typographic does not") {
    assert(riskOf("i can't go on") === 10)
    assert(riskOf("i can’t go on") === 0)
  }

  test("risk: null/empty → 0; clean: null/empty → empty string") {
    val df = Seq[(java.lang.Long, String)]((1L, null), (2L, "")).toDF("i", "t")
    val rows = df.select(
      TextFunctions.riskScore(col("t")).as("r"),
      TextFunctions.cleanText(col("t")).as("c")).collect()
    assert(rows.toSeq === Seq(Row(0, ""), Row(0, "")))
  }

  test("clean: URL strip, punctuation strip, whitespace collapse, trim") {
    val raw = "  Check https://example.com/x?y=1 and www.test.org NOW!!  multiple   spaces\tand\nnewlines  "
    assert(cleanOf("", raw) === "check and now multiple spaces and newlines")
  }

  test("clean is idempotent and output alphabet is [a-z0-9 ]") {
    val samples = Seq(
      "Hello, World! 123", "http://a.b c", "éèê unicode",
      "MiXeD CaSe", "  ", "a")
    val df = samples.toDF("t")
      .select(TextFunctions.cleanText(col("t")).as("c1"))
      .select(col("c1"), TextFunctions.cleanText(col("c1")).as("c2"))
    df.collect().foreach { r =>
      assert(r.getString(0) === r.getString(1), "idempotence")
      assert(r.getString(0).matches("[a-z0-9 ]*"), s"alphabet: '${r.getString(0)}'")
    }
  }

  test("risk is always a multiple of 10 in [0, 100] over the corpus") {
    val risks = SparkTestSession.spark.read
      .parquet(s"${SparkTestSession.sf0001}/documents.parquet")
      .select(TextFunctions.riskScore(col("text")).as("r"))
      .distinct().collect().map(_.getInt(0))
    assert(risks.forall(r => r >= 0 && r <= 100 && r % 10 == 0))
  }
}
