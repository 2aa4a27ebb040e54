package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.{RiskScore, RiskScoreRewrite}
import graft.functions.TextFunctions

class RiskScoreRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def optimized(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan

  test("rewrites the full 16-keyword column-algebra shape to RiskScore") {
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
    val plan = optimized(
      docs.select(TextFunctions.riskScore(col("text")).as("r")))
    val rewritten = RiskScoreRewrite(plan)
    assert(rewritten.expressions.exists(_.exists(_.isInstanceOf[RiskScore])),
      s"RiskScore not found in:\n$rewritten")
  }

  test("leaves partial or foreign least() shapes untouched") {
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
    // only 2 keywords — not the canonical set
    val partial = least(lit(100),
      (lower(col("text")).contains("die").cast("int")
        + lower(col("text")).contains("panic").cast("int")) * lit(10))
    val plan = optimized(docs.select(partial.as("r")))
    val rewritten = RiskScoreRewrite(plan)
    assert(!rewritten.expressions.exists(_.exists(_.isInstanceOf[RiskScore])))
  }

  test("rewritten plan evaluates identically (via extensions-enabled session sanity)") {
    // Semantics of RiskScore vs the algebra are already proven equal in
    // RiskScoreExprSpec; here just confirm the rule output stays runnable
    // by round-tripping the rewritten expression through eval.
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet").limit(5)
    val rows = docs.select(col("text"),
      TextFunctions.riskScore(col("text")).as("algebra")).collect()
    rows.foreach { r =>
      val viaExpr = RiskScore(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)),
          org.apache.spark.sql.types.StringType)).eval(null)
      assert(viaExpr === r.getInt(1))
    }
  }
}
