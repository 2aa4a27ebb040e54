package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expr.{DotProduct, DotProductRewrite}

/** The HOF→native rewrite must fire on exactly the canonical
  * aggregate(zip_with(...)) dot-product spelling and nothing else.
  * (Value equivalence of DotProduct vs the HOF pair — including the
  * null/length edge cases — is proven in DotProductExprSpec.) */
class DotProductRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def emb = spark.read
    .parquet(s"${SparkTestSession.sf0001}/embeddings.parquet")
    .selectExpr("vec_id", "cast(embedding AS array<double>) AS v")

  private def optimizedFor(sql: String) =
    DotProductRewrite(emb.selectExpr(s"$sql AS d").queryExecution.optimizedPlan)

  private def hasDot(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    plan.expressions.exists(_.exists(_.isInstanceOf[DotProduct]))

  test("rewrites the canonical HOF dot product, either operand order") {
    assert(hasDot(optimizedFor(
      "aggregate(zip_with(v, v, (x, y) -> x * y), cast(0 AS double), (acc, x) -> acc + x)")))
    assert(hasDot(optimizedFor(
      "aggregate(zip_with(v, v, (x, y) -> y * x), cast(0 AS double), (acc, x) -> x + acc)")))
  }

  test("leaves non-dot-product aggregate/zip_with shapes untouched") {
    // not a product of the two lambda vars
    assert(!hasDot(optimizedFor(
      "aggregate(zip_with(v, v, (x, y) -> x * x), cast(0 AS double), (acc, x) -> acc + x)")))
    // subtraction fold is not a sum
    assert(!hasDot(optimizedFor(
      "aggregate(zip_with(v, v, (x, y) -> x * y), cast(0 AS double), (acc, x) -> acc - x)")))
    // nonzero seed changes the fold
    assert(!hasDot(optimizedFor(
      "aggregate(zip_with(v, v, (x, y) -> x * y), cast(1 AS double), (acc, x) -> acc + x)")))
    // non-identity finish
    assert(!hasDot(optimizedFor(
      "aggregate(zip_with(v, v, (x, y) -> x * y), cast(0 AS double), (acc, x) -> acc + x, acc -> acc + 1.0)")))
  }

  test("float arrays (casts inside the lambda) are not rewritten") {
    val floatSide = spark.read
      .parquet(s"${SparkTestSession.sf0001}/embeddings.parquet")
      .selectExpr(
        "aggregate(zip_with(embedding, embedding, (x, y) -> cast(x AS double) * cast(y AS double)), cast(0 AS double), (acc, x) -> acc + x) AS d")
    assert(!hasDot(DotProductRewrite(floatSide.queryExecution.optimizedPlan)))
  }
}
