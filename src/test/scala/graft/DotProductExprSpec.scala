package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.DotProduct
import graft.functions.GraftFunctions

/** The native DotProduct expression must be bit-identical to the
  * aggregate(zip_with(...)) HOF formulation it replaced (same
  * left-to-right summation order), on both the interpreted and codegen
  * paths — the ANN oracle hashes depend on it. */
class DotProductExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("interpreted eval: known dot products, null propagation") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    def lit(xs: Double*) = Literal.create(
      ArrayData.toArrayData(xs.toArray),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    assert(DotProduct(lit(1.0, 2.0, 3.0), lit(4.0, 5.0, 6.0)).eval(null) === 32.0)
    assert(DotProduct(lit(), lit()).eval(null) === 0.0)
    val nullArr = Literal.create(null,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    assert(DotProduct(lit(1.0), nullArr).eval(null) === null)
    // HOF edge-case parity: zip_with null-pads mismatched lengths and a
    // null product nulls the fold — both must yield NULL, not a partial sum
    assert(DotProduct(lit(1.0, 2.0), lit(1.0)).eval(null) === null)
    val withNullElem = Literal.create(
      ArrayData.toArrayData(Array[Any](1.0, null)),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, true))
    assert(DotProduct(withNullElem, lit(3.0, 4.0)).eval(null) === null)
  }

  test("codegen path is bit-identical to the HOF formulation on embeddings") {
    GraftFunctions.register(spark)
    val e = spark.read.parquet(s"${SparkTestSession.sf0001}/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding AS array<double>) AS v")
    val viaExpr = e.selectExpr("vec_id", "dot_product(v, v) AS d")
    val viaHof = e.selectExpr("vec_id",
      "aggregate(zip_with(v, v, (x, y) -> x * y), cast(0 AS double), (acc, x) -> acc + x) AS d")
    // exceptAll compares doubles exactly — any summation-order or ulp
    // difference would surface here
    assert(viaExpr.exceptAll(viaHof).isEmpty && viaHof.exceptAll(viaExpr).isEmpty)
    // codegen length-mismatch branch: shorter-vs-full must be NULL, same
    // as the zip_with null-padding the HOF form produces
    val edge = e.selectExpr("dot_product(slice(v, 1, 4), v) AS d")
    assert(edge.filter("d IS NOT NULL").count() === 0)
  }
}
