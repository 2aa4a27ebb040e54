package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** IntersectSize must equal size(array_intersect(a, b)) exactly — the
  * Jaccard oracle hashes ride on it. */
class IntersectSizeExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("matches the builtin on corpus bigram pairs (codegen path)") {
    GraftFunctions.register(spark)
    val g = spark.read
      .parquet(s"${SparkTestSession.sf0001}/documents.parquet")
      .selectExpr("doc_id",
        "array_distinct(filter(split(text, ' '), t -> t <> '')) AS toks")
    val pairs = g.selectExpr("doc_id AS a_id", "toks AS a")
      .crossJoin(g.selectExpr("doc_id AS b_id", "toks AS b"))
      .where("a_id < b_id AND a_id % 7 = 0")
    val diff = pairs.selectExpr(
      "intersect_size(a, b) AS native",
      "size(array_intersect(a, b)) AS builtin")
      .where("native <> builtin")
    assert(diff.count() === 0)
  }

  test("edge cases: empties, duplicates, null elements, null arrays") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT
           intersect_size(array('a','b','a'), array('a','c')) AS dup_left,
           intersect_size(CAST(array() AS ARRAY<STRING>), array('a')) AS empty_left,
           intersect_size(array('a', CAST(NULL AS STRING)), array(CAST(NULL AS STRING), 'b')) AS null_both,
           intersect_size(array('a', CAST(NULL AS STRING)), array('a')) AS null_left_only,
           intersect_size(CAST(NULL AS ARRAY<STRING>), array('a')) AS null_arr
         """).head()
    assert(rows.getInt(0) === 1)  // 'a' counted once despite the dup
    assert(rows.getInt(1) === 0)
    assert(rows.getInt(2) === 1)  // null ∈ both sides counts once, like array_intersect
    assert(rows.getInt(3) === 1)  // left-only null does not count
    assert(rows.isNullAt(4))      // null array propagates null
  }
}
