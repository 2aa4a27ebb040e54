package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** IntersectSizeSorted must equal size(array_intersect(a, b)) exactly on
  * sorted inputs — the Jaccard oracle hashes ride on it. */
class IntersectSizeSortedExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("matches the builtin on sorted corpus bigram pairs (codegen path)") {
    GraftFunctions.register(spark)
    val g = spark.read
      .parquet(s"${SparkTestSession.sf0001}/documents.parquet")
      .selectExpr("doc_id",
        "array_sort(array_distinct(filter(split(text, ' '), t -> t <> ''))) AS toks")
    val pairs = g.selectExpr("doc_id AS a_id", "toks AS a")
      .crossJoin(g.selectExpr("doc_id AS b_id", "toks AS b"))
      .where("a_id < b_id AND a_id % 7 = 0")
    val diff = pairs.selectExpr(
      "intersect_size_sorted(a, b) AS native",
      "size(array_intersect(a, b)) AS builtin",
      "intersect_size(a, b) AS hashed")
      .where("native <> builtin OR native <> hashed")
    assert(diff.count() === 0)
  }

  test("edge cases on sorted inputs: duplicates, empties, nulls-last, null arrays") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT
           intersect_size_sorted(array('a','a','b'), array('a','c')) AS dup_left,
           intersect_size_sorted(CAST(array() AS ARRAY<STRING>), array('a')) AS empty_left,
           intersect_size_sorted(array_sort(array('a', CAST(NULL AS STRING))),
                                 array_sort(array(CAST(NULL AS STRING), 'b'))) AS null_both,
           intersect_size_sorted(array_sort(array('a', CAST(NULL AS STRING))), array('a')) AS null_left_only,
           intersect_size_sorted(CAST(NULL AS ARRAY<STRING>), array('a')) AS null_arr,
           intersect_size_sorted(array('a','b','c','x'), array('b','c','d','x')) AS merge_walk
         """).head()
    assert(rows.getInt(0) === 1)  // equal run counted once
    assert(rows.getInt(1) === 0)
    assert(rows.getInt(2) === 1)  // null on both sides counts once
    assert(rows.getInt(3) === 1)  // left-only null does not count
    assert(rows.isNullAt(4))      // null array propagates null
    assert(rows.getInt(5) === 3)  // b, c, x
  }

  test("property: agrees with the hashed kernel on generated sorted arrays") {
    GraftFunctions.register(spark)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val arr: Gen[Seq[String]] =
      Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "e", "", "fff", "g1")).map(_.sorted)
    val samples = Gen.listOfN(200, Gen.zip(arr, arr))
      .apply(Gen.Parameters.default, Seed(13L)).get
    val diff = samples.toDF("a", "b")
      .selectExpr(
        "intersect_size_sorted(a, b) AS native",
        "intersect_size(a, b) AS hashed",
        "size(array_intersect(a, b)) AS builtin")
      .where("native <> hashed OR native <> builtin")
    assert(diff.count() === 0)
  }
}
