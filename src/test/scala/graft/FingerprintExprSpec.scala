package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Fingerprint must equal the Column-algebra fold it replaces exactly —
  * the q_fingerprint oracle hashes ride on it. The HOF spelling is the
  * executable specification: sum_i ascii(text[i]) * i (1-based) mod
  * 1e9+7, where ascii = codePointAt(0) of the i-th character.
  */
class FingerprintExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val hofFold =
    """aggregate(sequence(1, length(t)), cast(0 AS bigint),
         (acc, i) -> (acc + ascii(substring(t, i, 1)) * i) % 1000000007)"""

  test("matches the interpreted HOF fold on the corpus (codegen path)") {
    GraftFunctions.register(spark)
    val diff = spark.read
      .parquet(s"${SparkTestSession.sf0001}/documents.parquet")
      .selectExpr("text AS t")
      .selectExpr("fingerprint(t) AS native", s"$hofFold AS hof")
      .where("native <> hof")
    assert(diff.count() === 0)
  }

  test("edge cases: empty, single char, multi-byte codepoints, null") {
    GraftFunctions.register(spark)
    // multi-byte coverage: 2-byte (é), 3-byte (€), 4-byte (𝄞 U+1D11E) —
    // Spark's ascii is the full codepoint, so the byte-walk must decode
    // UTF-8, not just read lead bytes
    val rows = spark.sql(
      s"""SELECT t, fingerprint(t) AS native, $hofFold AS hof
          FROM VALUES (''), ('a'), ('abc xyz'), ('héllo €10'),
                      ('𝄞 clef'), (CAST(NULL AS STRING)) AS v(t)""")
      .collect()
    rows.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1) && r.isNullAt(2))
      else assert(r.getLong(1) === r.getLong(2), s"input '${r.getString(0)}'")
    }
    // and the empty string is 0, not null
    assert(rows.find(r => !r.isNullAt(0) && r.getString(0).isEmpty)
      .get.getLong(1) === 0L)
  }
}
