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

  test("property: native == HOF fold over 300 generated unicode strings") {
    // messy generated inputs (BMP unicode incl. multi-byte, ascii,
    // empties) — fixed seed keeps CI stable; one DataFrame pass runs
    // both formulations through the real engine
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    GraftFunctions.register(spark)
    val str: Gen[String] = Gen.oneOf(
      Gen.listOf(Gen.choose(32.toChar, 0x2fff.toChar)).map(_.mkString),
      Gen.asciiPrintableStr,
      Gen.const(""))
    val samples = Gen.listOfN(300, str)
      .apply(Gen.Parameters.default, Seed(7L)).get
    import spark.implicits._
    val diff = samples.toDF("t")
      .selectExpr("t", "fingerprint(t) AS native", s"$hofFold AS hof")
      .where("native <> hof")
      .collect()
    assert(diff.isEmpty, s"diverged on: ${diff.take(3).mkString("; ")}")
  }

  test("property: single-pass simhash equals the naive per-bit md5 spelling") {
    // the round-4 restructure must be bit-identical to the 32x-digest
    // original on arbitrary token sets, not just the corpus
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val word: Gen[String] = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val doc: Gen[String] = Gen.listOf(word).map(_.mkString(" "))
    val samples = Gen.listOfN(120, doc)
      .apply(Gen.Parameters.default, Seed(11L)).get
    val diff = samples.toDF("text")
      .selectExpr("array_remove(array_distinct(split(text, ' ')), '') AS tokens")
      .selectExpr(
        """aggregate(
             transform(tokens, t -> md5(t)),
             array_repeat(0, 32),
             (acc, d) -> zip_with(acc,
               transform(sequence(0, 31), j ->
                 CASE WHEN substring(d, j + 1, 1) IN ('8','9','a','b','c','d','e','f')
                      THEN 1 ELSE -1 END),
               (x, y) -> x + y),
             acc -> concat_ws('', transform(acc, s ->
               CASE WHEN s > 0 THEN '1' ELSE '0' END))) AS single_pass""",
        """concat_ws('', transform(sequence(0, 31), j ->
             CASE WHEN aggregate(tokens, 0, (acc, t) -> acc +
               (CASE WHEN substring(md5(t), j + 1, 1) IN ('8','9','a','b','c','d','e','f')
                     THEN 1 ELSE -1 END)) > 0
             THEN '1' ELSE '0' END)) AS naive""")
      .where("single_pass <> naive")
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
