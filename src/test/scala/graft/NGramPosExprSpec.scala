package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** The native ngram_pos generator: emitted rows and 1-based positions,
  * degenerate inputs (short arrays, null array, null tokens), and
  * agreement with the composed transform+explode spelling it exists to
  * replace. */
class NGramPosExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def gramsOf(toks: Seq[String], n: Int): Seq[(Long, String)] = {
    GraftFunctions.register(spark)
    Seq(Tuple1(toks)).toDF("toks")
      .select(expr(s"ngram_pos(toks, $n) AS (pos, gram)"))
      .as[(Long, String)].collect().toSeq
  }

  test("emits every n-gram with its 1-based start position") {
    assert(gramsOf(Seq("a", "b", "c", "d"), 2) ===
      Seq((1L, "a b"), (2L, "b c"), (3L, "c d")))
    assert(gramsOf(Seq("a", "b", "c", "d"), 3) ===
      Seq((1L, "a b c"), (2L, "b c d")))
    assert(gramsOf(Seq("a"), 1) === Seq((1L, "a")))
  }

  test("short arrays, empty arrays, and null arrays emit nothing") {
    assert(gramsOf(Seq("a", "b"), 3) === Seq.empty)
    assert(gramsOf(Seq.empty, 2) === Seq.empty)
    GraftFunctions.register(spark)
    val fromNull = Seq(Tuple1(null.asInstanceOf[Seq[String]])).toDF("toks")
      .select(expr("ngram_pos(toks, 2) AS (pos, gram)"))
      .collect()
    assert(fromNull.isEmpty)
  }

  test("a window containing a null token is skipped, neighbors survive") {
    assert(gramsOf(Seq("a", null, "c", "d"), 2) === Seq((3L, "c d")))
  }

  test("non-array input fails analysis, not execution") {
    GraftFunctions.register(spark)
    val err = intercept[Exception] {
      Seq("plain").toDF("t").select(expr("ngram_pos(t, 2)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array"))
  }

  test("agrees with the transform+explode spelling on real documents") {
    GraftFunctions.register(spark)
    val docs = graft.model.Tables.documents(spark, SparkTestSession.sf0001)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), x -> x != '')").as("toks"))
      .localCheckpoint()
    val native = docs
      .select(col("doc_id"), expr("ngram_pos(toks, 3) AS (pos, gram)"))
    val composed = docs
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), posexplode(expr(
        "transform(slice(toks, 1, size(toks) - 2)," +
          " (x, i) -> concat_ws(' ', x, toks[i + 1], toks[i + 2]))"))
        .as(Seq("p0", "gram")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("gram"))
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
  }
}
