package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min sketch invariants: the one-sided error bound against exact
  * counts, and determinism — the properties that stand in for the
  * missing DuckDB oracle (seeded hashes have no SQL twin). */
class CountMinAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  private def terms = graft.model.Tables
    .documents(spark, dir)
    .select(col("source"), explode(split(col("text"), " ")).as("term"))
    .filter(col("term") =!= "")

  test("CMS never undercounts and never exceeds the group total") {
    val probes = Seq("a", "data", "fast", "query", "row", "table", "the", "value")
    val est = SparkEntry.cmsCountsRaw(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val exact = terms.filter(col("term").isin(probes: _*))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val totals = terms.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.nonEmpty)
    est.foreach { case ((src, term), e) =>
      val ex = exact.getOrElse((src, term), 0L)
      assert(e >= ex, s"CMS undercounted $src/$term: $e < $ex")
      assert(e <= totals(src), s"CMS above group total for $src/$term")
    }
  }

  test("the sketch is deterministic across runs") {
    val a = SparkEntry.cmsCountsRaw(spark, dir).collect().toSeq
    val b = SparkEntry.cmsCountsRaw(spark, dir).collect().toSeq
    assert(a === b)
  }

  test("the oracle-facing audit reports every probe within the CMS bound") {
    val rows = SparkEntry.queries("q_cms_counts")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("cms_ok"), s"CMS bound violated: $r")
    }
  }
}
