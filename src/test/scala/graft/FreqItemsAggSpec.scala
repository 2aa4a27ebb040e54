package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Misra–Gries guarantee, pinned: any item with true frequency
  * > n/(k+1) must survive the sketch under EVERY partitioning of the
  * input (partial buffers merge with the Agarwal et al. rule), and the
  * candidate set never exceeds k entries. */
class FreqItemsAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("over-threshold items survive any partitioning; buffer stays bounded") {
    GraftFunctions.register(spark)
    // n = 1000: "hh" appears 300 times (> 1000/(3+1) = 250), the other
    // 700 occurrences are all-distinct fillers
    val items = Seq.fill(300)("hh") ++ (1 to 700).map(i => s"filler_$i")
    for (parts <- Seq(1, 3, 7)) {
      val df = items.toDF("term").repartition(parts)
      val got = df.selectExpr("freq_items(term, 3) AS hh").head().getSeq[String](0)
      assert(got.contains("hh"), s"heavy hitter lost at $parts partitions: $got")
      assert(got.length <= 3, s"sketch exceeded k entries: $got")
    }
  }

  test("grouped sketch returns one bounded candidate set per group") {
    GraftFunctions.register(spark)
    val out = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
      .selectExpr("lang", "explode(split(text, ' ')) AS term")
      .where("term <> ''")
      .groupBy("lang")
      .agg(org.apache.spark.sql.functions.call_function("freq_items",
        org.apache.spark.sql.functions.col("term"),
        org.apache.spark.sql.functions.lit(5)).as("hh"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val hh = r.getSeq[String](1)
      assert(hh.nonEmpty && hh.length <= 5, s"${r.getString(0)}: $hh")
    }
  }
}
