package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables

/** Cluster-shape robustness: results must not depend on how the data
  * happens to be partitioned, and the whole engine must be drivable from
  * plain SQL over registered views (the API surface a reference user
  * would reach for first). */
class RobustnessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("results are invariant under the shuffle partition count") {
    // A 1000-executor cluster picks very different partition counts than
    // local[4]; any query whose result moves with that knob is broken at
    // scale. Exact-arithmetic queries are asserted bit-identical here;
    // float-aggregating queries are excluded deliberately (their
    // stability is post-round and the DuckDB oracle gate covers it).
    val exactQueries = Seq(
      "q_topn_per_group",    // per-row window rank, no cross-row float agg
      "q_retention_cohorts", // counts over integer day buckets
      "q_minhash_bands",     // md5-derived buckets + counts
      "q_hash_split",        // md5 splits + integer sums
    )
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    exactQueries.foreach { name =>
      val fn = SparkEntry.queries(name)
      def run(parts: String): Seq[String] = {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try fn(spark, dir).collect().map(_.toString).toSeq
        finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      }
      assert(run("7") === run(prev), s"$name result moved with partition count")
    }
  }

  test("registered views drive the engine through plain spark.sql") {
    Tables.registerViews(spark, dir)
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      """SELECT r_name, count(*) AS n_nations
         FROM region JOIN nation ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""").collect().toSeq
    val viaDf = Tables.region(spark, dir)
      .join(Tables.nation(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name")).agg(count(lit(1)).as("n_nations"))
      .orderBy(col("r_name")).collect().toSeq
    assert(viaSql === viaDf)
    // the native expressions resolve inside SQL over the views too
    val scored = spark.sql(
      "SELECT doc_id, risk_score(text) AS risk FROM documents ORDER BY doc_id LIMIT 5")
    assert(scored.count() === 5)
  }
}
