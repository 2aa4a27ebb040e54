package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MlLibOps

class MlLibOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("MinHashLSH finds planted duplicates and near-duplicates") {
    val base = spark.read
      .parquet(s"${SparkTestSession.sf0001}/documents.parquet")
      .select("doc_id", "text")
      .limit(50)
    // plant: 1000+i = exact copy of doc i for i in 0..2
    val copies = base.filter($"doc_id" < 3)
      .select(($"doc_id" + 1000).as("doc_id"), $"text")
    val pairs = MlLibOps.minhashLshPairs(base.unionByName(copies))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = pairs.filter(_._3 == 0.0).map(p => (p._1, p._2)).toSet
    assert(Set((0L, 1000L), (1L, 1001L), (2L, 1002L)).subsetOf(exact),
      s"planted duplicates not all found: ${pairs.mkString(", ")}")
  }
}
