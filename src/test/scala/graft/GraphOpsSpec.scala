package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("connected components labels every node with its component minimum") {
    // two components: {1,2,3,4} chained, {10,11}; 20-21-22 triangle
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L),
    ).toDF("a", "b")
    val got = GraphOps.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("an empty pair graph yields an empty labeling, not an NPE") {
    // sum() over an empty frame is null — the convergence measure must
    // treat that as 0 (a candidate generator can legitimately produce no
    // pairs at some scale factor)
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(GraphOps.connectedComponents(empty, "a", "b").count() === 0L)
  }

  test("a long chain converges within the iteration budget") {
    val chain = (0L until 15L).map(i => (i, i + 1)).toDF("a", "b")
    val got = GraphOps.connectedComponents(chain, "a", "b")
      .collect().map(r => r.getLong(1)).distinct
    assert(got.toSeq === Seq(0L))
  }

  test("large-star/small-star agrees with min-label propagation on adversarial shapes") {
    // chains stress round count (worst diameter), the reversed chain
    // stresses orientation, stars stress degenerate high degree, and the
    // shuffled random graph stresses everything at once. Both
    // implementations must produce the identical (node -> component) map.
    val rng = new scala.util.Random(7)
    val shapes: Seq[(String, Seq[(Long, Long)])] = Seq(
      "descending chain" -> (0L until 40L).map(i => (i + 1, i)),
      "two stars bridged" ->
        ((1L to 9L).map(i => (0L, i)) ++ (11L to 19L).map(i => (10L, i))
          ++ Seq((9L, 11L))),
      "random graph" -> Seq.fill(120)(
        (rng.nextInt(60).toLong, rng.nextInt(60).toLong)),
      "empty" -> Seq.empty,
    )
    shapes.foreach { case (name, pairs) =>
      val df = pairs.toDF("a", "b")
      val viaLabels = GraphOps.connectedComponents(df, "a", "b", maxIter = 60)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaStars = GraphOps.connectedComponentsStar(df, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaStars === viaLabels, s"shape: $name")
    }
  }

  test("star CC converges in far fewer rounds than the chain diameter") {
    // 40-node chain, diameter 40: min-label needs ~40 rounds; the
    // alternating algorithm must finish inside a log-scale budget.
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    val got = GraphOps.connectedComponentsStar(chain, "a", "b", maxIter = 8)
      .collect().map(r => r.getLong(1)).distinct
    assert(got.toSeq === Seq(0L))
  }
}
