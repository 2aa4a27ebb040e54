package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral invariants for the round-14 tier (sequence mining, RLE,
  * DP release, HITS) — properties the DuckDB oracle can't state
  * directly. */
class Round14OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("seqMining support never exceeds the user universe; ratio agrees") {
    val rows = graft.operators.BehaviorOps.seqMining(spark, dir).collect()
    assert(rows.length <= 25, "at most |types|^2 pattern rows")
    val nUsers = graft.model.Tables.events(spark, dir)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    rows.foreach { r =>
      val support = r.getLong(2)
      assert(support >= 1L && support <= nUsers)
      // 6-dp rounding; half-mode-agnostic bound
      assert(math.abs(r.getDouble(3) - support.toDouble / nUsers) <= 5e-7)
    }
  }

  test("eventRuns run lengths partition the event count exactly") {
    val rows = graft.operators.BehaviorOps.eventRuns(spark, dir).collect()
    val mass = rows.map(r => r.getLong(1) * r.getLong(2)).sum
    val total = graft.model.Tables.events(spark, dir).count()
    assert(mass === total,
      "sum(run_len * n_runs) must equal the total event count")
    assert(rows.forall(_.getLong(1) >= 1L))
  }

  test("dp release: noise bounded by the truncation, audit columns honest") {
    val rows = graft.operators.PrivacyOps.dpCountRelease(spark, dir).collect()
    val trueCounts = graft.model.Tables.events(spark, dir)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet === trueCounts.keySet)
    rows.foreach { r =>
      val (t, trueN, noisyN, absErr) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(trueN === trueCounts(t), "true_n must be the exact count")
      assert(math.abs(noisyN - trueN) === absErr)
      assert(absErr <= 10L, "noise must respect the +-10 truncation")
      assert(r.getBoolean(4) === (absErr * 200 <= trueN))
    }
  }

  test("decision stump: argmin unique, split counts consistent") {
    val rows = graft.operators.MlOps.decisionStump(spark, dir).collect()
    assert(rows.count(_.getBoolean(6)) === 1, "exactly one best split")
    rows.foreach { r =>
      val (nl, pl, nr, pr) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(pl <= nl && pr <= nr)
      assert(nl + nr === rows.head.getLong(1) + rows.head.getLong(3),
        "every split partitions the same universe")
      assert(r.getDouble(5) >= 0.0)
    }
  }

  test("interval union: busy time bounded by interval-sum and span") {
    val rows = graft.operators.BehaviorOps.intervalUnion(spark, dir).collect()
    val users = rows.map(_.getLong(1)).sum
    val nUsers = graft.model.Tables.events(spark, dir)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(users === nUsers, "every user lands in exactly one bucket")
    rows.foreach { r =>
      val (islands, n, busy) = (r.getLong(0), r.getLong(1), r.getLong(2))
      // each island is at least one 5-min interval long
      assert(busy >= islands * n * 300000000L)
    }
  }

  test("hits matches an independent driver-side recomputation") {
    // the tiny graph fits on the driver: recompute the two integer
    // power iterations in plain Scala and compare every score.
    val edges = graft.model.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(graft.model.Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.model.Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(graft.model.Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(graft.model.Tables.nation(spark, dir)
        .select(col("n_nationkey").as("ck"), col("n_name").as("src")),
        col("c_nationkey") === col("ck"))
      .join(graft.model.Tables.nation(spark, dir)
        .select(col("n_nationkey").as("sk"), col("n_name").as("dst")),
        col("s_nationkey") === col("sk"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))

    val h1 = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val a1 = edges.groupBy(_._2).map { case (d, es) =>
      d -> es.map(e => e._3 * h1(e._1)).sum / 1024 }
    val h2 = edges.groupBy(_._1).map { case (s, es) =>
      s -> es.map(e => e._3 * a1(e._2)).sum / 1024 }
    val a2 = edges.groupBy(_._2).map { case (d, es) =>
      d -> es.map(e => e._3 * h2(e._1)).sum / 1024 }

    val got = graft.operators.GraphOps.hitsNationTrade(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSet === (h2.keySet ++ a2.keySet))
    got.foreach { case (nation, hub, auth) =>
      assert(hub === h2.getOrElse(nation, 0L), s"hub($nation)")
      assert(auth === a2.getOrElse(nation, 0L), s"auth($nation)")
    }
  }
}
