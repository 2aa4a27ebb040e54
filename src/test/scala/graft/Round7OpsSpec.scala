package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables
import graft.operators.{CorpusOps, DivergenceOps, ScaleOps, SimilarityOps}

/** Behavioral invariants for the round-7 tier (semantic dedup,
  * classifier calibration, footer-stats metadata scan, curriculum
  * sharding) — the properties the DuckDB hash check can't state:
  * accounting identities, bounds, and monotone structure. */
class Round7OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("semDedup: one keeper per cluster, members share the keeper's cell-bounded origin") {
    val rows = SimilarityOps.semDedup(spark, dir).collect()
    assert(rows.nonEmpty, "no semantic-dup clusters found at all")
    val byCluster = rows.groupBy(_.getLong(0))
    byCluster.foreach { case (c, members) =>
      assert(members.count(_.getInt(4) == 1) === 1,
        s"cluster $c does not keep exactly one representative")
      // the cluster label is the min member id (star-contraction root)
      assert(members.map(_.getLong(1)).min === c,
        s"cluster $c not labeled by its min member")
      // the keeper is the member least similar to its centroid
      val keeper = members.find(_.getInt(4) == 1).get
      val minCos = members.map(_.getDouble(3)).min
      assert(keeper.getDouble(3) === minCos,
        s"cluster $c keeper is not the least-centroid-similar member")
    }
    // every cluster has at least two members (singletons carry no edge)
    byCluster.foreach { case (c, members) =>
      assert(members.length >= 2, s"cluster $c is a singleton")
    }
  }

  test("marginCalibration: doc population conserved, accuracy within [0,1]") {
    val rows = DivergenceOps.marginCalibration(spark, dir).collect()
    assert(rows.nonEmpty)
    val nDocs = rows.map(_.getLong(1)).sum
    // every scored document lands in exactly one bin
    val scoredDocs = Tables.documents(spark, dir).count()
    assert(nDocs === scoredDocs,
      s"calibration bins hold $nDocs docs, corpus has $scoredDocs")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "more correct than present")
      val acc = r.getDouble(3)
      assert(acc >= 0.0 && acc <= 1.0)
      val bin = r.getInt(0)
      assert(bin >= 0 && bin <= 9)
    }
  }

  test("aggPushdownStats: footer stats equal the scanned truth, confs restored") {
    val v1Before = spark.conf.get("spark.sql.sources.useV1SourceList")
    val aggBefore = spark.conf.get("spark.sql.parquet.aggregatePushdown")
    val got = ScaleOps.aggPushdownStats(spark, dir).collect()(0)
    // conf hygiene: the scoped confs are back exactly as they were
    assert(spark.conf.get("spark.sql.sources.useV1SourceList") === v1Before)
    assert(spark.conf.get("spark.sql.parquet.aggregatePushdown") === aggBefore)
    val li = Tables.lineitem(spark, dir)
    val truth = li.agg(count(lit(1)), min(col("l_orderkey")),
      max(col("l_orderkey")), min(col("l_linenumber")),
      max(col("l_linenumber"))).collect()(0)
    assert(got.getLong(0) === truth.getLong(0))
    assert(got.getLong(1) === truth.getLong(1))
    assert(got.getLong(2) === truth.getLong(2))
    assert(got.getInt(3) === truth.getInt(3))
    assert(got.getInt(4) === truth.getInt(4))
  }

  test("bpeEncode: symbol mass between token and char mass, equals the trainer's total") {
    import graft.operators.MlOps
    val rows = MlOps.bpeEncode(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tokens, chars, syms) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // every token is at least one symbol; merging never grows past chars
      assert(syms >= tokens && syms <= chars,
        s"source ${r.getString(0)}: symbol mass $syms outside [$tokens, $chars]")
    }
    // accounting identity: the encoder's corpus symbol total IS the
    // trainer's post-step-3 compression-progress number
    val encTotal = rows.map(_.getLong(3)).sum
    val trainerTotal = MlOps.bpeMerges(spark, dir).collect()
      .maxBy(_.getInt(0)).getLong(3)
    assert(encTotal === trainerTotal,
      s"encoder total $encTotal != trainer total_symbols_after $trainerTotal")
  }

  test("qualitySchedule: greedy fill meets the budget exactly, rates fall monotonically") {
    val rows = CorpusOps.qualitySchedule(spark, dir).collect().sortBy(_.getInt(0))
    assert(rows.length === 10)
    val total = rows.map(_.getLong(2)).sum
    val budget = total * 50 / 100
    // the greedy fill admits exactly the budget (boundary decile fractional)
    assert(rows.map(_.getLong(3)).sum === budget,
      s"kept ${rows.map(_.getLong(3)).sum} != budget $budget")
    // keep rates never rise as quality falls
    rows.map(_.getDouble(4)).sliding(2).foreach {
      case Array(hi, lo) => assert(lo <= hi + 1e-12, "keep_rate rose down-decile")
      case _ =>
    }
    // per-decile kept tokens never exceed the decile's mass
    rows.foreach(r => assert(r.getLong(3) >= 0L && r.getLong(3) <= r.getLong(2)))
  }

  test("curriculumShards: population conserved, quality spans descend without overlap") {
    val rows = CorpusOps.curriculumShards(spark, dir).collect()
    assert(rows.length === 8)
    assert(rows.map(_.getLong(1)).sum === Tables.documents(spark, dir).count())
    // ntile balance: shard sizes differ by at most one
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1L)
    // contiguous global order: shard k's max quality never exceeds
    // shard k-1's min quality (ties may touch, never cross)
    rows.sortBy(_.getInt(0)).sliding(2).foreach {
      case Array(hi, lo) =>
        assert(lo.getDouble(3) <= hi.getDouble(4) + 1e-12,
          s"shard ${lo.getInt(0)} overlaps shard ${hi.getInt(0)}")
      case _ =>
    }
  }
}
