package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DivergenceOps, ScaleOps, SimilarityOps}

/** Behavioral invariants for the divergence/geometry tier — the
  * mathematical bounds and accounting identities the row-hash oracle
  * can't state. */
class DivergenceOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("KL divergence is non-negative for every source") {
    val rows = DivergenceOps.unigramKl(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0, s"negative KL for ${r.getString(0)}")
    }
  }

  test("JS divergence is symmetric-triangular, bounded by 1 bit") {
    val df = DivergenceOps.sourceJs(spark, dir).localCheckpoint()
    val nSrc = graft.model.Tables.documents(spark, dir)
      .select(col("source")).distinct().count()
    assert(df.count() === nSrc * (nSrc - 1) / 2)
    df.collect().foreach { r =>
      val js = r.getDouble(2)
      assert(js >= 0.0 && js <= 1.0, s"JS out of [0,1]: $js")
      assert(r.getString(0) < r.getString(1), "pair not canonicalized")
    }
  }

  test("G2 keyness is non-negative and zero-count cells read 'under'") {
    DivergenceOps.keynessG2(spark, dir).collect().foreach { r =>
      assert(r.getDouble(3) >= -1e-9, s"negative G2: $r")
      if (r.getLong(2) == 0L)
        assert(r.getString(4) === "under", s"zero cell not under: $r")
    }
  }

  test("LM classification conserves documents and stays inside the source set") {
    val docs = graft.model.Tables.documents(spark, dir)
    val sources = docs.select(col("source")).distinct()
      .collect().map(_.getString(0)).toSet
    val cm = DivergenceOps.lmSourceClassify(spark, dir).collect()
    assert(cm.map(_.getLong(2)).sum === docs.count())
    cm.foreach { r =>
      assert(sources.contains(r.getString(0)) && sources.contains(r.getString(1)))
    }
  }

  test("domain reweighting: both weight columns are distributions, EG-monotone") {
    val rows = DivergenceOps.domainReweight(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-3)
    assert(math.abs(rows.map(_.getDouble(5)).sum - 1.0) < 1e-3)
    // exp(η·excess)/Z is increasing in excess, so the upsample ratio
    // must order exactly like the excess loss
    val byExcess = rows.sortBy(_.getDouble(3))
      .map(r => r.getDouble(5) / r.getDouble(4))
    byExcess.sliding(2).foreach {
      case Array(lo, hi) => assert(lo <= hi + 1e-9, "EG step not monotone")
      case _             =>
    }
  }

  test("centroid distances: cosine within [-1,1], L2 positive, full triangle") {
    val k = graft.model.Tables.embeddings(spark, dir)
      .select(col("label")).distinct().count()
    val rows = SimilarityOps.centroidDistances(spark, dir).collect()
    assert(rows.length === k * (k - 1) / 2)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0.0, s"non-positive centroid L2: $r")
      assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9, s"cosine out of range: $r")
    }
  }

  test("JL projection concentrates the scaled norm ratio near 1") {
    val rows = SimilarityOps.jlProjection(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) > 0.0, s"non-positive JL ratio: $r")
    }
    val mean = rows.map(_.getDouble(3)).sum / rows.length
    // E[ratio] = 1 exactly under JL; the sample mean over all vectors
    // should sit well inside (0.7, 1.3) for k = 16
    assert(mean > 0.7 && mean < 1.3, s"JL mean ratio off: $mean")
  }

  test("join-skew histogram conserves keys and rows; share reaches 1") {
    val rows = ScaleOps.joinSkew(spark, dir).collect()
    val nRows = graft.model.Tables.lineitem(spark, dir).count()
    val nKeys = graft.model.Tables.lineitem(spark, dir)
      .select(col("l_orderkey")).distinct().count()
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum === nRows)
    assert(rows.map(_.getLong(1)).sum === nKeys)
    assert(rows.last.getDouble(2) === 1.0)
  }

  test("reaggregated weekly equals the direct weekly aggregate") {
    val fromPartials = ScaleOps.reaggRollup(spark, dir).collect()
    val direct = graft.model.Tables.events(spark, dir)
      .select(col("event_type"),
        expr("(ts div 1000) div 86400000000").as("day"), col("value"))
      .groupBy(col("event_type"), (col("day") - (col("day") % 7)).as("week_start"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"),
        round(sum(col("value")) / count(lit(1)), 6).as("avg_value"))
      .orderBy(col("event_type"), col("week_start"))
      .collect()
    assert(fromPartials.toSeq === direct.toSeq)
  }

  test("PQ assignment conserves vectors per subspace, codes in codebook range") {
    val rows = SimilarityOps.pqAssign(spark, dir).collect()
    val nVecs = graft.model.Tables.embeddings(spark, dir).count()
    rows.groupBy(_.getLong(0)).foreach { case (_, sub) =>
      assert(sub.map(_.getLong(2)).sum === nVecs, "subspace lost vectors")
    }
    rows.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(1) < 8L)
      assert(r.getDouble(3) >= 0.0)
    }
  }

  test("HLL union of hourly sketches equals the direct daily sketch") {
    val viaHourly = ScaleOps.hllUnion(spark, dir).localCheckpoint()
    val direct = graft.model.Tables.events(spark, dir)
      .select(col("event_type"),
        expr("((ts div 1000) div 3600000000) div 24").as("day"), col("user_id"))
      .groupBy(col("event_type"), col("day"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("direct_est"))
    // register-max union is order-insensitive: merging hourly partials
    // must land on exactly the registers a one-shot daily sketch builds
    val joined = viaHourly.join(direct, Seq("event_type", "day")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("est_distinct") === r.getAs[Long]("direct_est"),
        s"union-of-hourly diverged from direct sketch: $r")
      assert(r.getAs[Double]("rel_err") < 0.05,
        s"HLL error above 5%: $r")
    }
  }

  test("bucketed co-located join equals the plain join") {
    val bucketed = ScaleOps.bucketedJoin(spark, dir).collect()
    val plain = graft.model.Tables.orders(spark, dir)
      .join(graft.model.Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
      .collect()
    assert(bucketed.toSeq === plain.toSeq)
  }
}
