package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AdvancedOps, BehaviorOps, DedupOps, DivergenceOps, GraphOps, MlOps, RelationalOps, SimilarityOps, TextAnalysisOps}

/** Behavioral invariants for the round-9 tier (AUC, decayed counts, KMV,
  * source overlap, prefix join, ALS step) — properties the DuckDB oracle
  * can't state: equivalence to brute-force formulations, estimator
  * bounds, accounting identities. */
class Round9OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001
  import spark.implicits._

  test("histogram AUC equals the brute-force pairwise Mann-Whitney count") {
    val got = BehaviorOps.aucClicksToPurchase(spark, dir).collect().head
    val (nPos, nNeg, auc) = (got.getLong(0), got.getLong(1), got.getDouble(2))
    // brute force: score every (pos, neg) user pair directly
    val perUser = graft.model.Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("score"),
        when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) * 5 >
          count(lit(1)), 1L).otherwise(0L).as("pos"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val pos = perUser.filter(_._2 == 1L).map(_._1)
    val neg = perUser.filter(_._2 == 0L).map(_._1)
    assert(nPos === pos.length.toLong && nNeg === neg.length.toLong)
    val wins = (for { p <- pos; n <- neg } yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val brute = wins / (pos.length.toDouble * neg.length)
    assert(math.abs(auc - brute) < 1e-6) // auc is rounded to 6 decimals
  }

  test("decayed counts equal the direct 7-day weighted window sum") {
    val rows = BehaviorOps.decayedDailyCounts(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.nonEmpty)
    rows.foreach { case ((et, day), (_, decayed)) =>
      val direct = (0 to 6).map { age =>
        rows.get((et, day - age)).map(_._1 * (1L << (6 - age))).getOrElse(0L)
      }.sum
      assert(decayed === direct, s"($et, $day)")
    }
    // a day's own count carries the maximal weight 64
    rows.foreach { case (_, (n, decayed)) => assert(decayed >= 64L * n) }
  }

  test("KMV keeps min(k, exact) hashes and estimates within sane bounds") {
    val rows = AdvancedOps.kmvDistinctUsers(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (kKept, exact, est) = (r.getLong(1), r.getLong(3), r.getDouble(4))
      assert(kKept === math.min(64L, exact))
      assert(est > 0.0)
      // KMV with k=64 has rsd ~ 1/sqrt(k-2) ~ 13%; allow a wide 4-sigma
      assert(math.abs(est - exact) / exact < 0.52,
        s"estimate $est vs exact $exact")
    }
  }

  test("source overlap: shared counts bounded by the smaller side") {
    val rows = DivergenceOps.sourceOverlap(spark, dir).collect()
    rows.foreach { r =>
      val (na, nb, shared) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val (containment, jaccard) = (r.getDouble(5), r.getDouble(6))
      assert(shared >= 1L && shared <= math.min(na, nb))
      assert(containment > 0.0 && containment <= 1.0)
      assert(jaccard <= containment + 1e-12) // |∩|/|∪| ≤ |∩|/min
    }
  }

  test("uncapped prefix join equals brute-force token-set Jaccard >= 0.3") {
    // the prefix-filter principle is EXACT: with the per-token cap
    // lifted, candidate generation loses no qualifying pair
    val got = DedupOps.prefixJaccardJoin(spark, dir, cap = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val toks = graft.model.Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_remove(array_distinct(split(col("text"), " ")), "").as("t"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val brute = (for {
      (a, ta) <- toks; (b, tb) <- toks if a < b
      inter = (ta & tb).size
      j = inter.toDouble / (ta.size + tb.size - inter)
      // HALF_UP to mirror Spark's round() on the threshold boundary
      if BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP) >= 0.3
    } yield (a, b)).toSet
    assert(got === brute)
    // the capped default can only shrink the candidate set
    val capped = DedupOps.prefixJaccardJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(got))
  }

  test("association rules: confidences in (0,1], pair support bounded") {
    val rows = MlOps.assocRules(spark, dir, minPairs = 2).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cab, ca, cb) = (r.getLong(3), r.getLong(4), r.getLong(5))
      val (confAb, confBa, lift) = (r.getDouble(6), r.getDouble(7), r.getDouble(8))
      assert(cab <= math.min(ca, cb)) // a pair can't out-count its items
      assert(confAb > 0.0 && confAb <= 1.0 && confBa > 0.0 && confBa <= 1.0)
      assert(lift > 0.0)
    }
  }

  test("conservation: Q13 histogram accounts for every customer and order") {
    val rows = RelationalOps.custOrderDist(spark, dir).collect()
    val customers = graft.model.Tables.customer(spark, dir).count()
    val orders = graft.model.Tables.orders(spark, dir).count()
    assert(rows.map(_.getLong(1)).sum === customers)
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum === orders)
  }

  test("MI is bounded by both marginal entropies; NMI in [0,1]") {
    val r = BehaviorOps.typeHourMi(spark, dir).collect().head
    val (mi, hT, hH, nmi) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(mi >= -1e-9)
    assert(mi <= math.min(hT, hH) + 1e-9)
    assert(nmi >= -1e-9 && nmi <= 1.0 + 1e-9)
  }

  test("Gini stays in [0,1) and n_users/total match the raw aggregates") {
    val rows = BehaviorOps.giniActivity(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0)
    }
  }

  test("weekday anomaly: flag is exactly the 1.5-sigma predicate on z") {
    val rows = BehaviorOps.weekdayAnomaly(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(6) === (math.abs(r.getDouble(5)) >= 1.5))
    }
  }

  test("MRR: reciprocal rank is 0 on a miss, else 1/first_hit_rank in [1/k,1]") {
    val rows = SimilarityOps.ivfMrr(spark, dir).collect()
    assert(rows.length === 5) // one row per probe query, hit or miss
    rows.foreach { r =>
      val (rank, rr) = (r.getLong(1), r.getDouble(2))
      if (rank == 0L) assert(rr === 0.0)
      else {
        assert(rank >= 1L && rank <= 3L)
        assert(math.abs(rr - math.rint(1e6 / rank) / 1e6) < 1e-9)
      }
    }
  }

  test("canonical selection keeps the max-quality member of every cluster") {
    val out = GraphOps.clusterCanonical(spark, dir).collect()
    val quality = TextAnalysisOps.qualityScore(spark, dir)
      .select(col("doc_id"), col("quality")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach { r =>
      val (nDocs, keepId, keepQ, dropped) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))
      assert(nDocs >= 2L) // every clustered node has at least one edge
      assert(dropped === nDocs - 1)
      assert(math.abs(quality(keepId) - keepQ) < 1e-9)
    }
  }

  test("leakage-free split: clusters are indivisible and docs conserved") {
    val rows = GraphOps.leakageFreeSplit(spark, dir).collect()
    val totalDocs = graft.model.Tables.documents(spark, dir).count()
    assert(rows.map(_.getLong(1)).sum === totalDocs)
    // a cluster lives in exactly one split: per-split distinct-cluster
    // counts add up to the global cluster count (straddling would
    // double-count)
    val totalClusters = GraphOps.clusterCanonical(spark, dir).count()
    assert(rows.map(_.getLong(3)).sum === totalClusters)
  }

  test("hard negatives never share the probe's label and rank by cosine") {
    val rows = SimilarityOps.hardNegatives(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, group) =>
      val sorted = group.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq === (1 to sorted.length))
      // cosines non-increasing down the rank
      val cos = sorted.map(_.getDouble(5)).toSeq
      assert(cos === cos.sorted.reverse)
      group.foreach(r => assert(r.getInt(1) !== r.getInt(4)))
    }
  }

  test("FP-Growth pair itemsets match the exact self-join pair counts") {
    import graft.operators.MlLibOps
    val baskets = graft.model.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("item"))
      .distinct().localCheckpoint()
    val n = baskets.select(col("o")).distinct().count()
    // 1.5/n: MLlib's minCount = ceil(minSupport·n) lands exactly on 2
    // regardless of float rounding (2.0/n·n could tip to 2.0000…004)
    val fp = MlLibOps.fpGrowthItemsets(baskets, minSupport = 1.5 / n)
      .filter(col("n_items") === 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = baskets.select(col("o"), col("item").as("a"))
      .join(baskets.select(col("o"), col("item").as("b")), Seq("o"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .collect().map(r => s"${r.getLong(0)},${r.getLong(1)}" -> r.getLong(2)).toMap
    assert(fp === exact) // same pairs, same exact supports
    assert(fp.nonEmpty)
  }

  test("ALS half-sweep: solved user factors satisfy the ridge identity") {
    val out = MlOps.alsRank1Step(spark, dir).collect()
    assert(out.length <= 20 && out.nonEmpty)
    // ranks are contiguous from 1 and the factor is non-increasing
    assert(out.map(_.getInt(0)).toSeq === (1 to out.length))
    val vs = out.map(_.getDouble(4)).toSeq
    assert(vs === vs.sorted.reverse)
    // with all-ones item factors and ratings >= 1, 0 < u <= mean(r), so
    // every learned item factor stays strictly positive
    vs.foreach(v => assert(v > 0.0))
  }
}
