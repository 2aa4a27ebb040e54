package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables
import graft.operators.{AdvancedOps, BehaviorOps, CorpusOps, DedupOps, GraphOps, MlOps, ScaleOps, SimilarityOps, TextAnalysisOps}

/** Behavioral invariants for the round-6 tier (graph ranking, robust
  * stats, entity-resolution blocking, split drift, CDC merge, mixture
  * concentration) — properties the DuckDB oracle can't state directly:
  * mathematical bounds, accounting identities, toy-graph ground truth. */
class Round6OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001
  import spark.implicits._

  test("pagerank on a toy star graph: hub dominates, leaves tie, mass conserved") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val got = GraphOps.pagerank(pairs, "a", "b").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L)._1 === 3L) // hub degree
    val hub = got(1L)._2
    Seq(2L, 3L, 4L).foreach(n => assert(got(n)._2 < hub,
      s"leaf $n outranks the hub"))
    // symmetric leaves get bit-identical ranks (exact arithmetic)
    assert(got(2L)._2 === got(3L)._2)
    assert(got(3L)._2 === got(4L)._2)
    // fixed-point floors only ever LEAK mass: total stays in (0.9, 1.0]
    val total = got.values.map(_._2).sum
    assert(total <= 1000000000L && total > 900000000L,
      s"rank mass $total outside the floor-leak envelope")
  }

  test("pagerank teleport floor: every node keeps at least (1-d)/N") {
    val ranks = GraphOps.nearDupPagerank(spark, dir).localCheckpoint()
    val n = ranks.count()
    if (n > 0) {
      val floor = (1000000000L / n) * 15L / 100L
      assert(ranks.filter(col("rank_ppb") < floor).count() === 0L)
    }
  }

  test("editBlocked: zero edit distance means identical text; similarity in [0,1]") {
    val pairs = DedupOps.editBlocked(spark, dir).localCheckpoint()
    val sims = pairs.select(col("similarity")).collect().map(_.getDouble(0))
    sims.foreach(s => assert(s >= 0.0 && s <= 1.0))
    val docs = Tables.documents(spark, dir)
    val zero = pairs.filter(col("edit_dist") === 0)
      .join(docs.select(col("doc_id").as("a_id"), col("text").as("ta")), Seq("a_id"))
      .join(docs.select(col("doc_id").as("b_id"), col("text").as("tb")), Seq("b_id"))
    assert(zero.filter(col("ta") =!= col("tb")).count() === 0L)
    // canonical orientation: each pair exactly once
    assert(pairs.filter(col("a_id") >= col("b_id")).count() === 0L)
  }

  test("heapsFit: sublinear growth exponent and r2 within bounds") {
    val rows = TextAnalysisOps.heapsFit(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(2)) {
        // beta == 0 is legitimate (vocabulary fully saturated by doc 1,
        // which tiny test sources do hit); beta > 1 never is
        val beta = r.getDouble(2)
        assert(beta >= 0.0 && beta <= 1.0,
          s"source ${r.getString(0)}: Heaps beta $beta outside [0,1]")
      }
      if (!r.isNullAt(4)) {
        val r2 = r.getDouble(4)
        assert(r2 >= -1e-9 && r2 <= 1.0 + 1e-9)
      }
    }
  }

  test("madOutliers: MAD nonnegative, outliers a strict subset per group") {
    val rows = AdvancedOps.madOutliers(spark, dir)
      .select(col("n"), col("mad"), col("n_outliers")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) >= 0.0)
      assert(r.getLong(2) >= 0L && r.getLong(2) < r.getLong(0),
        "an outlier census that flags everything (or a negative count) is broken")
    }
  }

  test("mergeUpsert: per-action counts conserve the purchase-user population") {
    val byAction = BehaviorOps.mergeUpsert(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val users = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase"
        && expr("ts div 1000") < 1704758400000000L)
      .select(col("user_id")).distinct().count()
    assert(byAction.values.sum === users,
      s"merge actions ${byAction.values.sum} != merged-key population $users")
  }

  test("ksSplitDrift: statistic within [0,1] and split totals positive") {
    val r = CorpusOps.ksSplitDrift(spark, dir).collect()
    assert(r.length === 1)
    val ks = r(0).getAs[Double]("ks_stat")
    assert(ks >= 0.0 && ks <= 1.0)
    assert(r(0).getAs[Long]("n_train") > 0L && r(0).getAs[Long]("n_val") > 0L)
  }

  test("sourceConcentration: HHI/effective-count/entropy respect their bounds") {
    val r = CorpusOps.sourceConcentration(spark, dir).collect()(0)
    val n = r.getAs[Long]("n_sources").toDouble
    val hhi = r.getAs[Double]("hhi")
    val eff = r.getAs[Double]("effective_sources")
    val ent = r.getAs[Double]("entropy")
    assert(hhi >= 1.0 / n - 1e-9 && hhi <= 1.0 + 1e-9)
    assert(eff >= 1.0 - 1e-9 && eff <= n + 1e-9)
    assert(ent >= -1e-9 && ent <= math.log(n) + 1e-9)
  }

  test("winsorizedStats: clamped mean sits inside the fences, clamps bounded by 10%") {
    val rows = AdvancedOps.winsorizedStats(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, p05, p95) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      val meanW = r.getDouble(5)
      assert(meanW >= p05 - 1e-9 && meanW <= p95 + 1e-9,
        "winsorized mean escaped its own fences")
      // at most ~5% clamp on each side (rank fences) plus tie slack
      assert(r.getLong(6) <= n / 5 + 2)
    }
  }

  test("centroidOutliers: fence respected by construction, outliers under 5% plus ties") {
    val rows = SimilarityOps.centroidOutliers(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, fence, out, maxD) =
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))
      assert(maxD >= fence - 1e-9) // the max can never undershoot the p95
      assert(out <= n / 10 + 2, s"label ${r.getInt(0)}: $out outliers of $n")
    }
  }

  test("hapaxDocs: hapax tokens are a subset of each source's tokens") {
    val rows = MlOps.hapaxDocs(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, total, hapax) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(hapax >= 0L && hapax <= total)
      assert(r.getLong(5) <= nDocs) // docs_with_hapax bounded by docs
      assert(r.getLong(6) <= hapax) // single-doc max bounded by the total
    }
  }

  test("shardSkew: shard loads conserve the corpus and hover around uniform") {
    val rows = ScaleOps.shardSkew(spark, dir).localCheckpoint()
    val total = rows.agg(sum(col("n_docs"))).head().getLong(0)
    assert(total === Tables.documents(spark, dir).count())
    val meanSkew = rows.agg(avg(col("docs_skew"))).head().getDouble(0)
    assert(math.abs(meanSkew - 1.0) < 0.5) // 32 shards of a uniform hash
  }

  test("psiSplitDrift: every term nonnegative, bins conserve the non-test corpus") {
    val rows = CorpusOps.psiSplitDrift(spark, dir).collect()
    assert(rows.nonEmpty)
    // (p-q) and ln(p/q) share sign, so each attribution term is >= 0
    rows.foreach(r => assert(r.getDouble(5) >= 0.0))
    val h = substring(md5(col("doc_id").cast("string")), 1, 1)
    val nonTest = Tables.documents(spark, dir)
      .filter(h <= "b" || h.isin("c", "d")).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === nonTest)
    // a content-addressed split of one corpus should be nearly stable:
    // the PSI of a healthy split sits well under the 0.1 alert line
    assert(rows.map(_.getDouble(5)).sum < 0.1)
  }

  test("bpeMerges: step-1 winner matches the candidate table; compression is monotone") {
    val merges = MlOps.bpeMerges(spark, dir).collect()
    assert(merges.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    // step 1 must merge exactly the pair bpePairStats ranks first
    val top = MlOps.bpePairStats(spark, dir, topK = 1).head()
    assert(merges(0).getString(1).replace(" ", "") === top.getString(0))
    assert(merges(0).getLong(2) === top.getLong(1))
    // every merge strictly shrinks the weighted symbol total, by at most
    // its own pair count (greedy overlap can only reduce applied merges)
    val totals = merges.map(_.getLong(3))
    val counts = merges.map(_.getLong(2))
    totals.indices.drop(1).foreach { i =>
      assert(totals(i) < totals(i - 1))
      assert(totals(i - 1) - totals(i) <= counts(i))
    }
    assert(counts.forall(_ > 0))
  }

  test("incrementalNearDup: verdicts are fresh-side only, matched to history, bounded") {
    val rows = DedupOps.incrementalNearDup(spark, dir).collect()
    assert(rows.nonEmpty) // the corpus plants cross-split duplicates
    rows.foreach { r =>
      val (newId, oldId, best, nc) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(newId % 10 === 0L, s"$newId is not in the fresh shard")
      assert(oldId % 10 != 0L, s"best match $oldId is not historical")
      assert(best >= 0.0 && best <= 1.0)
      assert(nc >= 1L) // a verdict row exists only for colliding docs
      assert(r.getBoolean(4) === (best >= 0.5))
    }
    // one verdict per fresh doc
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
  }
}
