package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AdvancedOps, CorpusOps, DedupOps, GraphOps, MlOps, SimilarityOps, TextAnalysisOps}

/** Behavioral invariants for the round-5 training-data-pipeline tier —
  * properties the DuckDB oracle can't state directly (determinism,
  * accounting identities, mathematical bounds). */
class Round5OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001
  import spark.implicits._

  test("triangleStats counts the known triangles of a toy graph") {
    // triangle {1,2,3} with a pendant 4 hanging off node 3
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val got = GraphOps.triangleStats(pairs, "a", "b")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    assert(got(1L) === ((2L, 1L, Some(1.0))))
    assert(got(2L) === ((2L, 1L, Some(1.0))))
    assert(got(3L) === ((3L, 1L, Some(0.333333))))
    assert(got(4L) === ((1L, 0L, None))) // degree 1: coefficient undefined
  }

  test("seqPack conserves tokens and documents per source") {
    val packed = CorpusOps.seqPack(spark, dir).localCheckpoint()
    val fromBins = packed.groupBy(col("source"))
      .agg(sum(col("bin_tokens")).as("toks"), sum(col("n_docs")).as("docs"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val direct = graft.model.Tables.documents(spark, dir)
      .select(col("source"),
        size(filter(split(col("text"), " "), t => t =!= lit(""))).as("n"))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("toks"), count(lit(1)).as("docs"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(fromBins === direct) // chopping reassigns, never drops or double-counts
    // every source's stream starts at bin 0 (a doc longer than the bin
    // width legitimately leaves later bins without a starting doc)
    val lo = packed.groupBy(col("source")).agg(min(col("bin")).as("lo"))
      .filter(col("lo") =!= 0)
    assert(lo.count() === 0L)
  }

  test("weightedSample is deterministic and capped per source") {
    val s1 = CorpusOps.weightedSample(spark, dir).collect().toSeq
    val s2 = CorpusOps.weightedSample(spark, dir).collect().toSeq
    assert(s1 === s2) // content-addressed draw: no RNG state anywhere
    assert(s1.map(_.getInt(4)).max <= 10)
  }

  test("tokenEntropy respects the ln(n_types) bound and ttr range") {
    val rows = TextAnalysisOps.tokenEntropy(spark, dir)
      .select(col("n_types"), col("entropy"), col("ttr")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (types, h, ttr) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
      assert(h >= -1e-6 && h <= math.log(types.toDouble) + 1e-4)
      assert(ttr > 0.0 && ttr <= 1.0)
    }
  }

  test("bigram count per document is token count minus one") {
    val bg = MlOps.bigramLogprob(spark, dir).select(col("doc_id"), col("n_bigrams"))
    val un = TextAnalysisOps.tokenEntropy(spark, dir)
      .select(col("doc_id"), col("n_tokens"))
    val off = bg.join(un, Seq("doc_id"))
      .filter(col("n_bigrams") =!= col("n_tokens") - 1)
    assert(off.count() === 0L)
  }

  test("ppxBuckets tertiles are balanced and ordered by score") {
    val b = MlOps.ppxBuckets(spark, dir).localCheckpoint()
    // ntile: bucket sizes within a source differ by at most 1
    val skew = b.groupBy(col("source"))
      .agg((max(col("n_docs")) - min(col("n_docs"))).as("d"))
      .filter(col("d") > 1)
    assert(skew.count() === 0L)
    // head is the most fluent tertile: mean monotone head >= middle >= tail
    b.collect().groupBy(_.getString(0)).foreach { case (_, rows) =>
      val m = rows.map(r => r.getString(1) -> r.getDouble(3)).toMap
      assert(m("head") >= m("middle") && m("middle") >= m("tail"))
    }
  }

  test("pcaStep emits a unit-norm loading vector with positive eigenvalue") {
    val rows = SimilarityOps.pcaStep(spark, dir).collect()
    assert(rows.length === 64)
    val norm2 = rows.map(r => r.getDouble(2) * r.getDouble(2)).sum
    assert(math.abs(norm2 - 1.0) < 1e-3)
    assert(rows.map(_.getDouble(3)).distinct.length === 1) // one shared estimate
    assert(rows.head.getDouble(3) > 0.0)
    // cv0 is the unnormalized projection: loading * eigval reproduces it
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2) * r.getDouble(3)) < 1e-4)
    }
  }

  test("approx percentile rank interval covers its target within the sketch bound") {
    // Greenwald–Khanna guarantee at accuracy 1000: the returned value's
    // realized rank interval [count(<v), count(<=v)]/n must straddle the
    // target rank within eps = 1/1000 — under ANY partial merge order,
    // which is exactly what the DuckDB oracle cannot pin (rows-only).
    val eps = 0.0015 // 1/accuracy + rounding slack
    AdvancedOps.approxPercentileAudit(spark, dir).collect().foreach { r =>
      assert(r.getDouble(3) - eps <= 0.5 && 0.5 <= r.getDouble(4) + eps,
        s"p50 interval misses: $r")
      assert(r.getDouble(6) - eps <= 0.9 && 0.9 <= r.getDouble(7) + eps,
        s"p90 interval misses: $r")
    }
  }

  test("lshCurve collision rates are monotone in band width") {
    // fewer rows per band => more selective: at every match level,
    // P(collide | 2 bands of 4) <= P(collide | 4 bands of 2) <= P(any of
    // 8 singles). And a full 8/8 match must collide under every layout.
    val rows = DedupOps.lshCurve(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b8, b4, b2) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(b2 <= b4 + 1e-9 && b4 <= b8 + 1e-9, s"not monotone: $r")
      assert(b8 >= 0.0 && b8 <= 1.0)
    }
    rows.find(_.getInt(0) == 8).foreach { r =>
      assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0)
    }
  }

  test("containment dominates Jaccard on every scored pair") {
    // J = |I|/|U| <= |I|/min(|A|,|B|) = max-containment, and both
    // containments live in [0, 1]
    val c = DedupOps.containment(spark, dir, cap = 20, threshold = 0.0)
      .collect()
    assert(c.nonEmpty)
    c.foreach { r =>
      val (ca, cb) = (r.getDouble(2), r.getDouble(3))
      assert(ca >= 0.0 && ca <= 1.0 + 1e-9 && cb >= 0.0 && cb <= 1.0 + 1e-9)
    }
    val j = DedupOps.bucketedJaccard(spark, dir, cap = 20, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    c.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      j.get(key).foreach { jac =>
        assert(jac <= math.max(r.getDouble(2), r.getDouble(3)) + 1e-6,
          s"jaccard exceeds max containment for $key")
      }
    }
  }

  test("kmeansIters descends: total inertia is non-increasing per iteration") {
    val rows = SimilarityOps.kmeansIters(spark, dir).collect()
    val byIter = rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (it, rs) => it -> rs.map(_.getDouble(3)).sum }
    assert(byIter.map(_._1) === Seq(1, 2, 3))
    byIter.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      // 6-dp quantization between steps can wiggle the last decimals;
      // Lloyd's descent must still hold beyond that noise
      assert(b <= a + 1e-3, s"inertia rose: $byIter")
    }
    // every iteration accounts for the full vector set
    val n = graft.model.Tables.embeddings(spark, dir).count()
    byIter.foreach { case (it, _) =>
      assert(rows.filter(_.getInt(0) == it).map(_.getLong(2)).sum === n)
    }
  }

  test("kmeansStep assigns every vector to exactly one cell") {
    val cells = SimilarityOps.kmeansStep(spark, dir).localCheckpoint()
    assert(cells.count() <= 8L)
    val assigned = cells.agg(sum(col("n_vectors"))).head().getLong(0)
    val total = graft.model.Tables.embeddings(spark, dir).count()
    assert(assigned === total)
    assert(cells.filter(col("inertia") < 0).count() === 0L)
  }
}
