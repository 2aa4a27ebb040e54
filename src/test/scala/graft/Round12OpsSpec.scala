package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusOps, MlOps, SimilarityOps}

/** Behavioral invariants for the round-12 tier (privacy scrub,
  * cross-lingual contamination, embedding compression/truncation) —
  * properties the DuckDB oracle can't state directly. */
class Round12OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("redactionAudit accounting: redacted length = original + growth per match") {
    // '[ENTITY]' replaces 'customer' (8 chars → 8 chars, +0) and
    // '[PRODUCT]' replaces 'spark' (5 → 9, +4): the redacted byte size
    // is exactly originals + 4·n_product — the census must balance.
    val audit = CorpusOps.redactionAudit(spark, dir)
    val orig = graft.model.Tables.documents(spark, dir)
      .groupBy(col("source")).agg(sum(length(col("text"))).as("olen"))
    val joined = audit.join(orig, Seq("source")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nProd, redLen, oLen) = (r.getAs[Long]("n_product"),
        r.getAs[Long]("redacted_len"), r.getAs[Long]("olen"))
      assert(redLen === oLen + 4 * nProd,
        s"${r.getAs[String]("source")}: $redLen != $oLen + 4*$nProd")
    }
  }

  test("crosslangDups rows genuinely span languages and count their docs") {
    val rows = MlOps.crosslangDups(spark, dir).collect()
    rows.foreach { r =>
      val nLangs = r.getAs[Long]("n_langs")
      val langs = r.getAs[String]("langs").split(",")
      assert(nLangs >= 2 && langs.length == nLangs,
        s"langs list disagrees with n_langs: $r")
      assert(langs.sorted.sameElements(langs), s"langs not sorted: $r")
      assert(r.getAs[Long]("n_docs") >= nLangs, s"fewer docs than langs: $r")
    }
  }

  test("matryoshkaRecall is bounded in [0,1] and full-width recall would be 1") {
    val rows = SimilarityOps.matryoshkaRecall(spark, dir).collect()
    assert(rows.length === 5) // one per probe
    rows.foreach { r =>
      for (c <- Seq("recall_8", "recall_16", "recall_32")) {
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c out of range: $v")
      }
    }
    // recall at the FULL width against itself is exactly 1 by
    // construction — run the same machinery with dims=Seq(64)
    SimilarityOps.matryoshkaRecall(spark, dir, dims = Seq(64)).collect()
      .foreach(r => assert(r.getAs[Double]("recall_64") === 1.0))
  }

  test("hammingRecall bounds: recall in [0,1], mean Hamming within [0,64]") {
    val rows = SimilarityOps.hammingRecall(spark, dir).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall_hamming")
      val mh = r.getAs[Double]("top_mean_hamming")
      assert(rec >= 0.0 && rec <= 1.0, s"recall out of range: $r")
      assert(mh >= 0.0 && mh <= 64.0, s"mean Hamming out of range: $r")
    }
  }

  test("clusterPurity cells partition the corpus; purity >= 1/cell and <= 1") {
    val rows = SimilarityOps.clusterPurity(spark, dir).collect()
    val total = rows.map(_.getAs[Long]("n_vectors")).sum
    val corpus = graft.model.Tables.embeddings(spark, dir).count()
    assert(total === corpus, s"cells do not partition the corpus: $total != $corpus")
    rows.foreach { r =>
      val p = r.getAs[Double]("purity")
      assert(p > 0.0 && p <= 1.0, s"purity out of range: $r")
      assert(r.getAs[Long]("top_n") <= r.getAs[Long]("n_vectors"))
    }
  }

  test("sourceDedupMatrix conserves: cells sum to docs minus distinct fingerprints") {
    // every duplicate group of size n contributes n−1 members to the
    // matrix and singletons contribute 0, so the grand total is exactly
    // |docs| − |distinct token sets| — the accounting identity that
    // catches double-attribution or dropped groups.
    val matrixTotal = MlOps.sourceDedupMatrix(spark, dir)
      .agg(coalesce(sum(col("n_dup_docs")), lit(0L))).head().getLong(0)
    val docs = graft.model.Tables.documents(spark, dir)
      .select(col("text"),
        md5(concat_ws(" ",
          array_sort(array_remove(array_distinct(split(col("text"), " ")), ""))))
          .as("fp"))
    val n = docs.count()
    val distinct = docs.select(col("fp")).distinct().count()
    assert(matrixTotal === n - distinct,
      s"matrix total $matrixTotal != $n - $distinct")
  }

  test("survivalKm invariants: risk sets shrink by exits, survival non-increasing") {
    val rows = graft.operators.BehaviorOps.survivalKm(spark, dir)
      .orderBy(col("day")).collect()
    assert(rows.nonEmpty)
    var prevSurv = 1.0
    rows.sliding(2).foreach {
      case Array(a, b) =>
        // tomorrow's risk set loses exactly today's events + censored
        // (the day grid has no gaps while at_risk > exits)
        assert(b.getAs[Long]("at_risk") ===
          a.getAs[Long]("at_risk") - a.getAs[Long]("n_events")
            - a.getAs[Long]("n_censored"), s"risk-set leak: $a -> $b")
      case _ => ()
    }
    rows.foreach { r =>
      val s = r.getAs[Double]("survival")
      assert(s >= 0.0 && s <= prevSurv + 1e-9, s"survival increased: $r")
      prevSurv = s
      assert(r.getAs[Double]("hazard") >= 0.0 && r.getAs[Double]("hazard") <= 1.0)
    }
  }

  test("zonemapSkip never skips a bucket that contains matching rows") {
    // ground truth: recompute each probe's matching rows from the raw
    // layout; a skipped bucket must contribute zero matches, so
    // rows_total - rows_skipped >= true match count, and ratios in [0,1]
    val layout = graft.operators.ScaleOps.zorderLayout(spark, dir)
      .localCheckpoint()
    val audit = graft.operators.ScaleOps.zonemapSkip(spark, dir).collect()
    val probes = Seq((1L, "x", 32L, 63L), (2L, "x", 128L, 191L), (3L, "y", 0L, 63L))
    probes.foreach { case (id, dim, lo, hi) =>
      val (mn, mx) = if (dim == "x") ("min_x", "max_x") else ("min_y", "max_y")
      val overlapping = layout
        .filter(!(col(mx) < lo || col(mn) > hi))
        .agg(coalesce(sum(col("n_orders")), lit(0L))).head().getLong(0)
      val r = audit.find(_.getAs[Long]("probe_id") == id).get
      assert(r.getAs[Long]("rows_total") - r.getAs[Long]("rows_skipped") === overlapping,
        s"probe $id: surviving rows disagree with zone-map overlap")
      val ratio = r.getAs[Double]("skip_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
  }

  test("corpusFreeze emits three splits and keeps the dedup rank a group limit") {
    val df = graft.operators.CorpusOps.corpusFreeze(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"dedup rank sorts whole fingerprint groups:\n$plan")
    val rows = df.collect()
    assert(rows.map(_.getAs[String]("split")).toSet === Set("train", "val", "test"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") > 0L && r.getAs[Long]("n_tokens") > 0L)
      assert(r.getAs[Long]("n_sources") <= 20L)
    }
  }

  test("qualityDupLift buckets partition the corpus; means sit inside [0,1]") {
    val rows = graft.operators.TextAnalysisOps.qualityDupLift(spark, dir).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total === graft.model.Tables.documents(spark, dir).count(),
      "dup buckets do not partition the corpus")
    rows.foreach { r =>
      val m = r.getAs[Double]("mean_quality")
      assert(m >= 0.0 && m <= 1.0, s"mean quality out of range: $r")
    }
  }

  test("packingAudit invariants: bin arithmetic and the one-split-per-boundary bound") {
    graft.operators.CorpusOps.packingAudit(spark, dir).collect().foreach { r =>
      val (docs, toks, bins, splits) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("total_tokens"), r.getAs[Long]("n_bins"),
        r.getAs[Long]("n_split_docs"))
      assert(bins === (toks + 511) / 512, s"bin count wrong: $r")
      // each of the n_bins-1 interior boundaries can split at most one doc
      assert(splits <= bins - 1 && splits <= docs, s"split bound violated: $r")
      val fill = r.getAs[Double]("fill_rate")
      assert(fill > 0.0 && fill <= 1.0, s"fill rate out of range: $r")
    }
  }

  test("samplePsi terms are non-negative and the sample is a subset") {
    val rows = graft.operators.CorpusOps.samplePsi(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sample") <= r.getAs[Long]("n_full"), s"$r")
      // (p-q)·ln(p/q) has matching signs in both factors
      assert(r.getAs[Double]("psi_term") >= -1e-9, s"negative PSI term: $r")
    }
  }

  test("nearDupClusterSpan agrees with clusterCanonical on the components") {
    // both consume the same cached text near-dup labeling: the
    // (component, n_docs) censuses must be identical, and span counts
    // are bounded by membership
    val span = graft.operators.GraphOps.nearDupClusterSpan(spark, dir)
      .collect().map(r => r.getAs[Long]("component") -> r).toMap
    val canon = graft.operators.GraphOps.clusterCanonical(spark, dir)
      .collect().map(r => r.getAs[Long]("component") -> r.getAs[Long]("n_docs")).toMap
    assert(span.keySet === canon.keySet, "component sets disagree")
    span.foreach { case (c, r) =>
      assert(r.getAs[Long]("n_docs") === canon(c), s"membership disagrees at $c")
      assert(r.getAs[Long]("n_sources") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_langs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_docs") >= 2L, s"singleton cluster leaked: $r")
    }
  }

  test("int8QuantAudit error bound: max reconstruction error <= scale/2") {
    // round-to-nearest guarantees |x - q·scale| ≤ scale/2; with scale =
    // max|x|/127 and unit-scale-ish synthetic embeddings the bound is
    // loose but must NEVER be violated — per label the max observed
    // error is at most half the largest per-vector scale.
    val e = graft.model.Tables.embeddings(spark, dir)
      .select(col("label"),
        (array_max(transform(col("embedding").cast("array<double>"),
          x => abs(x))) / 127.0).as("scale"))
      .groupBy(col("label")).agg(max(col("scale")).as("smax"))
    // derive the embedding width from the data rather than pinning 64 —
    // if the synthetic dimension ever changes this stays a real check
    val dim = graft.model.Tables.embeddings(spark, dir)
      .select(org.apache.spark.sql.functions.size(col("embedding")))
      .head.getInt(0).toLong
    val audit = SimilarityOps.int8QuantAudit(spark, dir)
    audit.join(e, Seq("label")).collect().foreach { r =>
      assert(r.getAs[Double]("max_err") <= r.getAs[Double]("smax") / 2 + 1e-9,
        s"quantization error exceeds half-step: $r")
      assert(r.getAs[Long]("total_err_ppm") >= 0L)
      assert(r.getAs[Long]("n_cells") === r.getAs[Long]("n_vectors") * dim)
    }
  }
}
