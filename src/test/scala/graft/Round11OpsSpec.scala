package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables
import graft.operators.{EntityOps, MlOps, PrivacyOps, TimeWindowOps}

/** Behavioral invariants for the privacy / entity-resolution /
  * time-series-smoothing tier — accounting identities and bounds the
  * row-hash oracle can't state. */
class Round11OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("pseudonymizedActivity conserves events and never leaks a raw id") {
    val out = PrivacyOps.pseudonymizedActivity(spark, dir).localCheckpoint()
    val nEvents = Tables.events(spark, dir).count()
    val nUsers = Tables.events(spark, dir).select(col("user_id")).distinct().count()
    assert(out.agg(sum(col("n_events"))).head().getLong(0) === nEvents)
    // keyed-hash pseudonyms: one per user, no collisions at this scale,
    // and no pseudonym is a bare decimal id
    assert(out.count() === nUsers)
    assert(out.filter(col("pid").rlike("^[0-9]+$")).count() === 0L)
  }

  test("kAnonymityCells releases counts only at k>=5 distinct users") {
    val cells = PrivacyOps.kAnonymityCells(spark, dir).localCheckpoint()
    assert(cells.filter(col("released") && col("n_users") < 5).count() === 0L)
    assert(cells.filter(!col("released") && col("released_rows").isNotNull).count() === 0L)
    // released rows never exceed the corpus; suppression withholds, not invents
    val released = cells.agg(sum(col("released_rows"))).head().getLong(0)
    assert(released <= Tables.events(spark, dir).count())
  }

  test("fuzzyPartPairs emits ordered pairs within the edit budget") {
    val pairs = EntityOps.fuzzyPartPairs(spark, dir).localCheckpoint()
    assert(pairs.count() > 0)
    assert(pairs.filter(col("a_key") >= col("b_key")).count() === 0L)
    assert(pairs.filter(col("dist") > 3 || col("dist") < 0).count() === 0L)
    assert(pairs.filter(col("sim") <= 0 || col("sim") > 1).count() === 0L)
    // blocked join: every emitted pair shares its blocking noun
    val diffNoun = pairs.filter(
      element_at(split(col("a_name"), " "), 2) =!=
        element_at(split(col("b_name"), " "), 2))
    assert(diffNoun.count() === 0L)
  }

  test("snmNearDupPairs stays above threshold with unique ordered pairs") {
    val pairs = EntityOps.snmNearDupPairs(spark, dir).localCheckpoint()
    assert(pairs.filter(col("a_id") >= col("b_id")).count() === 0L)
    assert(pairs.filter(col("jaccard") < 0.6 || col("jaccard") > 1.0).count() === 0L)
    assert(pairs.count() === pairs.select(col("a_id"), col("b_id")).distinct().count())
  }

  test("ewmaDaily starts at the observed count and stays inside the window range") {
    val out = TimeWindowOps.ewmaDaily(spark, dir).localCheckpoint()
    val first = out.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("day"))))
      .filter(col("rn") === 1)
    assert(first.filter(abs(col("ewma") - col("cnt")) > 1e-6).count() === 0L)
    // a convex average of counts can never leave the global [min,max] band
    val (lo, hi) = {
      val r = out.agg(min(col("cnt")), max(col("cnt"))).head()
      (r.getLong(0).toDouble, r.getLong(1).toDouble)
    }
    assert(out.filter(col("ewma") < lo - 1e-6 || col("ewma") > hi + 1e-6).count() === 0L)
  }

  test("ohlcDaily keeps open/close inside [low, high] and conserves rows") {
    val out = TimeWindowOps.ohlcDaily(spark, dir).localCheckpoint()
    assert(out.filter(
      col("open") < col("low") || col("open") > col("high") ||
        col("close") < col("low") || col("close") > col("high")).count() === 0L)
    assert(out.agg(sum(col("n"))).head().getLong(0) ===
      Tables.events(spark, dir).count())
  }

  test("skylineParts emits a strictly-improving frontier that dominates everything") {
    import graft.operators.AdvancedOps
    val frontier = AdvancedOps.skylineParts(spark, dir).collect()
    assert(frontier.nonEmpty)
    val pts = frontier.map(r => (r.getLong(1), r.getLong(2)))
    // along increasing price the quantity must strictly increase — else
    // the cheaper point would dominate
    pts.sliding(2).foreach {
      case Array((x1, y1), (x2, y2)) => assert(x1 < x2 && y1 < y2)
      case _ =>
    }
    // no part in the corpus strictly dominates a frontier member
    val all = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(round(min(col("l_extendedprice")) * 100, 0).cast("long").as("x"),
        sum(col("l_quantity")).cast("long").as("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    pts.foreach { case (fx, fy) =>
      assert(!all.exists { case (x, y) =>
        x <= fx && y >= fy && (x < fx || y > fy)
      })
    }
  }

  test("benfordAudit is an exact census with Benford shares summing to ~1") {
    import graft.operators.AdvancedOps
    val rows = AdvancedOps.benfordAudit(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSet.subsetOf((1L to 9L).toSet))
    val n = Tables.events(spark, dir).filter(col("value") > 0).count()
    assert(rows.map(_.getLong(1)).sum === n)
    val pSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(pSum - 1.0) < 1e-4) // Benford masses cover digits 1..9
    rows.foreach(r => assert(r.getDouble(4) >= 0.0)) // χ² terms non-negative
  }

  test("olsDaily reproduces a driver-side exact normal-equation solve") {
    import graft.operators.ScaleOps
    val got = ScaleOps.olsDaily(spark, dir).head()
    // recompute from the same daily table with BigInt algebra
    val daily = Tables.events(spark, dir)
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg(round(sum(col("value")) * 100, 0).cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val minDay = daily.map(_._1).min
    val f = daily.map { case (day, y) =>
      (day - minDay, if (day % 7 == 2 || day % 7 == 3) 1L else 0L, y)
    }
    def s(g: ((Long, Long, Long)) => Long): BigInt = f.map(t => BigInt(g(t))).sum
    val (n, sd, sw) = (BigInt(f.length), s(_._1), s(_._2))
    val (sdd, sdw, sww) = (s(t => t._1 * t._1), s(t => t._1 * t._2), s(t => t._2 * t._2))
    val (sy, sdy, swy) = (s(_._3), s(t => t._1 * t._3), s(t => t._2 * t._3))
    val dm = n * (sdd * sww - sdw * sdw) - sd * (sd * sww - sdw * sw) + sw * (sd * sdw - sdd * sw)
    val d1 = n * (sdy * sww - sdw * swy) - sy * (sd * sww - sdw * sw) + sw * (sd * swy - sdy * sw)
    val expectSlope = d1.toDouble / dm.toDouble / 100
    assert(math.abs(got.getAs[Double]("b_day") - expectSlope) < 1e-4)
    assert(got.getAs[Long]("n_days") === f.length.toLong)
  }

  test("pathTrigrams conserves the per-user sequence count") {
    import graft.operators.BehaviorOps
    val top = BehaviorOps.pathTrigrams(spark, dir, k = 1000000).localCheckpoint()
    // every user with n >= 3 events contributes exactly n-2 trigrams
    val expect = Tables.events(spark, dir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 3)
      .agg(sum(col("n") - 2)).head().getLong(0)
    assert(top.agg(sum(col("n"))).head().getLong(0) === expect)
    top.collect().foreach(r => assert(r.getString(0).split(">").length === 3))
  }

  test("chi2Independence cells conserve the corpus and expected mass") {
    import graft.operators.BehaviorOps
    val cells = BehaviorOps.chi2Independence(spark, dir).localCheckpoint()
    val n = Tables.events(spark, dir).count()
    assert(cells.agg(sum(col("n"))).head().getLong(0) === n)
    // Σ expected == Σ observed (marginal identity), up to emission rounding
    val expSum = cells.agg(sum(col("expected"))).head().getDouble(0)
    assert(math.abs(expSum - n) < 1e-2)
    cells.collect().foreach(r => assert(r.getDouble(4) >= 0.0))
  }

  test("interpolateGaps is exact on observed days and convex between them") {
    import graft.operators.ScaleOps
    val out = ScaleOps.interpolateGaps(spark, dir).localCheckpoint()
    // observed days carry their true value
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
      .agg((round(sum(col("value")) * 100, 0) / 100).as("truth"))
      .filter(col("day") % 3 === 0)
    val joined = out.filter(col("observed"))
      .join(daily, Seq("event_type", "day"))
    assert(joined.filter(abs(col("filled") - col("truth")) > 1e-3).count() === 0L)
    // filled values never leave the global [min, max] envelope per type
    val env = out.groupBy(col("event_type"))
      .agg(min(col("filled")).as("lo"), max(col("filled")).as("hi"))
    val obsEnv = out.filter(col("observed")).groupBy(col("event_type"))
      .agg(min(col("filled")).as("olo"), max(col("filled")).as("ohi"))
    val bad = env.join(obsEnv, Seq("event_type"))
      .filter(col("lo") < col("olo") - 1e-6 || col("hi") > col("ohi") + 1e-6)
    assert(bad.count() === 0L) // linear interp can't overshoot its anchors
  }

  test("kwic windows always contain the probe and respect the ±2 bound") {
    import graft.operators.TextAnalysisOps
    val hits = TextAnalysisOps.kwic(spark, dir).collect()
    assert(hits.nonEmpty)
    hits.foreach { r =>
      val ctx = r.getString(2).split(" ")
      assert(ctx.contains("spark"))
      assert(ctx.length <= 5) // ±2 tokens around the hit
    }
  }

  test("medianOfMeans lands inside the bucket-mean range") {
    import graft.operators.AdvancedOps
    val r = AdvancedOps.medianOfMeans(spark, dir).head()
    assert(r.getLong(0) === 32L)
    val mom = r.getDouble(1)
    val stats = Tables.events(spark, dir)
      .agg(min(col("value")), max(col("value"))).head()
    assert(mom >= stats.getDouble(0) && mom <= stats.getDouble(1))
  }

  test("bounceRate sessions conserve events and bounces never exceed sessions") {
    import graft.operators.BehaviorOps
    val out = BehaviorOps.bounceRate(spark, dir).localCheckpoint()
    assert(out.filter(col("bounces") > col("sessions")).count() === 0L)
    assert(out.filter(col("bounce_rate") < 0 || col("bounce_rate") > 1).count() === 0L)
    // session count is bounded by events (each session holds ≥1 event)
    val n = Tables.events(spark, dir).count()
    assert(out.agg(sum(col("sessions"))).head().getLong(0) <= n)
  }

  test("cohortLtv curves are monotone and conserve purchase revenue") {
    import graft.operators.BehaviorOps
    val out = BehaviorOps.cohortLtv(spark, dir).localCheckpoint()
    // cumulative cents never decrease within a cohort
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort_day")).orderBy(col("wk"))
    val bad = out.withColumn("prev", lag(col("cum_cents"), 1).over(w))
      .filter(col("prev").isNotNull && col("cum_cents") < col("prev"))
    assert(bad.count() === 0L)
    // the final cumulative row of every cohort sums to total purchase cents
    val finalRows = out.withColumn("rn",
        row_number().over(w.orderBy(col("wk").desc)))
      .filter(col("rn") === 1)
    val total = finalRows.agg(sum(col("cum_cents"))).head().getLong(0)
    val truth = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .agg(round(sum(col("value")) * 100, 0).cast("long")).head().getLong(0)
    // per-cohort-week cents round independently; allow 1-cent-per-cell slack
    assert(math.abs(total - truth) <= out.count())
  }

  test("markovSteps distributions stay stochastic at every step") {
    import graft.operators.BehaviorOps
    val rows = BehaviorOps.markovSteps(spark, dir).collect()
    assert(rows.length >= 2)
    (1 to 3).foreach { s =>
      val mass = rows.map(_.getDouble(s)).sum
      assert(math.abs(mass - 1.0) < 1e-4, s"step $s mass $mass")
    }
  }

  test("mutualInformation is non-negative and bounded by label entropy") {
    import graft.operators.MlOps
    val rows = MlOps.mutualInformation(spark, dir).collect()
    assert(rows.length === 2)
    val nEn = Tables.documents(spark, dir).filter(col("lang") === "en").count()
    val n = Tables.documents(spark, dir).count()
    val p = nEn.toDouble / n
    val hy = -(p * math.log(p) + (1 - p) * math.log(1 - p))
    rows.foreach { r =>
      val mi = r.getDouble(1)
      assert(mi >= -1e-9 && mi <= hy + 1e-9)
    }
  }

  test("seasonalDecompose reassembles: trend + seasonal + residual == value") {
    import graft.operators.ScaleOps
    val out = ScaleOps.seasonalDecompose(spark, dir).localCheckpoint()
    val bad = out.filter(
      abs(col("trend") + col("seasonal") + col("residual")
        - col("cents") / 100.0) > 2e-4)
    assert(bad.count() === 0L)
    // seasonal components average to ~0 per type over observed weekdays
    val seasonal = out.select(col("event_type"), (col("day") % 7).as("wd"), col("seasonal"))
      .distinct()
    val drift = seasonal.groupBy(col("event_type")).agg(avg(col("seasonal")).as("m"))
    assert(drift.filter(abs(col("m")) > 50).count() === 0L) // small vs daily spend scale
  }

  test("classBalance caps every class at the minority size") {
    import graft.operators.CorpusOps
    val out = CorpusOps.classBalance(spark, dir).localCheckpoint()
    val m = out.agg(min(col("n_before"))).head().getLong(0)
    assert(out.filter(col("n_after") =!= m).count() === 0L) // all classes == min
    assert(out.filter(col("n_after") > col("n_before")).count() === 0L)
  }

  test("rollingCorr stays in [-1, 1] with full windows in the interior") {
    import graft.operators.ScaleOps
    val out = ScaleOps.rollingCorr(spark, dir).localCheckpoint()
    assert(out.filter(col("r").isNotNull &&
      (col("r") < -1.0 || col("r") > 1.0)).count() === 0L)
    assert(out.filter(col("n_days") > 15).count() === 0L) // ±7 window bound
  }

  test("temporalJoin conserves purchases and never assigns a future status") {
    import graft.operators.BehaviorOps
    val out = BehaviorOps.temporalJoin(spark, dir).localCheckpoint()
    val purchases = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase").count()
    assert(out.agg(sum(col("n_purchases"))).head().getLong(0) === purchases)
    // statuses come only from the status stream (or the explicit none)
    val ok = Set("signup", "error", "none")
    out.collect().foreach(r => assert(ok.contains(r.getString(0))))
  }

  test("journeyEdit pairs equal sessions minus users") {
    import graft.operators.BehaviorOps
    val out = BehaviorOps.journeyEdit(spark, dir).localCheckpoint()
    // every user with s sessions contributes s-1 consecutive pairs
    val sess = BehaviorOps.bounceRate(spark, dir)
      .agg(sum(col("sessions"))).head().getLong(0)
    val users = Tables.events(spark, dir).select(col("user_id")).distinct().count()
    assert(out.agg(sum(col("n_pairs"))).head().getLong(0) === sess - users)
    assert(out.filter(col("dist") < 0 || col("dist") > 20).count() === 0L)
  }

  test("vectorDrift is positive, finite, and covers every label") {
    import graft.operators.SimilarityOps
    val rows = SimilarityOps.vectorDrift(spark, dir).collect()
    val labels = Tables.embeddings(spark, dir).select(col("label")).distinct().count()
    assert(rows.length.toLong === labels)
    rows.foreach { r =>
      val d = r.getDouble(3)
      assert(d >= 0.0 && !d.isNaN && !d.isInfinite)
      assert(r.getLong(1) + r.getLong(2) > 0)
    }
  }

  test("stopwordDiscovery only admits majority-document terms") {
    import graft.operators.TextAnalysisOps
    val out = TextAnalysisOps.stopwordDiscovery(spark, dir).localCheckpoint()
    val n = Tables.documents(spark, dir).count()
    assert(out.filter(col("df") * 2 <= n).count() === 0L)
    assert(out.filter(col("doc_share") > 1.0 || col("mass_share") > 1.0).count() === 0L)
    assert(out.count() > 0) // the synthetic vocab guarantees common terms
  }

  test("olsForecast intervals are positive and forecasts finite") {
    import graft.operators.ScaleOps
    val rows = ScaleOps.olsForecast(spark, dir).collect()
    assert(rows.length === 15) // 5 types × 3-day horizon
    rows.foreach { r =>
      assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite)
      assert(r.getDouble(3) > 0.0) // nonzero residual noise floor
    }
  }

  test("gapPercentiles are ordered and count gaps exactly") {
    import graft.operators.BehaviorOps
    val rows = BehaviorOps.gapPercentiles(spark, dir).collect()
    assert(rows.nonEmpty)
    var total = 0L
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3)) // p50 <= p95
      assert(r.getLong(2) > 0)
      total += r.getLong(1)
    }
    // gaps = events - users (every event but each user's first has one)
    val n = Tables.events(spark, dir).count()
    val u = Tables.events(spark, dir).select(col("user_id")).distinct().count()
    assert(total === n - u)
  }

  test("burnRate pages only when both windows exceed budget") {
    import graft.operators.AdvancedOps
    val out = AdvancedOps.burnRate(spark, dir).localCheckpoint()
    assert(out.agg(sum(col("n"))).head().getLong(0) ===
      Tables.events(spark, dir).count())
    // the paging flag is exactly the conjunction of both burn multipliers > 1
    val bad = out.filter(col("paging") =!=
      (col("burn_1h") > 1.0 && col("burn_6h") > 1.0))
    assert(bad.count() === 0L)
  }

  test("dailyBands are ordered percentile ribbons") {
    import graft.operators.AdvancedOps
    val out = AdvancedOps.dailyBands(spark, dir).localCheckpoint()
    assert(out.filter(col("p10") > col("p50") || col("p50") > col("p90")).count() === 0L)
    assert(out.agg(sum(col("n"))).head().getLong(0) ===
      Tables.events(spark, dir).count())
  }

  test("hampelOutliers drops edges and flags only beyond 3 MAD") {
    import graft.operators.ScaleOps
    val out = ScaleOps.hampelOutliers(spark, dir).localCheckpoint()
    // 7-wide centered window: exactly 6 edge days dropped per type
    val types = out.select(col("event_type")).distinct().count()
    val days = Tables.events(spark, dir)
      .select(expr("ts div 86400000000000").as("day"), col("event_type"))
      .distinct().count()
    assert(out.count() === days - 6 * types)
    val bad = out.filter(col("outlier") =!=
      (abs(col("spend") - col("roll_med")) > lit(3) * col("roll_mad") + 1e-9))
    assert(bad.count() === 0L)
  }

  test("wilsonCi brackets p_hat inside [0, 1]") {
    import graft.operators.BehaviorOps
    val out = BehaviorOps.wilsonCi(spark, dir).localCheckpoint()
    val bad = out.filter(
      col("wilson_lo") > col("p_hat") || col("p_hat") > col("wilson_hi") ||
        col("wilson_lo") < 0 || col("wilson_hi") > 1)
    assert(bad.count() === 0L)
  }

  test("mannKendall S is bounded by the pair count and z by sanity") {
    import graft.operators.ScaleOps
    val rows = ScaleOps.mannKendall(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, nd, z) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(math.abs(s) <= nd * (nd - 1) / 2)
      assert(!z.isNaN && math.abs(z) < 10)
    }
  }

  test("welchT arms partition the orders and t matches the mean gap sign") {
    import graft.operators.BehaviorOps
    val r = BehaviorOps.welchT(spark, dir).head()
    val (na, nb) = (r.getLong(0), r.getLong(1))
    assert(na + nb === Tables.orders(spark, dir).count())
    val gap = r.getDouble(2) - r.getDouble(3)
    val t = r.getDouble(4)
    assert(math.signum(gap) === math.signum(t) || math.abs(t) < 1e-9)
    val df = r.getDouble(5)
    assert(df > 0 && df <= (na + nb - 2).toDouble + 1e-6)
  }

  test("entityClusters have >= 2 members and carry their min-key name") {
    import graft.operators.EntityOps
    val out = EntityOps.entityClusters(spark, dir).localCheckpoint()
    assert(out.count() > 0)
    assert(out.filter(col("n_members") < 2).count() === 0L)
    assert(out.filter(col("canonical_name").isNull).count() === 0L)
  }

  test("docNovelty starts saturated and conserves the gram census") {
    import graft.operators.CorpusOps
    val rows = CorpusOps.docNovelty(spark, dir).orderBy(col("cohort")).collect()
    assert(rows.nonEmpty)
    // the first cohort owns by far the most first-seen grams (vocab birth)
    assert(rows.head.getDouble(4) >= rows.last.getDouble(4))
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2)) // novel <= grams
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    // every distinct gram is first-seen exactly once corpus-wide
    val totalNovel = rows.map(_.getLong(3)).sum
    val distinctGrams = Tables.documents(spark, dir)
      .select(explode(array_distinct(expr(
        """transform(sequence(1, size(split(text, ' ')) - 1),
           i -> concat(element_at(split(text, ' '), i), ' ',
                element_at(split(text, ' '), i + 1)))"""))).as("g"))
      .select(col("g")).distinct().count()
    assert(totalNovel === distinctGrams)
  }

  test("runsTest counts are consistent and z is finite") {
    import graft.operators.ScaleOps
    val r = ScaleOps.runsTest(spark, dir).head()
    val (n, n1, n0, runs) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n === n1 + n0)
    assert(runs >= 1 && runs <= n)
    assert(!r.getDouble(4).isNaN && math.abs(r.getDouble(4)) < 10)
  }

  test("acfLags covers every (type, lag) cell with r in [-1, 1]") {
    import graft.operators.ScaleOps
    val out = ScaleOps.acfLags(spark, dir).localCheckpoint()
    val types = Tables.events(spark, dir).select(col("event_type")).distinct().count()
    assert(out.count() === types * 7)
    assert(out.filter(col("r").isNotNull &&
      (col("r") < -1.0 || col("r") > 1.0)).count() === 0L)
    // pair counts shrink exactly with the lag on the dense day spine
    val w = out.groupBy(col("lag")).agg(max(col("n")).as("mx"), min(col("n")).as("mn"))
    assert(w.filter(col("mx") =!= col("mn")).count() === 0L)
  }

  test("logisticStep's one step improves on the w=0 loss") {
    val r = MlOps.logisticStep(spark, dir).head()
    val loss = r.getAs[Double]("log_loss")
    val acc = r.getAs[Double]("acc")
    // at w = 0 the log-loss is exactly ln 2; a full-batch gradient step
    // with this lr must not end above it on the training set
    assert(loss > 0.0 && loss <= math.log(2.0) + 1e-9)
    assert(acc >= 0.0 && acc <= 1.0)
  }
}
