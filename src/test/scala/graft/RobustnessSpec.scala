package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables

/** Cluster-shape robustness: results must not depend on how the data
  * happens to be partitioned, and the whole engine must be drivable from
  * plain SQL over registered views (the API surface a reference user
  * would reach for first). */
class RobustnessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  // Exact-arithmetic queries: asserted bit-identical under a different
  // shuffle-partition count. Everything else in the registry lands in
  // the quantize-then-compare twin test below, so EVERY registry query
  // carries a partition-count invariance assertion.
  private val exactQueries = Seq(
      "q_topn_per_group",    // per-row window rank, no cross-row float agg
      "q_retention_cohorts", // counts over integer day buckets
      "q_minhash_bands",     // md5-derived buckets + counts
      "q_hash_split",        // md5 splits + integer sums
      "q_latest_per_key",    // total order (ts desc, id desc) → rank 1
      "q_scd2_intervals",    // run numbering over a total per-user order
      "q_stratified_sample", // md5-ranked draw, integer rank cut
      "q_hash_dedup",        // md5 group-by, integer aggregates
      "q_tokenset_dedup",    // canonical fingerprint group-by
      "q_dedup_manifest",    // fingerprint window min + boolean verdict
      "q_incremental_dedup", // digest join + window min + booleans
      "q_decontaminate",     // gram equi-join + distinct counts
      "q_bloom_decontaminate", // bloom prefilter must not leak partitioning
      "q_fingerprint",       // native int64 kernel, per-row
      "q_simhash",           // md5 digest folds, per-row
      "q_funnel",            // min-µs stage chaining, integer counts
      "q_distinct_users",    // exact distinct count
      // round-5 exact-arithmetic additions
      "q_seq_pack",          // cumulative integer offsets, integer bins
      "q_dup_ngram_spans",   // gram counts; dup_fraction is row-local int/int
      "q_simhash_radius",    // capped band join + integer hamming
      "q_filter_funnel",     // integer cross-product thresholds
      "q_zorder_layout",     // pure bit algebra
      "q_frame_sample",      // byte-offset framing + md5 digests
      "q_cluster_sizes",     // component sizes, integer histogram
      "q_bpe_pairs",         // vocabulary pair counts
      // round-6 exact-arithmetic additions
      "q_pagerank",          // fixed-point integer rank updates
      "q_edit_blocked",      // integer levenshtein on blocked pairs
      "q_ks_drift",          // cross-multiplied integer CDF gap
      "q_merge_upsert",      // rank-1 merge + integer centi-value sums
      "q_shard_skew",        // md5 shards, integer loads
      "q_mad_outliers",      // exact order-statistic medians, count compare
      "q_hapax_docs",        // term-spectrum semi-join, integer ratios
      // round-7 exact-arithmetic additions
      "q_join_skew",         // integer fan-out histogram; share is int/int
      "q_partitioned_scan",  // partition-pruned integer counts (+2-dp sums)
      "q_keyness_g2",        // integer grid counts; g2 from exact marginals
      "q_cms_counts",        // CMS counters: long addition commutes
      // round-9 exact-arithmetic additions
      "q_auc",               // rank terms are exact 0.5-multiples < 2^52
      "q_gini",              // BIGINT rank sums, one final division
      "q_decayed_daily",     // power-of-two integer weights
      "q_cust_order_dist",   // integer double aggregation
      "q_kmv_distinct",      // md5 order statistics + integer counts
      "q_prefix_join",       // df-ranked prefixes, integer intersects
      "q_source_overlap",    // digest counts, row-local divisions
      "q_session_funnel",    // µs minima + integer session counts
      "q_assoc_rules",       // integer supports; lift rank on rounded key
      "q_weekday_anomaly",   // integer moments, row-local z
      "q_readability",       // integer regexp counts, row-local ratios
      "q_lateral_topk",      // integer counts through the lateral
      "q_cluster_canonical", // integer CC labels, row-local quality
      "q_acf1",              // integer moments, row-local estimator
      "q_dense_calendar",    // spine join + integer deltas
      "q_equidepth_hist",    // total-ordered ntile, exact boundaries
      "q_inverted_index",    // integer df ranks + sorted posting csv
      // round-7 exact-arithmetic additions
      "q_semdedup",          // row-local dots, ranks on rounded keys, CC labels
      "q_curriculum_shards", // distributed ntile on rounded quality, int sums
      "q_agg_pushdown",      // footer-stats count/min/max
      "q_bpe_encode",        // vocabulary-bounded merges, integer masses
      "q_quality_schedule",  // exact BIGINT budget fill over deciles
      "q_join_cardinality",  // per-key integer counts and products
      "q_cuped",             // exact BIGINT moments, scalar double algebra
      "q_dq_checks",         // conditional integer counts per rule
      "q_dedup_threshold_curve", // md5 candidates, integer counts per tau
      "q_attribution",       // total-order carry-forward, integer cents
      "q_transition_matrix", // lag cells, integer counts, row-local p
      "q_lift_deciles",      // distributed ntile + integer cumulative shares
      "q_power_mde",         // exact cent moments, scalar algebra
      "q_compaction_audit",  // fixed writer counts + exact checksums
      "q_dau_wau",           // distinct day-user cells, integer counts
      "q_seasonal_index",    // cross-multiplied BIGINT masses, one division
      // round-10 exact-arithmetic additions
      "q_scalar_subquery",   // exact-cents shares, integer cross-multiply
      "q_not_exists",        // anti-join + exact-cents threshold
      "q_recursive_cte",     // linked-list walk, integer positions
      "q_dwell_time",        // keyed lead gaps, BIGINT µs sums
      "q_timed_funnel",      // µs minima + deadline predicate
      "q_kcore",             // integer degrees, fixed peel rounds
      "q_negative_samples",  // bit-identical integer CDF + md5 draws
      "q_growth_accounting", // user-day lag/lead cells, integer counts
      "q_survival_curve",    // lifetime histogram, integer survivors
      "q_quantile_norm",     // distributed ntile + integer boundaries
      // round-11 exact-arithmetic additions (q_ohlc_daily / q_logistic_step
      // excluded: vwap / gradient are cross-row float sums)
      "q_pseudonymize",      // md5 pseudonyms, integer counts, banded mins
      "q_kanon_cells",       // integer cell counts + distinct users
      "q_fuzzy_join",        // integer levenshtein; sim is row-local int/int
      "q_snm_neardup",       // keyed lag pairs; jaccard row-local int/int
      "q_ewma_daily",        // power-of-two integer window sums, one division
      "q_skyline",           // exact integer dominance tests
      "q_benford",           // integer digit census; shares row-local
      "q_ols2",              // exact BIGINT determinants, terminal divisions
      "q_path_trigrams",     // lead over a total order, exact counts
      "q_chi2_independence", // integer cells; expected is exact cross-multiply
      "q_interpolate_gaps",  // integer cents interpolation, one division
      "q_kwic",              // per-row array slices, exact strings
      "q_bounce_rate",       // gaps-and-islands integer sessions, row-local rate
      "q_cohort_ltv",        // exact cents cumulative sums, one division
      "q_class_balance",     // md5-ranked per-class cap, integer counts
      "q_rolling_corr",      // exact integer window moments, row-local r
      "q_temporal_join",     // keyed interval join, integer cents
      "q_journey_edit",      // sorted-collect journeys, integer distances
      "q_asof_native",       // custom merge-walk exec, unique-time matches
      "q_stopwords",         // integer df/cf census, cross-multiply cut
      "q_gap_percentiles",   // exact rank-selected integer order stats
      "q_burn_rate",         // integer window sums, row-local multipliers
      "q_daily_bands",       // exact rank-selected value order stats
      "q_hampel",            // row-local sorted-window order stats
      "q_wilson_ci",         // integer cells, row-local interval algebra
      "q_mann_kendall",      // exact integer pair signs, row-local z
      "q_welch_t",           // exact integer dollar moments, row-local t
      "q_entity_clusters",   // capped pairs + integer CC labels
      "q_doc_novelty",       // gram-keyed min attribution, integer census
      "q_runs_test",         // integer run counts, row-local z
      "q_acf_lags",          // exact integer lag moments, row-local r
      // q_ols_forecast excluded: sse is a cross-row float sum
      // round-12 exact-arithmetic additions
      "q_redaction_audit",   // integer regexp counts + byte lengths
      "q_crosslang_dups",    // digest group-by, counts, sorted lang list
      "q_source_dedup_matrix", // digest-keyed canonical join, integer counts
      "q_int8_quant",        // integer ppm cells + order-independent max
      "q_hamming_recall",    // integer Hamming ranks; cosine ranks on rounded keys
      "q_matryoshka_recall", // ranks on 6-dp-rounded cosines, integer overlaps
      "q_cluster_purity",    // ranks on rounded distances, integer counts
      "q_corpus_freeze",     // digest ranks, gram joins, integer census
      "q_quality_dup_lift",  // per-row integer micro-units
      "q_survival_km",       // int/int hazards; survival is an ORDERED running sum
      "q_zonemap_skip",      // integer zone interval arithmetic
      "q_approx_distinct",   // HLL registers max-merge (commutative); exact + bound
      "q_heavy_hitters",     // MG guarantee holds under any partitioning; exact list
      "q_approx_percentiles", // ε-straddle booleans guaranteed under any merge order
      "q_packing_audit",     // integer offsets/bins, terminal divisions
      "q_sample_psi",        // integer cells; terms row-local on exact counts
      "q_cluster_span",      // integer CC labels + distinct counts
      // round-13 additions
      "q_time_travel",       // log-fold file sets, integer counts/sums
      "q_change_feed",       // net log-window file sets, integer counts/sums
      "q_versioned_scan",    // zone-map pruned scan, integer counts/sums
      "q_lake_upsert",       // delete+merge end state, integer counts/sums
      // round-14 additions
      "q_correlated_subquery", // exact-cents integer cross-multiply
      "q_seq_mining",        // window minima + distinct counts; ratio int/int
      "q_event_runs",        // gaps-and-islands integer histogram
      "q_dp_release",        // integer inverse-CDF geometric noise
      "q_backtest",          // integer-cents errors, floor-div MAE
      "q_hits",              // integer power iterations, floor-div rescale
      "q_udtf_ngrams",       // generator rows, integer census, top-k cliff
      "q_sax_motifs",        // rank-binned symbols, integer motif counts
      "q_decision_stump",    // BIGINT split counts; gini row-local on them
      "q_token_fertility",   // integer sums, row-local divisions
      "q_interval_union",    // running-max sweep, exact integer µs
      "q_cumulative_reach",  // first-touch mins, ordered integer sum
      "q_mom_growth",        // exact monthly cents, row-local ratios
      // round-15 additions
      "q_cusum",             // count-scaled integer CUSUM, integer argmax
      "q_peak_concurrency",  // integer sweep + carry-in decomposition
      "q_did",               // integer micro-cent cell means
      "q_qini",              // integer cents, floor-div control scaling
      "q_multitouch",        // integer basis-point credit
      "q_cv_folds",          // integer cents errors, floor-div MAE
      "q_conformal",         // rank-selected integer residual quantile
      "q_rake_phrases",      // integer deg/freq scores, top-k cliff
      "q_cluster_compare",   // exact ntile cuts + integer bit algebra
      "q_neyman_alloc",      // exact integer SSD; one IEEE sqrt per stratum
      "q_aes_sample",        // row-local md5 draw, 6-dp key, top-k cliff
      "q_twohop_reach",      // top-k edge cliff + distinct integer counts
      "q_sem_decontaminate", // per-row 6-dp cosine, integer census + max
      "q_propensity_strata", // integer micro-cent strata, exact numerator
      "q_simpson",           // integer cross-multiplied slope signs
      "q_zorder_compact",    // integer cents censuses over the z-ordered lake
      "q_lake_restore",      // integer cents census over the restored head
    )

  private def runAt(name: String, parts: String): Seq[org.apache.spark.sql.Row] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try SparkEntry.queries(name)(spark, dir).collect().toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("results are invariant under the shuffle partition count") {
    // A 1000-executor cluster picks very different partition counts than
    // local[4]; any query whose result moves with that knob is broken at
    // scale. These queries are exact-arithmetic end to end, so the
    // comparison is bit-identical.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val unknown = exactQueries.filterNot(SparkEntry.queries.contains)
    assert(unknown.isEmpty, s"exactQueries names not in registry: $unknown")
    exactQueries.foreach { name =>
      assert(runAt(name, "7").map(_.toString) === runAt(name, prev).map(_.toString),
        s"$name result moved with partition count")
    }
  }

  /** Tolerant cell equality for the float-aggregating family: floats
    * compare at 1e-9 relative (a partial-aggregation reorder moves a
    * double sum by ulps, never by more), everything else bit-exact —
    * recursing through arrays, structs, and maps. */
  private def cellEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Double, y: Double) =>
      (x.isNaN && y.isNaN) || x == y ||
        math.abs(x - y) <= 1e-9 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
    case (x: Float, y: Float) => cellEq(x.toDouble, y.toDouble)
    case (x: Seq[_], y: Seq[_]) =>
      x.length == y.length && x.lazyZip(y).forall(cellEq)
    case (x: Array[_], y: Array[_]) => cellEq(x.toSeq, y.toSeq)
    case (x: org.apache.spark.sql.Row, y: org.apache.spark.sql.Row) =>
      cellEq(x.toSeq, y.toSeq)
    case (x: scala.collection.Map[_, _], y: scala.collection.Map[_, _]) =>
      val ym = y.asInstanceOf[scala.collection.Map[Any, Any]]
      x.size == y.size && x.asInstanceOf[scala.collection.Map[Any, Any]]
        .forall { case (k, v) => ym.get(k).exists(cellEq(v, _)) }
    case _ => a == b
  }

  test("float-output queries are partition-count invariant after quantization") {
    // The rest of the registry: queries whose outputs pass through a
    // cross-row float aggregate before the terminal round. A partition
    // reorder may move the pre-round sum by an ulp, so the assertion is
    // tolerant on floats and exact on everything else — together with
    // the test above, all registry queries are partition-invariance
    // gated.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val floatQueries = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(exactQueries.toSet)
    assert(exactQueries.size + floatQueries.size == SparkEntry.queries.size)
    val bad = floatQueries.flatMap { name =>
      val a = runAt(name, "7")
      val b = runAt(name, prev)
      if (a.length == b.length && a.lazyZip(b).forall((x, y) => cellEq(x, y))) None
      else Some(name)
    }
    assert(bad.isEmpty, s"results moved with partition count: $bad")
  }

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    // one key owns ~all the rows: the classic skew that stalls a static
    // plan on a single straggler task. With the skew-join thresholds
    // lowered to bench scale, AQE must detect and split that partition.
    // The pad is md5 chains, NOT a repeated constant: shuffle sizes are
    // COMPRESSED bytes, and a constant pad deflates below any threshold.
    val left = spark.range(60000).selectExpr(
      "CASE WHEN id % 100 = 0 THEN id % 7 + 1 ELSE CAST(0 AS BIGINT) END AS k",
      """concat(md5(cast(id AS string)), md5(cast(id * 31 AS string)),
         md5(cast(id * 17 AS string))) AS pad""")
    val right = (0 to 7).map(i => (i.toLong, s"dim_$i")).toDF("k", "name")
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "100KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
    )
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val joined = left.join(right, Seq("k"))
      // collect() (not count()) so THIS queryExecution runs to completion:
      // count() spawns its own execution and the inspected plan would
      // still print isFinalPlan=false
      assert(joined.collect().length === 60000)
      // the FINAL adaptive plan (only materialized after execution) must
      // mark the skewed side: SMJ prints "skew=true" once OptimizeSkewedJoin
      // split the oversized partition
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), s"skew join not applied:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("registered views drive the engine through plain spark.sql") {
    Tables.registerViews(spark, dir)
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      """SELECT r_name, count(*) AS n_nations
         FROM region JOIN nation ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""").collect().toSeq
    val viaDf = Tables.region(spark, dir)
      .join(Tables.nation(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name")).agg(count(lit(1)).as("n_nations"))
      .orderBy(col("r_name")).collect().toSeq
    assert(viaSql === viaDf)
    // the native expressions resolve inside SQL over the views too
    val scored = spark.sql(
      "SELECT doc_id, risk_score(text) AS risk FROM documents ORDER BY doc_id LIMIT 5")
    assert(scored.count() === 5)
  }
}
