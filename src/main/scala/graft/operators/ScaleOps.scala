package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Scale-posture techniques as runnable operators: skew salting and
  * partition-aware aggregation. These exist so the 100-TB strategies are
  * code with oracles, not just comments.
  */
object ScaleOps {

  /** Per-app scratch namespace for the side-effecting queries (write
    * audit, partitioned/bucketed layouts): two drivers running
    * concurrently — a bench alongside a verify, or two sessions — must
    * not race each other's `mode(overwrite)` on a shared path or global
    * table name, so every output path and table is suffixed with the
    * Spark applicationId. */
  private def scratchTag(spark: SparkSession): String =
    spark.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "_")

  private[operators] def scratchPath(spark: SparkSession, name: String): String =
    new java.io.File(sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft_${scratchTag(spark)}/$name").getPath

  /** Once-per-(app, dir) setup for the layout queries: a partitioned or
    * bucketed table is an ARTIFACT — written once, queried many times —
    * so the session pays each layout write exactly once and every later
    * call measures the query against the existing layout, which is the
    * 100-TB reality (the lake table already exists when the query runs).
    * The dir digest in the key AND in the on-disk name keeps concurrent
    * test fixtures on different datasets from colliding. */
  private val layoutCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), String]
  private def dirTag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
  private[operators] def layoutOnce(spark: SparkSession, dir: String, name: String)(
      build: String => String): String =
    layoutCache.getOrElseUpdate((scratchTag(spark), dir, name),
      build(dirTag(dir)))

  /** The event table in its lake layout (partitioned by the hot filter
    * column), shared by [[partitionedScan]] and [[dppJoin]] — identical
    * content, one write. */
  private def partitionedEvents(spark: SparkSession, dir: String): String =
    layoutOnce(spark, dir, "partitionedEvents") { dtag =>
      val out = scratchPath(spark, s"partitioned_$dtag/events")
      Tables.events(spark, dir)
        .select(col("event_id"), col("event_type"), col("value"))
        .write.partitionBy("event_type").mode("overwrite").parquet(out)
      out
    }

  /** Parquet aggregate pushdown: global COUNT/MIN/MAX answered from the
    * parquet FOOTER statistics — the scan materializes zero data pages,
    * so at 100 TB the "how big is this table" query costs one metadata
    * read per file instead of a full column scan. Requires the DSv2
    * parquet path (`useV1SourceList` without parquet) plus
    * `spark.sql.parquet.aggregatePushdown`; both confs are scoped to
    * this query — set, the aggregate materialized eagerly
    * (localCheckpoint) under them, then restored, so the other 190
    * queries keep their pinned v1 plan shapes. Pushdown rules: no
    * filters below the aggregate, no DISTINCT, group-by only on
    * partition columns (none here — a single global row), and integer
    * min/max (float stats interact with NaN ordering, so the audit
    * sticks to the key columns). `PlanSpec` pins PushedAggregation on
    * the lazy frame.
    */
  def aggPushdownStats(spark: SparkSession, dir: String): DataFrame = {
    val conf = spark.conf
    val v1Key = "spark.sql.sources.useV1SourceList"
    val aggKey = "spark.sql.parquet.aggregatePushdown"
    val (prevV1, prevAgg) = (conf.get(v1Key), conf.get(aggKey))
    conf.set(v1Key, prevV1.split(",").map(_.trim)
      .filter(s => s.nonEmpty && s != "parquet").mkString(","))
    conf.set(aggKey, "true")
    try aggPushdownFrame(spark, dir).localCheckpoint()
    finally { conf.set(v1Key, prevV1); conf.set(aggKey, prevAgg) }
  }

  /** The lazy footer-stats aggregate — separated so the plan-shape spec
    * can assert PushedAggregation before materialization. Only valid
    * under the confs [[aggPushdownStats]] scopes around it. */
  private[graft] def aggPushdownFrame(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .agg(
        expr("count(*)").as("n_rows"),
        min(col("l_orderkey")).as("min_orderkey"),
        max(col("l_orderkey")).as("max_orderkey"),
        min(col("l_linenumber")).as("min_linenumber"),
        max(col("l_linenumber")).as("max_linenumber"))

  /** Small-files compaction audit — the OPTIMIZE job of a lake table as
    * a query: a fragmented layout (32 writer tasks → 32 small files, the
    * shape a streaming ingest leaves behind) is compacted to
    * ceil(rows/target) right-sized files, and the audit row proves three
    * things at once: the file count actually dropped to the computed
    * target, no row was lost, and the content checksum (exact cent sum)
    * survived the rewrite byte-for-byte. The oracle derives the file
    * counts from row arithmetic alone — the same writer-contract trick
    * as `q_write_files_audit` — so the driver's hash check verifies the
    * COMPACTOR's splitting contract, not just the copy. Scratch paths
    * are per-applicationId; idempotent overwrite per run.
    */
  def compactionAudit(spark: SparkSession, dir: String,
      targetRows: Int = 50000, smallFiles: Int = 32): DataFrame = {
    import spark.implicits._
    val out1 = scratchPath(spark, "compact/small")
    val out2 = scratchPath(spark, "compact/compacted")
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .repartition(smallFiles)
      .write.mode("overwrite").parquet(out1)
    val small = spark.read.parquet(out1)
    val nRows = small.count()
    val nTarget = math.max(1L, (nRows + targetRows - 1) / targetRows).toInt
    small.repartition(nTarget).write.mode("overwrite").parquet(out2)
    def files(p: String): Long = new java.io.File(p)
      .listFiles().count(_.getName.endsWith(".parquet")).toLong
    val checks = Seq(out1, out2).map { p =>
      spark.read.parquet(p)
        .agg(count(lit(1)), sum(round(col("value") * 100, 0).cast("long")))
        .head()
    }
    Seq((checks(0).getLong(0), files(out1), checks(1).getLong(0),
        files(out2), checks(0).getLong(1), checks(1).getLong(1)))
      .toDF("rows_before", "files_before", "rows_after", "files_after",
        "cents_before", "cents_after")
      .select(col("rows_before"), col("files_before"), col("rows_after"),
        col("files_after"),
        (col("rows_before") === col("rows_after") &&
          col("cents_before") === col("cents_after")).cast("int")
          .as("content_preserved"))
  }

  /** Join-cardinality pre-flight: the EXACT predicted output size of a
    * fact⋈fact equi-join, computed from per-key counts WITHOUT running
    * the join — |A⋈B| = Σ_k n_A(k)·n_B(k). This is the planner-style
    * audit read before launching a join that might explode (power users
    * square), the two-sided companion of `q_join_skew`'s one-sided
    * fan-out histogram. Cost: one keyed count per side + an equi-join
    * of the two count tables (key-bounded, never fact-bounded). The
    * demo predicts views⋈purchases by user; output is the top-5
    * contributing keys with the corpus totals inlined as literals (the
    * bounded 1-row driver handoff every corpus-scalar query uses — a
    * broadcast of the totals row would plan the registry-banned
    * nested-loop join). */
  def joinCardinality(spark: SparkSession, dir: String): DataFrame = {
    val ev = BehaviorOps.userDayCube(spark, dir)
      .select(col("user_id"), col("event_type"), col("n"))
    def side(t: String, as: String) = ev.filter(col("event_type") === t)
      .groupBy(col("user_id")).agg(sum(col("n")).as(as))
    val k = side("view", "n_left").join(side("purchase", "n_right"), Seq("user_id"))
      .withColumn("pairs", col("n_left") * col("n_right"))
      .localCheckpoint()
    val t = k.agg(sum(col("pairs")), count(lit(1))).head()
    val (total, nKeys) = (t.getLong(0), t.getLong(1))
    k.select(col("user_id"), col("n_left"), col("n_right"),
        col("pairs"), lit(total).as("total_pairs"), lit(nKeys).as("n_keys"),
        round(col("pairs") / lit(total.toDouble), 6).as("share"))
      .orderBy(col("pairs").desc, col("user_id")).limit(5)
  }

  /** Two-phase salted aggregation: when one group key dominates (skew),
    * pre-aggregate on (key, salt) so the hot key spreads over `salts`
    * reducers, then combine partials per key. Result is identical to the
    * direct group-by (sums/counts are associative) — which is exactly
    * what the oracle checks.
    */
  def saltedEventStats(spark: SparkSession, dir: String, salts: Int = 8): DataFrame =
    Tables.fanOut(Tables.events(spark, dir))
      .withColumn("salt", pmod(col("event_id"), lit(salts)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("value")).as("pv"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("pn")).as("n_events"),
        round(sum(col("pv")), 2).as("total_value"),
      )
      .orderBy(col("event_type"))

  /** Z-order (Morton) layout key: interleave the low 8 bits of two
    * query dimensions — customer bucket and order month — so that
    * sorting/partitioning by the key co-locates rows that are close in
    * BOTH dimensions at once. This is the multi-dimensional clustering
    * trick behind data-skipping layouts (Delta/Iceberg OPTIMIZE
    * ZORDER): min/max file statistics on a z-sorted table prune
    * two-dimensional predicates, where a lexicographic sort prunes only
    * its leading column. The output is the layout audit — per key range
    * (zkey >> 8), the min/max span of each dimension, which stays ≤ 16
    * in BOTH dims by construction (each 256-key bucket is a 16×16 tile
    * of the grid). Pure integer bit algebra: one map-only projection
    * and a hash agg, identical arithmetic on any engine.
    */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val zkey = (0 until 8).map { k =>
      shiftright(col("x"), k).bitwiseAND(lit(1L)) * lit(1L << (2 * k)) +
        shiftright(col("y"), k).bitwiseAND(lit(1L)) * lit(1L << (2 * k + 1))
    }.reduce(_ + _)
    Tables.orders(spark, dir)
      .select(
        (col("o_custkey") % 256).cast("long").as("x"),
        ((year(col("o_orderdate")) * 12 + month(col("o_orderdate"))) % 256)
          .cast("long").as("y"))
      .withColumn("zbucket", shiftright(zkey, 8))
      .groupBy(col("zbucket"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"),
      )
      .orderBy(col("zbucket"))
  }

  /** Zone-map skip audit over the z-order layout — the payoff
    * measurement for [[zorderLayout]]: given the per-bucket min/max
    * zone maps a lake format stores in file footers, how many buckets
    * (and rows) can a range predicate skip WITHOUT reading a page.
    * Three probe ranges (two x-ranges, one y-range) fan out of each
    * layout row by a literal explode — map-side, no join of any kind —
    * and one hash aggregate scores each probe. A bucket is skippable
    * when its zone interval lies entirely outside the probe range; the
    * skip RATIO is what justifies paying the z-order write: interleaved
    * bits keep BOTH dimensions' zones tight where a single-column sort
    * leaves the other dimension's zones full-width.
    */
  def zonemapSkip(spark: SparkSession, dir: String): DataFrame = {
    val probes = array(
      struct(lit(1L).as("probe_id"), lit("x").as("dim"),
        lit(32L).as("lo"), lit(63L).as("hi")),
      struct(lit(2L).as("probe_id"), lit("x").as("dim"),
        lit(128L).as("lo"), lit(191L).as("hi")),
      struct(lit(3L).as("probe_id"), lit("y").as("dim"),
        lit(0L).as("lo"), lit(63L).as("hi")))
    zorderLayout(spark, dir)
      .select(col("*"), explode(probes).as("p"))
      .select(col("p.probe_id").as("probe_id"), col("n_orders"),
        when(col("p.dim") === "x",
            col("max_x") < col("p.lo") || col("min_x") > col("p.hi"))
          .otherwise(col("max_y") < col("p.lo") || col("min_y") > col("p.hi"))
          .as("skip"))
      .groupBy(col("probe_id"))
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(when(col("skip"), 1L).otherwise(0L)).as("n_skipped_buckets"),
        sum(when(col("skip"), col("n_orders")).otherwise(0L)).as("rows_skipped"),
        sum(col("n_orders")).as("rows_total"))
      .withColumn("skip_ratio",
        round(col("rows_skipped") / col("rows_total").cast("double"), 6))
      .orderBy(col("probe_id"))
  }

  /** Shard-assignment skew audit: hash every document into 32
    * content-addressed shards (two md5 hex digits mod 32 — the same
    * deterministic addressing as the train/val split) and report each
    * shard's document and token load against the uniform expectation.
    * This is the pre-flight check before any "repartition by hash and
    * write N files" job: docs_skew/tokens_skew near 1.0 everywhere says
    * the key hashes uniformly; a hot shard here becomes a straggler
    * task at 100 TB. Exact integer skew numerators (n·32) with one
    * final division per row; one partial+final hash aggregate on a
    * 32-value key. */
  def shardSkew(spark: SparkSession, dir: String): DataFrame = {
    val shard = (conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
      .cast("long") % 32).as("shard")
    Tables.fanOut(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .select(shard,
        size(array_remove(split(col("text"), " "), "")).cast("long").as("n"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
      .withColumn("total_docs",
        sum(col("n_docs")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("total_tokens",
        sum(col("n_tokens")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        round((col("n_docs") * 32).cast("double") / col("total_docs"), 6)
          .as("docs_skew"),
        round((col("n_tokens") * 32).cast("double") / col("total_tokens"), 6)
          .as("tokens_skew"))
      .orderBy(col("shard"))
  }

  /** Output-file hygiene audit — the writer-side discipline that decides
    * whether a 100-TB table is readable tomorrow: repartition by the
    * layout key so each source lands in exactly ONE task (hash can merge
    * sources into a task but never splits one), write `partitionBy`
    * directories with `maxRecordsPerFile`, then measure the files that
    * actually materialized per directory. Because one source = one
    * writer task, the file count per source is exactly
    * ceil(rows/maxRecordsPerFile) — which is what the oracle computes
    * from row counts alone: the hash check verifies the WRITER's
    * splitting behavior, not just a query result. Small-files problem
    * and its fix, as an oracle-checked operator. */
  def writeFilesAudit(spark: SparkSession, dir: String,
      maxPerFile: Int = 100): DataFrame = {
    val out = scratchPath(spark, "filesaudit/docs")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .repartition(col("source"))
      .write.option("maxRecordsPerFile", maxPerFile.toLong)
      .partitionBy("source").mode("overwrite").parquet(out)
    spark.read.parquet(out)
      .select(col("source"), input_file_name().as("f"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("f")).as("n_files"))
      .orderBy(col("source"))
  }

  /** Join-key fan-out audit: the distribution of fact rows per join key
    * (lineitem per orderkey), as an exact histogram with cumulative key
    * share — the pre-flight read before any fact⋈fact join. A fat tail
    * here is the reducer straggler at 100 TB and the input to the
    * salting / AQE-skew-join decision ([[saltedEventStats]] is the
    * remedy this audit triggers). One keyed count, one histogram
    * aggregate on the bounded fan-out domain, a vocabulary-sized
    * running-share window. */
  def joinSkew(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("fanout"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.fanOut(Tables.lineitem(spark, dir).select(col("l_orderkey")))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("fanout"))
      .groupBy(col("fanout"))
      .agg(count(lit(1)).as("n_keys"))
      .withColumn("cum_keys", sum(col("n_keys")).over(w))
      .withColumn("total_keys",
        sum(col("n_keys")).over(org.apache.spark.sql.expressions.Window
          .partitionBy()))
      .select(col("fanout"), col("n_keys"),
        round(col("cum_keys").cast("double") / col("total_keys"), 6)
          .as("cum_key_share"))
      .orderBy(col("fanout"))
  }

  /** Per-group volume trend: ordinary-least-squares slope of daily event
    * volume against the day index, per event type — the "is this stream
    * growing, shrinking, or flat" monitor a pipeline reads before
    * capacity and sampling decisions. The corpus reduces to one
    * (type, day) count table; `regr_*` aggregates are moment-based and
    * mergeable (partial+final, like any sum), so the regression runs as
    * one hash aggregate over day-bounded input — the grouped sibling of
    * the global Zipf/Heaps fits. */
  def volumeTrend(spark: SparkSession, dir: String): DataFrame =
    BehaviorOps.typeDaily(spark, dir)
      .select(col("event_type"), col("day"), col("n"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days"),
        round(expr("regr_slope(n, day)"), 4).as("slope_per_day"),
        round(expr("regr_r2(n, day)"), 4).as("r2"))
      .orderBy(col("event_type"))

  /** Theil–Sen robust trend: the MEDIAN of all pairwise slopes of daily
    * volume per event type, beside the OLS slope [[volumeTrend]]
    * reports — the 29%-breakdown estimator that shrugs off the outlier
    * days that drag a least-squares fit (the trend member of the robust
    * tier: IQR fences, MAD, winsorized means). The pairwise stage runs
    * on the REDUCED (type, day) count table — tens of rows per type, so
    * the keyed self-join is days²/2 per type, never corpus-bounded —
    * and the median is an exact order statistic: rank on the ROUNDED
    * slope with a (day, day) tie-break, pick the lower median by rank.
    */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    val daily = BehaviorOps.typeDaily(spark, dir)
      .select(col("event_type"), col("day"), col("n")) // shared daily census
    val a = daily.select(col("event_type"), col("day").as("a_day"), col("n").as("a_n"))
    val b = daily.select(col("event_type"), col("day").as("b_day"), col("n").as("b_n"))
    val pairs = a.join(b, Seq("event_type"))
      .filter(col("a_day") < col("b_day"))
      .withColumn("slope", round(
        (col("b_n") - col("a_n")).cast("double") / (col("b_day") - col("a_day")), 6))
    val wRank = Window.partitionBy(col("event_type"))
      .orderBy(col("slope"), col("a_day"), col("b_day"))
    val wAll = Window.partitionBy(col("event_type"))
    pairs
      .withColumn("rn", row_number().over(wRank))
      .withColumn("np", count(lit(1)).over(wAll))
      .filter(col("rn") === expr("(np + 1) DIV 2")) // exact lower median
      .select(col("event_type"), col("np").as("n_pairs"),
        col("slope").as("ts_slope"))
      .orderBy(col("event_type"))
  }

  /** Multi-lag autocorrelation table (lags 1..7) of daily volume per
    * type — the full ACF readout [[acf1]] samples at lag 1: a lag-7
    * peak is the weekly-seasonality signature read next to the seasonal
    * index. The lag dimension is a bounded explode on the reduced day
    * table (never a cross join — the ×7 fan-out then EQUI-joins the
    * shifted day), all five moments are exact integer sums per
    * (type, lag) cell, and the lag-correlation assembles row-locally
    * with a zero-variance guard.
    */
  def acfLags(spark: SparkSession, dir: String, maxLag: Int = 7): DataFrame = {
    val daily = BehaviorOps.typeDaily(spark, dir)
      .select(col("event_type"), col("day"), col("n").as("y"))
    val a = daily.select(col("event_type"), col("day"), col("y").as("ya"),
      explode(sequence(lit(1L), lit(maxLag.toLong))).as("k"))
    // fully renamed right side: both frames descend from one checkpoint,
    // and a shared column name across the self-join is ambiguous
    val b = daily.select(col("event_type").as("bet"), col("day").as("bday"),
      col("y").as("yb"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    a.join(b, col("bet") === col("event_type") && col("bday") === col("day") + col("k"))
      .groupBy(col("event_type"), col("k"))
      .agg(count(lit(1)).as("n"), sum(col("ya")).as("sx"), sum(col("yb")).as("sy"),
        sum(col("ya") * col("yb")).as("sxy"),
        sum(col("ya") * col("ya")).as("sxx"), sum(col("yb") * col("yb")).as("syy"))
      .select(col("event_type"), col("k").as("lag"), col("n"),
        round(when(vx > 0 && vy > 0,
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(vx.cast("double")) * sqrt(vy.cast("double")))), 6).as("r"))
      .orderBy(col("event_type"), col("lag"))
  }

  /** Wald–Wolfowitz runs test on daily up/down moves — "is the series a
    * random walk or does it streak": the count of sign runs against its
    * null mean/variance. All counts exact integers from two lag windows
    * over the bounded day table; the z assembles row-locally on one
    * summary row. Completes the nonparametric tier (χ² independence,
    * Mann–Kendall trend, this for serial randomness).
    */
  def runsTest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDay = Window.orderBy(col("day")) // day dimension: bounded
    val n = col("n")
    val n1 = col("n1")
    val mid = lit(2.0) * n1 * (n - n1)
    BehaviorOps.typeDaily(spark, dir)
      .groupBy(col("day")).agg(sum(col("n")).as("y"))
      .withColumn("up",
        when(col("y") > lag(col("y"), 1).over(byDay), 1L)
          .when(col("y") < lag(col("y"), 1).over(byDay), 0L))
      .filter(col("up").isNotNull)
      .withColumn("pu", lag(col("up"), 1).over(byDay))
      .agg(count(lit(1)).as("n"), sum(col("up")).as("n1"),
        sum(when(col("pu").isNull || col("up") =!= col("pu"), 1L).otherwise(0L))
          .as("runs"))
      .select(n, n1, (n - n1).as("n0"), col("runs"),
        round((col("runs") - (mid / n + 1)) /
          sqrt(mid * (mid - n) / (n * n * (n - lit(1.0)))), 6).as("z"))
  }

  /** Mann–Kendall trend test — the nonparametric significance reading
    * beside [[theilSen]]'s robust slope: S = Σ sign(y_j − y_i) over all
    * ordered day pairs per type (EXACT integers from the days²/2 keyed
    * self-join on the reduced day table — the Theil–Sen pair stage
    * re-used for ranks instead of slopes), then the continuity-corrected
    * z under the no-trend null. |z| < 1.96 everywhere on this synthetic
    * corpus — the test correctly refuses to call noise a trend.
    */
  def mannKendall(spark: SparkSession, dir: String): DataFrame = {
    val daily = BehaviorOps.typeDaily(spark, dir)
      .select(col("event_type"), col("day"), col("n").as("y"))
    val a = daily.select(col("event_type"), col("day").as("a_day"), col("y").as("a_y"))
    val b = daily.select(col("event_type"), col("day").as("b_day"), col("y").as("b_y"))
    val s = a.join(b, Seq("event_type"))
      .filter(col("a_day") < col("b_day"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("b_y") > col("a_y"), 1L)
        .when(col("b_y") < col("a_y"), -1L).otherwise(0L)).as("s"))
    val nd = daily.groupBy(col("event_type")).agg(count(lit(1)).as("nd"))
    val corrected = when(col("s") > 0, col("s") - 1)
      .when(col("s") < 0, col("s") + 1).otherwise(0L)
    s.join(nd, Seq("event_type"))
      .select(col("event_type"), col("s"), col("nd"),
        round(corrected /
          sqrt(col("nd") * (col("nd") - lit(1.0)) * (lit(2) * col("nd") + 5) / 18), 6)
          .as("z"))
      .orderBy(col("event_type"))
  }

  /** Hampel filter — the robust rolling outlier flag (|x − rollmed| >
    * 3·rollMAD over a ±3-day window) that survives level shifts a
    * global-MAD fence smears across: both the rolling median and the
    * rolling MAD are EXACT order statistics computed ROW-LOCALLY from
    * the collected 7-value window (sort_array + element_at — no
    * interpolation, no float aggregation anywhere), so every engine
    * flags identical days. Edge days with partial windows are dropped
    * rather than judged against a biased window. The window rides the
    * bounded (type, day) table.
    */
  def hampelOutliers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val midIdx = ((size(col("win")) + 1) / 2).cast("int") // Column `/` is double division
    val medCol = element_at(sort_array(col("win")), midIdx)
    BehaviorOps.typeDaily(spark, dir)
      .select(col("event_type"), col("day"), col("cents"))
      .withColumn("win", collect_list(col("cents")).over(w))
      .filter(size(col("win")) === 7)
      .withColumn("med", medCol)
      .withColumn("mad", element_at(
        sort_array(transform(col("win"), v => abs(v - col("med")))), midIdx))
      .select(col("event_type"), col("day"),
        round(col("cents") / 100.0, 2).as("spend"),
        round(col("med") / 100.0, 2).as("roll_med"),
        round(col("mad") / 100.0, 2).as("roll_mad"),
        (abs(col("cents") - col("med")) > lit(3) * col("mad")).as("outlier"))
      .orderBy(col("event_type"), col("day"))
  }

  /** OLS forecast with 95% prediction intervals — the trend family's
    * forward look: per event type, daily volume regressed on the day
    * index (all moments exact BIGINTs, slope/intercept one deterministic
    * division each), then the next three days predicted with the
    * textbook interval s·√(1 + 1/n + (x*−x̄)²/Sxx). The residual pass
    * re-reads the tiny (type, day) table against the broadcast
    * |types|-row fit — never the corpus; the forecast horizon is a
    * bounded explode.
    */
  def olsForecast(spark: SparkSession, dir: String, horizon: Int = 3): DataFrame = {
    val daily = BehaviorOps.typeDaily(spark, dir)
      .select(col("event_type"), col("day"), col("n").as("y"))
    val base = daily.groupBy(col("event_type")).agg(min(col("day")).as("d0"))
    val f = daily.join(Tables.maybeBroadcast(base), Seq("event_type"))
      .select(col("event_type"), (col("day") - col("d0")).as("x"), col("y"))
      .localCheckpoint() // feeds the moment pass AND the residual pass
    val b1e = (col("n") * col("sxy") - col("sx") * col("sy")) * lit(1.0) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    val fit = f.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("event_type"), col("n"), col("sx"), col("sxx"),
        b1e.as("b1"), ((col("sy") - b1e * col("sx")) / col("n")).as("b0"))
    val sse = f.join(Tables.maybeBroadcast(fit), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(sum(pow(col("y") - (col("b0") + col("b1") * col("x")), 2)).as("sse"))
    fit.join(sse, Seq("event_type"))
      .select(col("event_type"), col("n"), col("sx"), col("sxx"),
        col("b0"), col("b1"), col("sse"),
        explode(sequence(lit(1), lit(horizon))).as("k"))
      .select(col("event_type"), (col("n") - 1 + col("k")).as("day_index"),
        round(col("b0") + col("b1") * (col("n") - 1 + col("k")), 4).as("forecast"),
        round(lit(1.96) * sqrt(col("sse") / (col("n") - 2) *
          (lit(1.0) + lit(1.0) / col("n") +
            pow((col("n") - 1 + col("k")) - col("sx") * lit(1.0) / col("n"), 2) /
              (col("sxx") - col("sx") * col("sx") * lit(1.0) / col("n")))), 4).as("pi95"))
      .orderBy(col("event_type"), col("day_index"))
  }

  /** Session-cached daily order revenue in exact integer cents over the
    * DENSE calendar spine — the per-day rollup the forecasting family
    * (backtest, SAX motifs) reads. Calendar days with no orders are
    * explicit zero rows (a day without orders IS a zero-revenue day;
    * leaving it out would silently misalign every row-based lag — the
    * q_dense_calendar lesson applied at the frame level). At 100 TB this
    * is the map-side-combined daily table a warehouse maintains, orders
    * of magnitude smaller than the order log. */
  private[operators] def ordersDaily(spark: SparkSession, dir: String): DataFrame =
    DedupOps.cachedFrame(spark, dir, "ordersDaily") {
      val observed = Tables.orders(spark, dir)
        .select(col("o_orderdate").cast("date").as("d"),
          round(col("o_totalprice") * 100, 0).cast("long").as("c"))
        .groupBy(col("d")).agg(sum(col("c")).as("cents"))
      val spine = observed
        .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
        .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
      spine.join(observed, Seq("d"), "left_outer")
        .select(col("d"), coalesce(col("cents"), lit(0L)).as("cents"))
    }

  /** Rolling-origin forecast backtest (time-series cross-validation):
    * every day is an evaluation origin, the naive (yesterday) and
    * seasonal-naive (same weekday last week) forecasts score against
    * the realized daily revenue, and the harness reports per-model MAE.
    * The lags run over the DENSE [[ordersDaily]] spine, so lag(7) is
    * always the same weekday last week even across order-less days.
    * Revenue enters as exact per-row integer cents, errors are |long −
    * long|, and MAE is an integer floor division — bit-stable under any
    * partitioning. The two lag forecasts come from ONE ordered window
    * over the day-bounded daily table (bounded by the observation span,
    * never corpus-sized), and the model dimension is a 2-way stack()
    * unpivot, so adding models costs columns, not scans. This is the
    * evaluation loop every forecasting deployment runs; at 100 TB the
    * per-day reduction happens map-side and the backtest itself touches
    * |days| rows. */
  def forecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = ordersDaily(spark, dir)
    val w = Window.orderBy(col("d"))
    daily
      .withColumn("naive_f", lag(col("cents"), 1).over(w))
      .withColumn("snaive_f", lag(col("cents"), 7).over(w))
      .select(col("cents"),
        expr("stack(2, 'naive', naive_f, 'snaive7', snaive_f) AS (model, f)"))
      .where(col("f").isNotNull)
      .groupBy(col("model"))
      .agg(
        count(lit(1)).as("n_origins"),
        sum(abs(col("cents") - col("f"))).as("sum_abs_err_cents"))
      .withColumn("mae_cents", expr("sum_abs_err_cents div n_origins"))
      .orderBy(col("model"))
  }

  /** SAX-style time-series symbolization + motif census: each day's
    * revenue becomes one of 4 symbols by EXACT rank binning (ntile over
    * (cents, d) — the classic z-normalized PAA breakpoints replaced by
    * order statistics, which are engine- and partitioning-deterministic
    * where a float mean/std normalization is not), then sliding 3-day
    * words are counted — the motif-discovery primitive behind symbolic
    * time-series indexing (SAX). Both windows run over the day-bounded
    * [[ordersDaily]] frame (observation span, never corpus-sized); the
    * census output is at most 4³ rows. */
  def saxMotifs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val alphabet = array(lit("a"), lit("b"), lit("c"), lit("d"))
    val byVal = Window.orderBy(col("cents"), col("d"))
    val byDay = Window.orderBy(col("d"))
    ordersDaily(spark, dir)
      .withColumn("s", element_at(alphabet, ntile(4).over(byVal)))
      .withColumn("motif",
        concat(col("s"), lead(col("s"), 1).over(byDay),
          lead(col("s"), 2).over(byDay)))
      .where(col("motif").isNotNull)
      .groupBy(col("motif"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("motif"))
  }

  /** Month-over-month and year-over-year revenue growth — the two lag
    * comparisons every finance rollup reports. Revenue reduces to exact
    * integer cents per month (map-side at 100 TB), both lags come from
    * ONE ordered window over the month-bounded frame, and each growth
    * rate is a single row-local division. Months without a full-year
    * lookback are excluded so every output row carries both rates. */
  def momGrowth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("month"))
    Tables.orders(spark, dir)
      .select(date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        round(col("o_totalprice") * 100, 0).cast("long").as("c"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_orders"), sum(col("c")).as("cents"))
      .withColumn("prev_cents", lag(col("cents"), 1).over(w))
      .withColumn("yoy_cents", lag(col("cents"), 12).over(w))
      .where(col("yoy_cents").isNotNull)
      .select(col("month"), col("n_orders"), col("cents"),
        round((col("cents") - col("prev_cents")) /
          col("prev_cents").cast("double"), 6).as("mom_growth"),
        round((col("cents") - col("yoy_cents")) /
          col("yoy_cents").cast("double"), 6).as("yoy_growth"))
      .orderBy(col("month"))
  }

  /** Rolling Pearson correlation between the click and purchase daily
    * volumes over a ±7-day window — "do conversions track traffic this
    * fortnight" as a time series. All five window moments (Σx Σy Σxy
    * Σx² Σy²) are EXACT integer window sums over the day-bounded table;
    * the correlation assembles row-locally with two sqrt's and one
    * division, guarded against zero-variance windows. The day dimension
    * is provably bounded, so the single ordered window is the vocab-
    * bounded kind, not a corpus sort.
    */
  def rollingCorr(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("day")).rowsBetween(-7, 7)
    val daily = BehaviorOps.typeDaily(spark, dir)
      .groupBy(col("day"))
      .agg(
        sum(when(col("event_type") === "click", col("n")).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", col("n")).otherwise(0L)).as("y"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("syy", sum(col("y") * col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .select(col("day"), col("n").as("n_days"),
        round(when(vx > 0 && vy > 0,
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(vx.cast("double")) * sqrt(vy.cast("double")))), 6).as("r"))
      .orderBy(col("day"))
  }

  /** Classical additive decomposition of daily spend per event type:
    * value = trend + weekly seasonal + residual (the STL-lite the trend
    * family reads together — [[volumeTrend]] for slope, the seasonal
    * index for the weekday shape, this for the full per-day ledger).
    * Trend is a centered 7-day moving average (interior days only — the
    * count-guard drops the edge days rather than emitting a biased
    * partial mean); seasonal is the per-weekday mean of the detrended
    * series; residual is what's left. The corpus reduces to the (type,
    * day) cents table before ANY window; trend is an exact integer
    * window sum with one /7 division.
    */
  def seasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wMa = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val tr = BehaviorOps.typeDaily(spark, dir)
      .select(col("event_type"), col("day"), col("cents"))
      .withColumn("trend",
        when(count(lit(1)).over(wMa) === 7, sum(col("cents")).over(wMa) / 7.0))
      .filter(col("trend").isNotNull)
      .localCheckpoint() // feeds the seasonal means AND the final ledger
    // distinct column names on the seasonal side: both frames descend
    // from the same checkpoint, and a same-name self-join would leave
    // ambiguous attribute ids
    val se = tr.groupBy(col("event_type").as("et"), (col("day") % 7).as("wd"))
      .agg(avg(col("cents") - col("trend")).as("seas_raw"))
    tr.join(Tables.maybeBroadcast(se),
        col("event_type") === col("et") && col("day") % 7 === col("wd"))
      .select(col("event_type"), col("day"), col("cents"),
        round(col("trend") / 100, 4).as("trend"),
        round(col("seas_raw") / 100, 4).as("seasonal"),
        round((col("cents") - col("trend") - col("seas_raw")) / 100, 4).as("residual"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Closed-form multiple regression of daily spend on (day index,
    * weekend flag) — the two-covariate step up from [[volumeTrend]]'s
    * single-feature `regr_slope`, solved by Cramer's rule on the 3×3
    * normal equations with EVERY moment an exact BIGINT: the day index
    * is 0-based (centering keeps Σd² small), the weekend flag is 0/1
    * (day%7 arithmetic — no calendar functions, so both engines agree
    * bit-for-bit), and spend is integer cents, so all nine X'X / X'y
    * sums and the four 3×3 determinants are exact int64 (≪ 2^53 even at
    * 100× — they grow with Σy, not the corpus row count). One hash
    * aggregate over the day-bounded table, scalar algebra on one row,
    * one terminal division per coefficient. "Training as a dataflow",
    * linear-model edition: the full fit is a mergeable aggregate.
    */
  def olsDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = BehaviorOps.typeDaily(spark, dir)
      .groupBy(col("day"))
      .agg(sum(col("cents")).as("y"))
    val minDay = daily.agg(min(col("day"))).head().getLong(0) // bounded scalar
    daily
      .select(
        (col("day") - minDay).as("d"),
        when(col("day") % 7 === 2 || col("day") % 7 === 3, 1L).otherwise(0L).as("w"),
        col("y"))
      .agg(
        count(lit(1)).as("n"), sum(col("d")).as("sd"), sum(col("w")).as("sw"),
        sum(col("d") * col("d")).as("sdd"), sum(col("d") * col("w")).as("sdw"),
        sum(col("w") * col("w")).as("sww"), sum(col("y")).as("sy"),
        sum(col("d") * col("y")).as("sdy"), sum(col("w") * col("y")).as("swy"))
      .select(
        col("n"),
        (col("n") * (col("sdd") * col("sww") - col("sdw") * col("sdw"))
          - col("sd") * (col("sd") * col("sww") - col("sdw") * col("sw"))
          + col("sw") * (col("sd") * col("sdw") - col("sdd") * col("sw"))).as("dm"),
        (col("sy") * (col("sdd") * col("sww") - col("sdw") * col("sdw"))
          - col("sd") * (col("sdy") * col("sww") - col("sdw") * col("swy"))
          + col("sw") * (col("sdy") * col("sdw") - col("sdd") * col("swy"))).as("d0"),
        (col("n") * (col("sdy") * col("sww") - col("sdw") * col("swy"))
          - col("sy") * (col("sd") * col("sww") - col("sdw") * col("sw"))
          + col("sw") * (col("sd") * col("swy") - col("sdy") * col("sw"))).as("d1"),
        (col("n") * (col("sdd") * col("swy") - col("sdy") * col("sdw"))
          - col("sd") * (col("sd") * col("swy") - col("sdy") * col("sw"))
          + col("sy") * (col("sd") * col("sdw") - col("sdd") * col("sw"))).as("d2"))
      .select(
        col("n").as("n_days"),
        round(col("d0").cast("double") / col("dm") / 100, 4).as("b_intercept"),
        round(col("d1").cast("double") / col("dm") / 100, 4).as("b_day"),
        round(col("d2").cast("double") / col("dm") / 100, 4).as("b_weekend"))
  }

  /** Changepoint detection over daily volume, per event type — the
    * first binary-segmentation step (the core of every "when did the
    * stream shift" monitor, and the discrete cousin of CUSUM): among
    * all prefix/suffix splits of the day series, report the one
    * maximizing |mean(before) − mean(after)|. Complements
    * [[volumeTrend]]: a regression slope smears an abrupt level shift
    * across the whole range; the split point localizes it. Same
    * aggregate-then-window scale shape — the corpus reduces to a
    * (type, day) count table before any window, prefix sums give every
    * candidate split in one pass, and the argmax ranks on the ROUNDED
    * gap with the earliest-day tie-break so engines agree exactly.
    */
  def changepoint(spark: SparkSession, dir: String): DataFrame = {
    val wIdx = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wCum = wIdx.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    val meanL = col("p").cast("double") / col("i")
    val meanR = (col("t") - col("p")).cast("double") / (col("nd") - col("i"))
    val scored = BehaviorOps.typeDaily(spark, dir)
      .select(col("event_type"), col("day"), col("n"))
      .withColumn("i", row_number().over(wIdx))
      .withColumn("p", sum(col("n")).over(wCum))
      .withColumn("t", sum(col("n")).over(wAll))
      .withColumn("nd", count(lit(1)).over(wAll))
      .filter(col("i") < col("nd")) // both segments nonempty
      .withColumn("gap", round(abs(meanL - meanR), 6))
    val wBest = Window.partitionBy(col("event_type"))
      .orderBy(col("gap").desc, col("day"))
    scored
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("nd").as("n_days"), col("day").as("split_day"),
        round(meanL, 6).as("mean_before"), round(meanR, 6).as("mean_after"),
        round(meanR - meanL, 6).as("level_shift"))
      .orderBy(col("event_type"))
  }

  /** Consistent cross-table sampling: draw the SAME ~5% of users from
    * two independent fact tables by content-addressing the shared key
    * (md5 mod 100 < 5) — the debugging/dev-corpus pattern where a
    * random sample per table would destroy referential integrity, but a
    * hash-of-key sample keeps every sampled user's COMPLETE event and
    * order history joinable. Map-side filter on both scans (no
    * coordination, no broadcast of a sampled-ID list), then a keyed
    * join that only ever sees the sample. The oracle applies the same
    * hash arithmetic in DuckDB. */
  def consistentSample(spark: SparkSession, dir: String): DataFrame = {
    def keep(c: org.apache.spark.sql.Column) =
      (conv(substring(md5(c.cast("string")), 1, 4), 16, 10).cast("long") % 100) < 5
    val ev = BehaviorOps.userDayCube(spark, dir)
      .filter(keep(col("user_id")))
      .groupBy(col("user_id")).agg(sum(col("n")).as("n_events"))
    val ord = Tables.customer(spark, dir)
      .filter(keep(col("c_custkey")))
      .select(col("c_custkey").as("user_id"), col("c_acctbal"))
    ev.join(ord, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        round(coalesce(col("c_acctbal"), lit(0.0)), 2).as("acctbal"))
      .orderBy(col("user_id"))
  }

  /** Sketch reaggregation — the incremental-distinct pattern plain
    * counts cannot express: build an HLL sketch per (event_type, hour)
    * (Spark's DataSketches `hll_sketch_agg`), then UNION the hourly
    * sketches up to days and estimate. Register-max union is
    * order-insensitive, so union-of-hourly is bit-identical to a direct
    * daily sketch (spec-pinned) — yesterday's hourly sketches never get
    * rebuilt, which is how a 100-TB pipeline serves "distinct users per
    * day/week/month" from one stored sketch column. The exact distinct
    * rides along for the observable error. Declared oracle-free (no
    * DuckDB HLL twin); the spec bounds the relative error and pins
    * reagg-consistency. */
  def hllUnion(spark: SparkSession, dir: String): DataFrame = {
    val e = BehaviorOps.eventSeq(spark, dir)
      .select(col("event_type"),
        expr("ts_us div 3600000000").as("hour"), col("user_id"))
    val hourly = e.groupBy(col("event_type"), col("hour"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    hourly
      .groupBy(col("event_type"), (col("hour") - (col("hour") % 24) as "day_h"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_distinct"))
      .select(col("event_type"), (col("day_h") / 24).cast("long").as("day"),
        col("est_distinct"))
      .join(
        e.groupBy(col("event_type"), expr("hour div 24").as("day"))
          .agg(countDistinct(col("user_id")).as("exact_distinct")),
        Seq("event_type", "day"))
      .withColumn("rel_err", round(
        abs(col("est_distinct") - col("exact_distinct")) /
          col("exact_distinct"), 6))
      .orderBy(col("event_type"), col("day"))
  }

  /** Oracle-facing audit of [[hllUnion]]: the exact distinct count (the
    * DuckDB-computable half) plus the REALIZED error bound as a boolean
    * — the estimate itself has no SQL twin, but "the union-of-hourly
    * estimate landed within 5% of exact" is a deterministic fact of the
    * (seeded, order-insensitive) sketch over fixed data, so the driver
    * can hash-compare rows+schema instead of recording a bare
    * `no_oracle`. The raw estimates stay available via [[hllUnion]]
    * (spec-pinned reagg-consistency + error bound).
    */
  def hllUnionAudit(spark: SparkSession, dir: String): DataFrame =
    hllUnion(spark, dir)
      .select(col("event_type"), col("day"), col("exact_distinct"),
        (col("rel_err") < 0.05).as("hll_ok"))
      .orderBy(col("event_type"), col("day"))

  /** Incremental reaggregation: fold raw events into DAILY partial
    * aggregates (sum, count), then roll the partials up to weeks —
    * sum-of-sums and sum-of-counts, with the average derived from the
    * merged partials. This is the mergeable-aggregate discipline behind
    * every incremental 100-TB ETL: yesterday's partials never get
    * recomputed, and the weekly answer from partials must equal the
    * weekly answer from raw — which is exactly what the oracle (raw
    * aggregation in DuckDB) checks. */
  def reaggRollup(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.fanOut(Tables.events(spark, dir)
        .select(col("event_type"),
          expr("(ts div 1000) div 86400000000").as("day"), col("value")))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("value")).as("pv"), count(lit(1)).as("pn"))
    daily
      .groupBy(col("event_type"), (col("day") - (col("day") % 7)).as("week_start"))
      .agg(
        sum(col("pn")).as("n_events"),
        round(sum(col("pv")), 2).as("total_value"),
        round(sum(col("pv")) / sum(col("pn")), 6).as("avg_value"))
      .orderBy(col("event_type"), col("week_start"))
  }

  /** Bucketed co-located join: write both join sides bucketed AND
    * sorted on the join key (8 buckets, parquet, external tables under
    * java.io.tmpdir), then join the bucketed reads. Because both scans
    * report the same hash-partitioning on the key, the sort-merge join
    * needs NO shuffle — the plan's only exchange is the tiny final
    * group-by. This is the shuffle-elimination discipline for the 100-TB
    * fact⋈fact case where neither side broadcasts: pay the partitioned
    * write once, join for free forever after. The `merge` hint keeps
    * Catalyst from demoting the demo to a broadcast join at toy scale;
    * the oracle checks the result equals the plain join. Bucket count 8
    * stands in for the production number (chosen so bucket ≈ task ≈
    * 128 MB at real scale); the layout is written once per (app, dir)
    * via [[layoutOnce]] and every later call joins the existing tables.
    */
  /** Partition-pruned scan: write the fact partitioned by its hot
    * filter column (`partitionBy` — one directory per value, the
    * standard lake layout), then read back with an IN filter. The scan
    * plans PartitionFilters and touches ONLY the matching directories —
    * at 100 TB the difference between reading 2/5 of the data and all
    * of it before the first filter runs. Complements [[bucketedJoin]]:
    * bucketing co-locates joins, partitioning prunes scans; a real
    * table does both. The layout is written once per (app, dir) and
    * shared with [[dppJoin]]; the oracle is the plain filtered
    * aggregate.
    */
  def partitionedScan(spark: SparkSession, dir: String): DataFrame = {
    val out = partitionedEvents(spark, dir)
    spark.read.parquet(out)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("event_type"))
  }

  /** Dynamic partition pruning: join the partitioned fact against a
    * FILTERED dimension — Catalyst turns the dim's filter result into a
    * runtime partition filter on the fact scan (the broadcast is reused
    * as the pruning subquery), so only the dimension-selected
    * directories are ever read even though the fact itself carries no
    * literal predicate. The star-schema companion of the static IN
    * pruning in [[partitionedScan]]: there the query names the
    * partitions, here the dim join discovers them at runtime. The
    * weighted aggregate makes the pruning observable in the result.
    */
  def dppJoin(spark: SparkSession, dir: String): DataFrame = {
    val eventsPath = partitionedEvents(spark, dir)
    // the dim must be a SCAN with a pushable predicate (a constant-
    // folded local relation carries no selective filter, so the DPP
    // rule would skip it); integer weights keep the weighted sum on
    // 2-dp decimals, never at a round-half boundary
    val weightsPath = layoutOnce(spark, dir, "eventWeights") { dtag =>
      import spark.implicits._
      val out = scratchPath(spark, s"partitioned_$dtag/weights")
      Seq(("view", 1L), ("click", 3L), ("purchase", 10L), ("signup", 5L),
          ("error", 0L))
        .toDF("event_type", "weight")
        .write.mode("overwrite").parquet(out)
      out
    }
    val weights = spark.read.parquet(weightsPath)
      .filter(col("weight") >= lit(3L))
    spark.read.parquet(eventsPath)
      .join(broadcast(weights), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value") * col("weight")), 2).as("weighted_value"))
      .orderBy(col("event_type"))
  }

  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val tables = layoutOnce(spark, dir, "bucketedOrdersLineitem") { dtag =>
      val wh = scratchPath(spark, s"bucketed_$dtag")
      val ordersTable = s"graft_orders_b_${dtag}_${scratchTag(spark)}"
      val lineitemTable = s"graft_lineitem_b_${dtag}_${scratchTag(spark)}"
      spark.sql(s"DROP TABLE IF EXISTS $ordersTable")
      spark.sql(s"DROP TABLE IF EXISTS $lineitemTable")
      Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .write.format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders_b").mode("overwrite")
        .saveAsTable(ordersTable)
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .write.format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem_b").mode("overwrite")
        .saveAsTable(lineitemTable)
      s"$ordersTable,$lineitemTable"
    }
    val Array(ordersTable, lineitemTable) = tables.split(',')
    spark.table(ordersTable).hint("merge")
      .join(spark.table(lineitemTable),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** Time travel over the snapshot-isolated versioned table
    * ([[graft.sources.VersionedTable]] — the commit-log lake pattern):
    * build the corpus store in two commits (v0 = the deterministic
    * md5-addressed train subset via `overwrite`, v1 = `append` of the
    * remainder, the nightly-ingest shape), then read BOTH versions back
    * through the log fold and aggregate per source. The oracle
    * recomputes each snapshot from the raw table and the same md5
    * predicate, so the hash check proves the commit log reconstructs
    * exactly the states that were committed — the reproducibility
    * contract ("training run X read version N") that an in-place
    * overwrite store cannot make. The table is an artifact: built once
    * per (app, dir) via [[layoutOnce]], read-only afterwards.
    */
  private def versionedDocs(spark: SparkSession, dir: String): String =
    layoutOnce(spark, dir, "versionedDocs") { dtag =>
      val path = scratchPath(spark, s"versioned_$dtag/docs")
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val h = substring(md5(col("doc_id").cast("string")), 1, 1)
      // interval 4 puts a log checkpoint at v4, so the head faces
      // (q_lake_upsert) fold checkpoint + tail under the driver gate
      // while the time-travel faces (v0..v2) fold the pre-checkpoint log
      val t = new graft.sources.VersionedTable(path, checkpointInterval = 4)
      // every commit harvests doc_id zone maps; the re-freeze clusters
      // by doc_id (repartitionByRange) so its intervals are DISJOINT —
      // the cluster-by discipline that makes a lake table's skipping
      // index selective instead of decorative
      t.overwrite(spark, docs.filter(h <= "b"),
        statsCol = Some("doc_id"))                       // v0: train subset
      t.append(spark, docs.filter(h > "b"),
        statsCol = Some("doc_id"))                       // v1: nightly ingest
      t.overwrite(spark,
        docs.filter(col("n_chars") >= 300)
          .repartitionByRange(4, col("doc_id")),
        statsCol = Some("doc_id"))                       // v2: quality re-freeze
      // v3: targeted erasure — zone maps implicate only the files whose
      // doc_id interval intersects, the rest carry by reference
      t.deleteWhere(spark, "doc_id", 100L, 199L)
      // v4: nightly upsert — re-scored low-id docs replace their
      // snapshot rows, never-admitted ones insert (also the checkpoint
      // commit under interval 4)
      t.merge(spark,
        docs.filter(col("doc_id") < 50)
          .withColumn("n_chars", col("n_chars") + 10000),
        "doc_id")
      // v5: string-keyed governance delete — two sources leave the
      // corpus via the IN-set copy-on-write path
      t.deleteWhereIn(spark, "source", Seq("src4", "src17"))
      // v6 (head): merge-on-read needle delete — a sparse predicate's
      // rows (~1 per 101 keys) leave by deletion vector (executor-written
      // sidecar bitmaps since r13), zero files rewritten
      t.deleteRowsWhere(spark, "doc_id % 101 = 5")
      // checkpoints are async (off the commit path) — flush them so the
      // artifact is deterministic and the driver gate provably folds
      // checkpoint + tail
      t.awaitCheckpoints()
      path
    }

  def timeTravel(spark: SparkSession, dir: String): DataFrame = {
    val root = versionedDocs(spark, dir)
    val t = new graft.sources.VersionedTable(root)
    Seq(0L, 1L).map { v =>
      t.readAsOf(spark, v)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .select(lit(v).as("version"), col("source"),
          col("n_docs"), col("total_chars"))
    }.reduce(_ unionAll _)
      .orderBy(col("version"), col("source"))
  }

  /** Change feed over the same versioned table ([[timeTravel]]'s
    * artifact): the incremental-consumer read that replaces a full
    * snapshot diff. The window (0, 2] spans the nightly append (v1) and
    * the quality re-freeze overwrite (v2), so the feed exercises the
    * full commit algebra: v1's files are added AND removed inside the
    * window and cancel to nothing, v0's files surface as `delete` rows,
    * v2's as `insert` rows — exactly the net state transition a
    * downstream index/dedup/cache consumer must apply. The oracle
    * recomputes both sides from the raw table and the same membership
    * predicates, proving the log fold's net-change set is exact. Feed
    * rows aggregate per (change_type, source) before leaving the scan —
    * at 100 TB the consumer reads only the files named by the log
    * window, never the table.
    */
  /** Registry face of the DSv2 BATCH path ([[graft.sources.VersionedStreamProvider]]):
    * the quality re-freeze snapshot read back `versionAsOf=2` through the
    * provider with a doc_id range predicate — the comparison is PUSHED to
    * the scan builder, zone maps drop files whose recorded interval
    * cannot intersect (the v2 files are range-clustered, so the skip is
    * selective), projection is pruned to the four referenced columns at
    * the parquet-chunk level, and the hash gate then proves the custom
    * record decode returns exactly the committed state. At 100 TB this
    * is the point-lookup/small-range shape a lake serves from metadata:
    * files opened scale with the predicate's span, not the table.
    */
  def versionedScan(spark: SparkSession, dir: String): DataFrame = {
    val root = versionedDocs(spark, dir)
    spark.read.format("graft.sources.VersionedStreamProvider")
      .option("path", root).option("versionAsOf", "2").load()
      .filter(col("doc_id") < 250)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("source"))
  }

  /** The lake's write-path semantics under the hash gate: the HEAD of
    * the versioned-docs table after the full commit chain — overwrite,
    * append, re-freeze, zone-map-pruned row DELETE, keyed MERGE upsert,
    * string-IN copy-on-write delete (v5), and a merge-on-read needle
    * delete served through deletion vectors (v6) — aggregated per
    * source, folded from the v4 log CHECKPOINT plus the two-commit tail.
    * The oracle rebuilds the same end state from the raw table with
    * plain relational algebra (kept ∪ updated, minus the two dropped
    * sources, minus the DV predicate), so a matching hash proves every
    * delete flavor removed exactly its predicate rows (and nothing
    * else), merge replaced matched keys while inserting unmatched ones,
    * and the checkpointed fold reconstructs the identical state the
    * full-log fold would.
    */
  def lakeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val root = versionedDocs(spark, dir)
    new graft.sources.VersionedTable(root).read(spark)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("source"))
  }

  /** Documents in a lang-clustered lake layout with STRING zone maps:
    * one range-repartition on `lang` groups each language's rows into
    * few files, and the append records per-file truncated byte bounds
    * on the lang column in the commit log. Built once per (app, dir);
    * read-only afterwards. */
  private[graft] def langClusteredDocs(spark: SparkSession, dir: String): String =
    layoutOnce(spark, dir, "langClusteredDocs") { dtag =>
      val path = scratchPath(spark, s"strzone_$dtag/docs")
      val t = new graft.sources.VersionedTable(path)
      t.append(spark,
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
          .repartitionByRange(5, col("lang")),
        statsCol = Some("lang"))
      path
    }

  /** String zone maps under the hash gate: a `lang = 'en'` probe served
    * by [[graft.sources.VersionedTable.readWhereIn]] — files whose
    * recorded (truncated-bound) byte interval on `lang` cannot contain
    * 'en' are never opened; the residual filter keeps the read exact,
    * and the census per source must hash-match the oracle's census of
    * the raw table under the same predicate. This is the skipping shape
    * a 100-TB corpus table actually needs (its hot predicates are
    * source/lang strings, not integer keys): with the layout clustered
    * on the predicate column, files opened scale with the language's
    * share of the corpus, not the table. The skip RATIO is pinned
    * structurally in LakeScaleSpec; this face pins exactness. */
  def stringZonemap(spark: SparkSession, dir: String): DataFrame = {
    val root = langClusteredDocs(spark, dir)
    val t = new graft.sources.VersionedTable(root)
    t.readWhereIn(spark, t.version, "lang", Seq("en"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("source"))
  }

  /** String RANGE skipping under the hash gate: a
    * `lang BETWEEN 'de' AND 'es'` probe served by
    * [[graft.sources.VersionedTable.readWhereBetween]] — files whose
    * recorded truncated byte interval cannot OVERLAP the range are
    * never opened (unsigned-lexicographic, the parquet BINARY stats
    * order; the lang-clustered layout makes the skip selective), and
    * the census per lang must hash-match the oracle's census of the
    * raw table under the same predicate. This is the range shape the
    * equality/IN faces could not express — prefix scans and
    * dictionary-interval drops ("retire sources k1..k2") on a corpus
    * table's string keys. Skip ratio is pinned structurally in
    * LakeScaleSpec; this face pins exactness. */
  def stringRange(spark: SparkSession, dir: String): DataFrame = {
    val root = langClusteredDocs(spark, dir)
    val t = new graft.sources.VersionedTable(root)
    t.readWhereBetween(spark, t.version, "lang", "de", "es")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang"))
  }

  /** Documents in a NULL-SKEWED lake layout: a derived nullable column
    * (`en_chars` = n_chars for English docs, NULL otherwise) range-
    * clustered so the NULLs gather into their own files (range
    * partitioning orders NULLS FIRST), and the append records per-file
    * ROW and NULL counts on the column alongside its value bounds.
    * That produces the three file shapes the null stats must tell
    * apart: ALL-NULL (no bounds exist at all — the pre-r14 blind spot
    * where a file was unskippable by ANY predicate), mixed, and
    * null-free. Built once per (app, dir); read-only afterwards. */
  private[graft] def nullSkewedDocs(spark: SparkSession, dir: String): String =
    layoutOnce(spark, dir, "nullSkewedDocs") { dtag =>
      val path = scratchPath(spark, s"nullzone_$dtag/docs")
      val t = new graft.sources.VersionedTable(path)
      t.append(spark,
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("source"), col("n_chars"),
            when(col("lang") === "en", col("n_chars")).as("en_chars"))
          .repartitionByRange(6, col("en_chars")),
        statsCol = Some("en_chars"))
      t.awaitCheckpoints() // deterministic artifact (checkpoints are async)
      path
    }

  /** NULL-count skipping under the hash gate: an IS NULL census and an
    * IS NOT NULL census over [[nullSkewedDocs]], both served by
    * [[graft.sources.VersionedTable.readWhereNull]] — the IS NULL
    * probe never opens the null-free files, the IS NOT NULL probe
    * never opens the all-null ones. The oracle recomputes both
    * censuses from the raw table (`en_chars` IS NULL ⇔ lang ≠ 'en'),
    * so a matching hash proves null pruning is sound FILE SKIPPING
    * (the residual filter keeps rows exact), not a predicate rewrite.
    * This closes the last predicate family the zone maps couldn't
    * serve: at 100 TB a completeness scan ("which docs still lack an
    * embedding?") opens only the files that can answer it. Skip
    * ratios and the all-null value-probe fix are spec-pinned in
    * LakeScaleSpec. */
  def nullPartition(spark: SparkSession, dir: String): DataFrame = {
    val root = nullSkewedDocs(spark, dir)
    val t = new graft.sources.VersionedTable(root)
    val v = t.version
    Seq(true, false).map { isNull =>
      t.readWhereNull(spark, v, "en_chars", isNull)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .select(lit(if (isNull) "isnull" else "notnull").as("probe"),
          col("source"), col("n_docs"), col("total_chars"))
    }.reduce(_ unionAll _)
      .orderBy(col("probe"), col("source"))
  }

  /** The streaming-change-feed artifact: a two-commit table — clustered
    * ingest, then a merge-on-read delete of `doc_id % 10 = 3` — drained
    * ONCE through the DSv2 source under `changeFeed=true` with
    * Trigger.AvailableNow into a parquet result. The drain is the
    * log-tailing-consumer shape: the ingest window streams as `insert`
    * rows, the delete window streams the vector's GROWN positions as
    * `delete` rows (diffed task-side from the sidecar references — no
    * side batch query, no positions on the driver). Built once per
    * (app, dir); the face reads the materialized drain. */
  private[graft] def streamedChanges(spark: SparkSession, dir: String): String =
    layoutOnce(spark, dir, "streamedChanges") { dtag =>
      val path = scratchPath(spark, s"cdcstream_$dtag/docs")
      val t = new graft.sources.VersionedTable(path)
      t.append(spark,
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .repartitionByRange(4, col("doc_id")),
        statsCol = Some("doc_id"))                  // v0: ingest
      t.deleteRowsWhere(spark, "doc_id % 10 = 3")   // v1: MoR delete
      t.awaitCheckpoints() // deterministic artifact (checkpoints are async)
      val out = scratchPath(spark, s"cdcstream_$dtag/drain")
      val q = spark.readStream.format("graft.sources.VersionedStreamProvider")
        .option("path", path).option("changeFeed", "true").load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", scratchPath(spark, s"cdcstream_$dtag/ck"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      out
    }

  /** Streaming CDC under the hash gate: the census of the
    * [[streamedChanges]] drain per (change type, source) must
    * hash-match the oracle's recomputation from the raw table — every
    * ingested row surfaced exactly once as `insert`, every
    * merge-on-read-deleted row exactly once as `delete`, nothing else.
    * This is the opt-in streaming twin of `q_change_feed`: GDPR
    * deletes reach log-tailing consumers through the SAME micro-batch
    * source that serves appends, without a side batch query. */
  def streamChanges(spark: SparkSession, dir: String): DataFrame = {
    val out = streamedChanges(spark, dir)
    spark.read.parquet(out)
      .groupBy(col("_change_type").as("change_type"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("change_type"), col("source"))
  }

  /** Orders with a merge-on-read needle delete applied: one
    * range-clustered ingest (v0, 8 files with doc-key zone maps), then
    * [[graft.sources.VersionedTable.deleteRowsWhere]] removes a sparse
    * predicate's rows (~1 per 1000) by committing DELETION VECTORS —
    * positions, not rewrites; the copy-on-write alternative would have
    * rewritten every file for a handful of rows each. Built once per
    * (app, dir); read-only afterwards. */
  private[graft] def morOrders(spark: SparkSession, dir: String): String =
    layoutOnce(spark, dir, "morOrders") { dtag =>
      val path = scratchPath(spark, s"mor_$dtag/orders")
      val t = new graft.sources.VersionedTable(path)
      t.append(spark,
        Tables.orders(spark, dir).select(
          col("o_orderkey"),
          col("o_orderpriority").as("pri"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
          .repartitionByRange(8, col("o_orderkey")),
        statsCol = Some("o_orderkey"))
      t.deleteRowsWhere(spark, "o_orderkey % 1000 = 7")
      path
    }

  /** Merge-on-read DELETE under the hash gate: the head census of
    * [[morOrders]] per priority. The oracle recomputes from the raw
    * table minus the same predicate, so a matching hash proves the
    * deletion vectors subtract EXACTLY the matched rows at read time —
    * across every file, through the broadcast positional anti-join —
    * while the spec layer pins the zero-rewrite property (no data file
    * changed under the delete commit). */
  def morDelete(spark: SparkSession, dir: String): DataFrame = {
    val root = morOrders(spark, dir)
    new graft.sources.VersionedTable(root).read(spark)
      .groupBy(col("pri"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("total_cents"),
        min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"))
      .orderBy(col("pri"))
  }

  /** Orders in a z-ordered lake layout: one arbitrary-layout ingest
    * commit (v0, no stats — the "as landed" state), then the OPTIMIZE
    * ZORDER maintenance job ([[graft.sources.VersionedTable.compactZOrder]])
    * rewrites the snapshot clustered on the Morton interleave of
    * (customer bucket, order month) and records BOTH columns' per-file
    * min/max in the commit log. Built once per (app, dir); the table is
    * an artifact, read-only afterwards. */
  private[graft] def zorderedOrders(spark: SparkSession, dir: String): String =
    layoutOnce(spark, dir, "zorderedOrders") { dtag =>
      val path = scratchPath(spark, s"zorder_$dtag/orders")
      val base = Tables.orders(spark, dir).select(
        (col("o_custkey") % 100).as("ck"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("mo"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      val t = new graft.sources.VersionedTable(path)
      t.append(spark, base.repartition(8))                   // v0: raw ingest
      t.compactZOrder(spark, "ck", "mo", targetFiles = 16)   // v1: OPTIMIZE
      path
    }

  /** OPTIMIZE ZORDER under the hash gate: the registry face of
    * [[zorderedOrders]]. Three censuses over the z-ordered head — the
    * full snapshot plus one zone-map-pruned range probe PER clustered
    * dimension ([[graft.sources.VersionedTable.readWhere]] opens only
    * files whose recorded (ck | mo) interval can intersect; the residual
    * filter keeps the read exact). The oracle recomputes all three from
    * the raw table with the same predicates, so a matching hash proves
    * the Morton rewrite is a logical no-op AND both dimensions' pruned
    * reads return exactly the predicate rows — the lossless+skippable
    * contract OPTIMIZE ZORDER sells. Everything is integer (cents,
    * counts): exact-tier. At 100 TB the probes open O(selectivity)
    * files on EITHER dimension, where a linear clustering serves only
    * its sort key; `q_cluster_compare` measures that trade, this query
    * pins its write-side correctness. */
  def zorderCompact(spark: SparkSession, dir: String): DataFrame = {
    val root = zorderedOrders(spark, dir)
    val t = new graft.sources.VersionedTable(root)
    val v = t.version
    def census(tag: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("total_cents"))
        .select(lit(tag).as("probe"), col("n_orders"), col("total_cents"))
    census("all", t.read(spark))
      .unionAll(census("ck", t.readWhere(spark, v, "ck", 10L, 19L)))
      .unionAll(census("mo", t.readWhere(spark, v, "mo", 23953L, 23964L)))
      .orderBy(col("probe"))
  }

  /** Orders through a corrupt-then-rollback commit chain: a good freeze
    * (v0), a BAD re-freeze that drops rows and shifts every amount (v1 —
    * the fat-fingered overwrite every lake eventually suffers), then
    * [[graft.sources.VersionedTable.restore]] back to v0 (v2). Built
    * once per (app, dir); read-only afterwards. */
  private[graft] def restoredOrders(spark: SparkSession, dir: String): String =
    layoutOnce(spark, dir, "restoredOrders") { dtag =>
      val path = scratchPath(spark, s"restored_$dtag/orders")
      val base = Tables.orders(spark, dir).select(
        col("o_orderpriority").as("pri"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      val t = new graft.sources.VersionedTable(path)
      t.append(spark, base)                                // v0: good freeze
      t.overwrite(spark, base                              // v1: bad freeze
        .filter(substring(col("pri"), 1, 1) <= "3")        // priorities 1-3
        .withColumn("cents", col("cents") + 7L))
      t.restore(spark, 0L)                                 // v2: rollback
      path
    }

  /** RESTORE under the hash gate: the registry face of
    * [[graft.sources.VersionedTable.restore]] and the last lake
    * operation to get one (compact → `q_compaction_audit`, zorder →
    * `q_zorder_compact`, delete+merge → `q_lake_upsert`, time travel →
    * `q_time_travel`). The head census after good → corrupted → restore
    * must hash-match the oracle's census of the RAW table — every
    * corrupt row gone, every original row back exactly once, through
    * nothing but the metadata commit that re-references v0's files. */
  def lakeRestore(spark: SparkSession, dir: String): DataFrame = {
    val root = restoredOrders(spark, dir)
    new graft.sources.VersionedTable(root).read(spark)
      .groupBy(col("pri"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("total_cents"))
      .orderBy(col("pri"))
  }

  def changeFeed(spark: SparkSession, dir: String): DataFrame = {
    val root = versionedDocs(spark, dir)
    val t = new graft.sources.VersionedTable(root)
    t.changesBetween(spark, 0L, 2L)
      .groupBy(col("_change_type").as("change_type"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("change_type"), col("source"))
  }

  /** Dense-calendar gap fill with day-over-day change: sparse daily
    * counts joined onto the FULL calendar spine (sequence over each
    * type's observed [min, max] day range, exploded) so missing days
    * materialize as explicit zeros — the repair every time-series
    * consumer (trend fits, changepoints, dashboards) silently assumes;
    * a lag window over the dense series then yields day-over-day deltas
    * that are correct ACROSS gaps (on the sparse table, lag() compares
    * to the previous OBSERVED day and hides the outage the zero row
    * exposes). The spine is types × days rows built from a 2-row-per-
    * type aggregate — never event-scale; the join back is keyed on
    * (type, day).
    */
  def denseCalendar(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = BehaviorOps.typeDaily(spark, dir)
      .select(col("event_type"), col("day"), col("n"))
    val spine = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"))).as("day"))
    val byDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    spine.join(daily, Seq("event_type", "day"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("prev_n", lag(col("n"), 1).over(byDay))
      .select(col("event_type"), col("day"), col("n"),
        (col("n") - col("prev_n")).as("dod_delta"),
        round(when(col("prev_n") > 0,
          (col("n") - col("prev_n")) / col("prev_n").cast("double")), 4)
          .as("dod_pct"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Linear interpolation over calendar gaps — the fill step between
    * [[denseCalendar]]'s explicit zeros and a forecasting consumer that
    * wants a continuous series: a sparse per-type daily spend series
    * (every 3rd day stands in for a checkpointed metric) is stretched
    * over the full day spine, missing days get the straight line between
    * their surrounding observations (carry-forward / carry-back at the
    * edges). The bracketing observation for every spine day comes from
    * two keyed running windows (`last ignoreNulls` forward, `first
    * ignoreNulls` backward) — one shuffle on event_type, no self-join,
    * no per-gap subquery; the interpolation itself is exact integer
    * cents arithmetic with ONE terminal division.
    */
  def interpolateGaps(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = BehaviorOps.typeDaily(spark, dir)
      .select(col("event_type"), col("day"), col("cents"))
    val spine = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("day"))
    val obs = daily.filter(col("day") % 3 === 0)
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(obs, Seq("event_type", "day"), "left")
      .withColumn("prev_v", last(col("cents"), ignoreNulls = true).over(wPrev))
      .withColumn("prev_d",
        last(when(col("cents").isNotNull, col("day")), ignoreNulls = true).over(wPrev))
      .withColumn("next_v", first(col("cents"), ignoreNulls = true).over(wNext))
      .withColumn("next_d",
        first(when(col("cents").isNotNull, col("day")), ignoreNulls = true).over(wNext))
      .select(
        col("event_type"), col("day"),
        col("cents").isNotNull.as("observed"),
        round(
          when(col("cents").isNotNull, col("cents") * lit(1.0))
            .when(col("prev_v").isNull, col("next_v") * lit(1.0))
            .when(col("next_v").isNull, col("prev_v") * lit(1.0))
            .otherwise(col("prev_v") +
              (col("next_v") - col("prev_v")) * (col("day") - col("prev_d")) * lit(1.0)
                / (col("next_d") - col("prev_d")))
            / 100, 4).as("filled"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Lag-1 autocorrelation of daily volume per event type — the
    * persistence check completing the trend family (OLS slope:
    * [[volumeTrend]]; robust slope: [[theilSen]]; level shift:
    * [[changepoint]]): r1 near 0 says day-to-day volume is memoryless,
    * r1 near 1 says shocks persist (and the weekly-seasonality twin is
    * the weekday z-score). Computed from EXACT integer sums over the
    * reduced (type, day) table — Σx, Σx², n from one aggregate; the
    * lagged cross term Σ x_d·x_{d+1} via a per-type lead window on days
    * — with the textbook estimator r1 = Σ(x_d−m)(x_{d+1}−m) / Σ(x−m)²
    * expanded so every sum is integral and m = Σx/n divides once at the
    * end.
    */
  def acf1(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = BehaviorOps.typeDaily(spark, dir)
      .select(col("event_type"), col("day"), col("n"))
    val byDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val lagged = daily.withColumn("next_n", lead(col("n"), 1).over(byDay))
    val sums = lagged.groupBy(col("event_type")).agg(
      count(lit(1)).as("nd"),
      sum(col("n")).as("sx"),
      sum(col("n") * col("n")).as("sxx"),
      sum(when(col("next_n").isNotNull, col("n") * col("next_n"))
        .otherwise(0L)).as("sxy"),
      sum(when(col("next_n").isNotNull, col("n")).otherwise(0L)).as("sx_head"),
      sum(coalesce(col("next_n"), lit(0L))).as("sx_tail"),
    )
    // r1 = (Σxy − m(Σhead + Σtail) + (nd−1)m²) / (Σx² − 2mΣx + nd·m²)
    val m = col("sx").cast("double") / col("nd")
    val num = col("sxy") - m * (col("sx_head") + col("sx_tail")) +
      (col("nd") - 1) * m * m
    val den = col("sxx") - lit(2.0) * m * col("sx") + col("nd") * m * m
    sums.select(
      col("event_type"), col("nd").as("n_days"),
      round(num / den, 4).as("acf1"),
    ).orderBy(col("event_type"))
  }

  /** Linear-vs-z-order clustering COMPARISON — the decision-grade twin
    * of [[zorderLayout]]/[[zonemapSkip]] (which audit one z-order
    * layout in isolation): cluster lineitem BOTH ways — linearly by
    * partkey (the status-quo sort) and by the Morton interleave of
    * RANK-bucketed partkey and suppkey — cut each ordering into 64
    * equal "files", and count how many files a fixed 8-range workload
    * on EACH dimension must open under the per-file min/max zone maps.
    * Linear clustering prunes its own dimension perfectly and the other
    * not at all; the space-filling curve buys balanced pruning on both
    * — the exact trade a 100-TB OPTIMIZE ZORDER decision weighs, as an
    * oracle-checked number instead of folklore. Rank bucketing (not raw
    * value bits) makes the curve robust to skewed key distributions;
    * every rank cut is the exact distributed ntile (never a single-task
    * global sort), the bit interleave is integer magic-number spreading
    * (codegen-friendly column algebra, identical on both engines), and
    * the range probe is a ≤(2·2·64)×16-row broadcast hash join keyed on
    * the probed dimension.
    *
    * Cost model: this query SIMULATES two full table re-clusterings, so
    * its floor is two range shuffles of the entire fact table — that is
    * the honest price of OPTIMIZE ZORDER, which is why lake engines run
    * it as a maintenance job, not a query. The third rank cut (z-order
    * file ids) avoids a shuffle entirely: morton lives on the literal
    * 64×64 grid, so its ntile decomposes into a bounded cell cumsum +
    * a cell-keyed window over the already-checkpointed frame.
    * Round-11 stage profile (warm, sf0.1): partkey ntile ≈ 2.2 s,
    * suppkey ntile ≈ 2.3 s, morton checkpoint ≈ 0.8 s, probe tail
    * ≈ 0.6 s — the two exact-rank cuts ARE the query, so further
    * column-trimming of the checkpoint was adjudicated not worth the
    * hash-risk (≤0.3 s available outside the ntile floor). */
  def clusteringCompare(spark: SparkSession, dir: String): DataFrame = {
    val keys = Seq(col("l_orderkey"), col("l_linenumber"))
    val base0 = Tables.lineitem(spark, dir)
      .select((col("l_partkey") +: col("l_suppkey") +: keys): _*)
    // One exact rank cut per dimension (64 buckets): the partkey cut IS
    // the linear layout's file id, so the two distributed ntiles below
    // are the ONLY range shuffles in the query.
    val bx = BehaviorOps.keyedNtile(base0, 64, "f_linear")(
      col("l_partkey"), false, keys: _*)
    val by = BehaviorOps.keyedNtile(bx, 64, "byt")(
      col("l_suppkey"), false, keys: _*)
    // 6-bit Morton spread via the standard magic-number doubling; both
    // engines evaluate the same BIGINT & | << algebra
    def spread(c: String): String = graft.functions.MortonSql.spread(c)
    val m = by
      .withColumn("bxv", col("f_linear").cast("long") - 1L)
      .withColumn("byv", col("byt").cast("long") - 1L)
      .withColumn("sx", expr(spread("bxv")))
      .withColumn("sy", expr(spread("byv")))
      .withColumn("morton", expr("sx | (sy * 2)"))
      .drop("byt", "bxv", "byv", "sx", "sy")
      .localCheckpoint() // cells pass + rank pass + stats reread this once
    // Exact ntile(64) over (morton, keys) WITHOUT a third range shuffle:
    // morton lives on the literal 64×64 grid, so the cross-cell offsets
    // are a cumsum over ≤4096 bounded cells and the within-cell rank is
    // a morton-keyed window — the same offset+rank decomposition as
    // distributedNtile with the grid playing the range partitioner.
    val cells = m.groupBy(col("morton")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val total = cells.agg(sum(col("cnt"))).head().getLong(0)
    val (q, r) = (total / 64, total % 64)
    val wCell = Window.orderBy(col("morton"))
      .rowsBetween(Window.unboundedPreceding, -1L)
    val offsets = cells
      .withColumn("off", coalesce(sum(col("cnt")).over(wCell), lit(0L)))
      .select(col("morton"), col("off"))
    val wIn = Window.partitionBy(col("morton")).orderBy(keys: _*)
    // the standard ntile boundary in closed form (first n%k tiles get
    // ⌈n/k⌉); CASE is lazy so the q=0 arm can't divide by zero
    val tile =
      s"""CAST(CASE WHEN _rn <= ${r * (q + 1)}
            THEN (_rn - 1) div ${q + 1} + 1
            ELSE $r + (_rn - ${r * (q + 1)} - 1) div $q + 1
          END AS INT)"""
    val fZ = m.join(broadcast(offsets), Seq("morton"))
      .withColumn("_rn", row_number().over(wIn).cast("long") + col("off"))
      .withColumn("f_zorder", expr(tile))
    // the linear layout's stats need no rank window — its file id is the
    // checkpointed partkey cut, read straight off m
    val stats = m.groupBy(col("f_linear")).agg(
        min(col("l_partkey")).as("p_lo"), max(col("l_partkey")).as("p_hi"),
        min(col("l_suppkey")).as("s_lo"), max(col("l_suppkey")).as("s_hi"))
      .withColumn("layout", lit("linear")).drop("f_linear")
      .unionByName(fZ.groupBy(col("f_zorder")).agg(
          min(col("l_partkey")).as("p_lo"), max(col("l_partkey")).as("p_hi"),
          min(col("l_suppkey")).as("s_lo"), max(col("l_suppkey")).as("s_hi"))
        .withColumn("layout", lit("zorder")).drop("f_zorder"))
    // per-dim file intervals + per-dim probe ranges, joined on the dim
    // name (equi key) with the interval test as the residual condition
    val dimStats = stats.select(col("layout"), lit("partkey").as("dim"),
        col("p_lo").as("lo"), col("p_hi").as("hi"))
      .unionByName(stats.select(col("layout"), lit("suppkey").as("dim"),
        col("s_lo").as("lo"), col("s_hi").as("hi")))
    val dom = m.agg(max(col("l_partkey")).as("pmax"),
      max(col("l_suppkey")).as("smax")).head()
    val (pw, sw) = ((dom.getLong(0) + 8L) / 8L, (dom.getLong(1) + 8L) / 8L)
    val ranges = spark.range(0, 8)
      .select(lit("partkey").as("dim"), col("id").as("range_id"),
        (col("id") * pw).as("r_lo"), ((col("id") + 1) * pw - 1).as("r_hi"))
      .unionByName(spark.range(0, 8)
        .select(lit("suppkey").as("dim"), col("id").as("range_id"),
          (col("id") * sw).as("r_lo"), ((col("id") + 1) * sw - 1).as("r_hi")))
    dimStats.join(broadcast(ranges), Seq("dim"))
      .filter(col("hi") >= col("r_lo") && col("lo") <= col("r_hi"))
      .groupBy(col("layout"), col("dim"))
      .agg(expr("count(1) * 100 div 8").as("avg_candidate_files_x100"))
      .orderBy(col("layout"), col("dim"))
  }

  /** Neyman allocation for stratified sampling: given a 10000-unit
    * sample budget over the event-type strata, allocate proportional to
    * N_h·S_h — the variance-minimizing design every large-scale survey
    * or eval-set sampler uses instead of proportional allocation. The
    * within-stratum spread is computed EXACTLY in integers first: center
    * on the integer floor mean, sum squared integer deviations (no
    * unordered float sum anywhere), and only then take one IEEE sqrt
    * per stratum — both engines see identical inputs, so the doubles
    * and the final rounded allocation match bit-for-bit. The stratum
    * table is ≤|types| rows; the total rides an ordered running sum
    * (cross-engine-deterministic sequential addition). */
  def neymanAlloc(spark: SparkSession, dir: String): DataFrame = {
    val e = BehaviorOps.eventSeq(spark, dir)
      .select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
    val mu = e.groupBy(col("event_type"))
      .agg(expr("sum(cents) div count(1)").as("mu"))
    val ssd = e.join(broadcast(mu), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_h"),
        sum((col("cents") - col("mu")) * (col("cents") - col("mu"))).as("ssd"))
    val wRun = Window.orderBy(col("event_type"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w = ssd
      // a singleton stratum has no within-stratum variance: S_h is 0 by
      // definition, not 0.0/0.0 (the NaN would poison the running sum
      // and through totalW every OTHER stratum's allocation)
      .withColumn("wgt", when(col("n_h") > 1, col("n_h") *
        sqrt(col("ssd").cast("double") / (col("n_h") - 1).cast("double")))
        .otherwise(lit(0d)))
      .withColumn("run_w", sum(col("wgt")).over(wRun))
    val totalW = w.agg(max(col("run_w"))).head().getDouble(0)
    w.select(col("event_type"), col("n_h"), col("ssd"),
        round(lit(10000d) * col("wgt") / lit(totalW), 0).cast("long")
          .as("alloc_of_10000"))
      .orderBy(col("event_type"))
  }

  /** Weighted sampling without replacement via exponential keys — the
    * A-ES / Efraimidis–Spirakis design: each row draws u from its
    * md5-keyed deterministic uniform, keys on −ln(u)/w, and the k
    * smallest keys ARE a weight-proportional sample. This is the
    * one-pass, fully-parallel way to draw a weighted sample from 10⁹
    * rows (each partition keeps its local top-k, then merge — here the
    * engine's TakeOrderedAndProject); the md5-derived u makes the draw
    * replayable by the oracle, the deterministic stand-in for a seeded
    * RNG. Keys are rounded to 6 dp BEFORE ranking with an event-id tie
    * break, so an ulp of ln() drift can't reorder the sample. */
  def aesSample(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val e = BehaviorOps.eventSeq(spark, dir)
      .select(col("event_id"),
        (round(col("value") * 100, 0).cast("long") + 1L).as("w"))
      .withColumn("u",
        (expr("conv(substring(md5(CAST(event_id AS STRING)), 1, 13), 16, 10)")
          .cast("long") + 1L) / lit(4503599627370497d))
      .withColumn("key_scaled",
        round(-log(col("u")) / col("w").cast("double") * 1000000d, 6))
    val wRank = Window.orderBy(col("key_scaled"), col("event_id"))
    e.orderBy(col("key_scaled"), col("event_id")).limit(k)
      .withColumn("rank", row_number().over(wRank))
      .select(col("event_id"), col("w"), col("key_scaled"), col("rank"))
      .orderBy(col("key_scaled"), col("event_id"))
  }
}
