package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.model.Tables
import graft.operators.{DashboardOps, RelationalOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is paired with equivalent DuckDB SQL in
  * `oracleSql` (same parquet tables, same column ALIASES, deterministic
  * ORDER BY ending in a unique key) so the driver's hash compare is exact.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The risk histogram exercises scan → projection → the two signature
    * scalar ops (clean/risk) → aggregation → join → sort: every layer.
    */
  def entry(spark: SparkSession): DataFrame =
    DashboardOps.riskHistogram(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- dashboard / text parity set (SURVEY.md §2.2/§2.4/§2.6/§2.10)
    "q_global_stats"    -> ((s, d) => DashboardOps.globalStats(s, d)),
    "q_stats_by_group"  -> ((s, d) => DashboardOps.statsByGroup(s, d)),
    "q_group_samples"   -> ((s, d) => DashboardOps.groupSamples(s, d)),
    "q_risk_histogram"  -> ((s, d) => DashboardOps.riskHistogram(s, d)),
    "q_recent_topk"     -> ((s, d) => DashboardOps.recentTopK(s, d)),
    "q_high_risk"       -> ((s, d) => DashboardOps.highRisk(s, d)),
    "q_clean_text"      -> ((s, d) => cleanTextQuery(s, d)),
    "q_risk_score"      -> ((s, d) => riskScoreQuery(s, d)),
    "q_truncate_project" -> ((s, d) => truncateProject(s, d)),
    "q_dedup_exact"     -> ((s, d) => dedupExact(s, d)),
    // ---- relational capability set (SURVEY.md §2.3/§2.5/§2.7)
    "q1_pricing_summary" -> ((s, d) => RelationalOps.pricingSummary(s, d)),
    "q_join_orders_customer" -> ((s, d) => RelationalOps.ordersPerCustomer(s, d)),
    "q_join_revenue_region" -> ((s, d) => RelationalOps.revenueByRegionNation(s, d)),
    "q_semi_anti"       -> ((s, d) => RelationalOps.customerOrderPresence(s, d)),
    "q_topn_per_group"  -> ((s, d) => RelationalOps.topOrdersPerCustomer(s, d)),
    "q_running_sum"     -> ((s, d) => RelationalOps.runningSumPerUser(s, d)),
    "q_lag_delta"       -> ((s, d) => RelationalOps.lagDeltaPerUser(s, d)),
    "q_set_ops"         -> ((s, d) => RelationalOps.userSetOps(s, d)),
    "q_distinct_users"  -> ((s, d) => RelationalOps.distinctUsersPerType(s, d)),
    "q_rollup"          -> ((s, d) => RelationalOps.customerRollup(s, d)),
    "q_props_json"      -> ((s, d) => RelationalOps.propsExtract(s, d)),
  )

  /** U-1 clean_text over the corpus, truncated to 200 chars like the
    * persisted snapshot (reference: kafka_consumer_simple.py:138). */
  private def cleanTextQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        substring(TextFunctions.cleanText(col("text")), 1, 200).as("cleaned_text"),
      )
      .orderBy(col("doc_id"))

  /** U-2 risk_score over the corpus. */
  private def riskScoreQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextFunctions.riskScore(col("text")).as("risk_score"))
      .orderBy(col("doc_id"))

  /** P-5/P-6: column pruning + fixed-length truncation
    * (reference: kafka_consumer_simple.py:131,138). */
  private def truncateProject(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        substring(col("text"), 1, 100).as("text_trunc"),
        length(col("text")).as("text_len"),
      )
      .orderBy(col("doc_id"))

  /** P-7 dedup by key, deterministically: one surviving (min) doc_id per
    * distinct text. (dropDuplicates keeps an arbitrary row — not
    * hashable against an oracle; min-per-group is the deterministic
    * formulation of the same semantics.) */
  private def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("surviving_doc_id"), count(lit(1)).as("dup_count"))
      .select(col("surviving_doc_id"), col("dup_count"))
      .orderBy(col("surviving_doc_id"))

  /** Shared DuckDB SQL fragment: the risk score of documents.text. */
  private val riskSql: String = TextFunctions.riskScoreDuckDbSql("lower(text)")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_global_stats" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS total_posts,
          round(avg($riskSql), 2) AS avg_risk,
          CAST(sum(CASE WHEN $riskSql >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS high_risk_count,
          round(avg(n_chars), 2) AS avg_chars
          FROM documents""",
    "q_stats_by_group" ->
      s"""SELECT lang,
          CAST(count(*) AS BIGINT) AS post_count,
          CAST(sum(n_chars) AS BIGINT) AS total_chars,
          round(avg(n_chars), 2) AS avg_chars,
          round(avg($riskSql), 2) AS avg_risk
          FROM documents GROUP BY lang ORDER BY lang""",
    "q_group_samples" ->
      """SELECT lang,
          array_to_string(list_slice(list(doc_id ORDER BY doc_id), 1, 5), ',') AS sample_doc_ids,
          CAST(count(*) AS BIGINT) AS post_count
          FROM documents GROUP BY lang ORDER BY lang""",
    "q_risk_histogram" ->
      s"""WITH scored AS (
            SELECT CASE WHEN $riskSql < 10 THEN '0-9'
                        WHEN $riskSql < 20 THEN '10-19'
                        WHEN $riskSql < 30 THEN '20-29'
                        ELSE '30+' END AS bucket
            FROM documents),
          buckets(bucket) AS (VALUES ('0-9'), ('10-19'), ('20-29'), ('30+'))
          SELECT b.bucket, CAST(coalesce(c.n, 0) AS BIGINT) AS n
          FROM buckets b LEFT JOIN
            (SELECT bucket, count(*) AS n FROM scored GROUP BY bucket) c
            USING (bucket)
          ORDER BY b.bucket""",
    "q_recent_topk" ->
      """SELECT event_id, user_id, event_type, value
          FROM events ORDER BY event_id DESC LIMIT 10""",
    "q_high_risk" ->
      s"""SELECT doc_id, $riskSql AS risk_score FROM documents
          WHERE $riskSql >= 30 ORDER BY doc_id""",
    "q_clean_text" ->
      s"""SELECT doc_id, substring(${TextFunctions.cleanTextDuckDbSql("text")}, 1, 200) AS cleaned_text
          FROM documents ORDER BY doc_id""",
    "q_risk_score" ->
      s"SELECT doc_id, $riskSql AS risk_score FROM documents ORDER BY doc_id",
    "q_truncate_project" ->
      """SELECT doc_id, substring(text, 1, 100) AS text_trunc,
          CAST(length(text) AS INTEGER) AS text_len
          FROM documents ORDER BY doc_id""",
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS surviving_doc_id, CAST(count(*) AS BIGINT) AS dup_count
          FROM documents GROUP BY text ORDER BY surviving_doc_id""",
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
          round(sum(l_quantity), 2) AS sum_qty,
          round(sum(l_extendedprice), 2) AS sum_base_price,
          round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
          round(avg(l_quantity), 4) AS avg_qty,
          round(avg(l_discount), 4) AS avg_disc,
          CAST(count(*) AS BIGINT) AS count_order
          FROM lineitem GROUP BY l_returnflag, l_linestatus
          ORDER BY l_returnflag, l_linestatus""",
    "q_join_orders_customer" ->
      """SELECT c_custkey, c_name, c_mktsegment,
          CAST(count(*) AS BIGINT) AS order_count,
          round(sum(o_totalprice), 2) AS total_spent
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_custkey, c_name, c_mktsegment ORDER BY c_custkey""",
    "q_join_revenue_region" ->
      """SELECT r_name, n_name,
          round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
          CAST(count(*) AS BIGINT) AS line_count
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q_semi_anti" ->
      """SELECT status, CAST(count(*) AS BIGINT) AS n_customers FROM (
            SELECT c_custkey, 'has_orders' AS status FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            UNION ALL
            SELECT c_custkey, 'no_orders' AS status FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
          GROUP BY status ORDER BY status""",
    "q_topn_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
              row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
          WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q_running_sum" ->
      """SELECT user_id, event_id, value,
          round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
          FROM events ORDER BY user_id, event_id""",
    "q_lag_delta" ->
      """SELECT user_id, event_id, value,
          lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
          round(value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id), 2) AS delta
          FROM events ORDER BY user_id, event_id""",
    "q_set_ops" ->
      """SELECT user_id, 'click_and_purchase' AS set_op FROM (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
          UNION ALL
          SELECT user_id, 'click_only' AS set_op FROM (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
            EXCEPT
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
          ORDER BY set_op, user_id""",
    "q_distinct_users" ->
      """SELECT event_type,
          CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users,
          CAST(count(*) AS BIGINT) AS n_events,
          round(sum(value), 2) AS total_value
          FROM events GROUP BY event_type ORDER BY event_type""",
    "q_rollup" ->
      """SELECT
          CASE WHEN GROUPING(r_name) = 1 THEN 'ALL' ELSE r_name END AS region,
          CASE WHEN GROUPING(n_name) = 1 THEN 'ALL' ELSE n_name END AS nation,
          CAST(count(*) AS BIGINT) AS n_customers,
          round(sum(c_acctbal), 2) AS total_balance
          FROM customer
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY ROLLUP(r_name, n_name)
          ORDER BY region, nation""",
    "q_props_json" ->
      """SELECT k_mod10, CAST(count(*) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS sum_k FROM (
            SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod10,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events)
          GROUP BY k_mod10 ORDER BY k_mod10""",
  )
}
