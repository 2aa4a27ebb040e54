package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph post-processing for dedup pipelines: candidate PAIRS (from
  * MinHash bands, cosine thresholds, …) become duplicate GROUPS via
  * connected components. The implementation is Pregel-style min-label
  * propagation — each iteration is one join + one aggregation, so a
  * round is two shuffles regardless of graph size, and the iteration
  * count is bounded by the component diameter (near-dup clusters are
  * shallow). This is the same loop structure large-scale CC (large-star/
  * small-star) uses; no driver-side graph materialization.
  */
object GraphOps {

  /** Minimum reachable node id per node, over the undirected graph given
    * by (src, dst) pairs. Returns (node, component). */
  def connectedComponents(pairs: DataFrame, src: String, dst: String,
      maxIter: Int = 20): DataFrame = {
    val fwd = pairs.select(col(src).as("a"), col(dst).as("b"))
    // localCheckpoint (eager), NOT cache: in an iterative loop each
    // round's plan otherwise embeds the whole accumulated lineage and
    // re-optimization time grows without bound — checkpointing cuts the
    // lineage so every round plans against materialized partitions.
    val edges = fwd.unionByName(fwd.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    // labels only ever decrease, so the label sum is a strictly monotone
    // convergence measure — one cheap aggregate per round instead of a
    // change-detection join. sum() over an empty frame is null (empty
    // pair graph → no nodes): treat it as 0 so convergence is immediate
    // instead of an NPE.
    def labelSum(df: DataFrame): Long = {
      val row = df.agg(sum(col("label"))).head()
      if (row.isNullAt(0)) 0L else row.getLong(0)
    }
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // each node takes the min of its own label and its neighbors' labels
      val viaNeighbors = edges
        .join(labels, edges("b") === labels("node"))
        .select(edges("a").as("node"), col("label"))
      labels = labels.unionByName(viaNeighbors)
        .groupBy(col("node"))
        .agg(min(col("label")).as("label"))
        .localCheckpoint()
      val s = labelSum(labels)
      converged = s == prevSum
      prevSum = s
      i += 1
    }
    labels.select(col("node"), col("label").as("component"))
  }

  /** Near-dup clusters over the embedding-cosine pair graph: every vector
    * that has at least one near-duplicate, labeled with its component
    * (the min vec_id reachable through near-dup edges). The pair input is
    * the LSH-bucketed candidate generator — shuffle-by-bucket, no O(n)
    * broadcast, no O(n²) pair stage — so the whole chain (candidates →
    * exact score → components) is the shape that survives 100×. */
  def nearDupComponents(spark: SparkSession, dir: String): DataFrame =
    connectedComponents(
      SimilarityOps.bucketedNearDup(spark, dir), "a_id", "b_id")
      .orderBy(col("node"))

  /** Degree distribution of the near-dup graph — the health check a
    * dedup run reads first (a fat-tailed degree histogram means a
    * near-dup "hub" is about to glue unrelated clusters). Each
    * undirected edge contributes to both endpoints; one hash aggregate
    * over the exploded endpoints. */
  def nearDupDegrees(spark: SparkSession, dir: String): DataFrame = {
    val pairs = SimilarityOps.bucketedNearDup(spark, dir)
      .select(col("a_id"), col("b_id"))
    pairs.select(col("a_id").as("node"))
      .unionAll(pairs.select(col("b_id").as("node")))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("degree"))
      .orderBy(col("node"))
  }
}
