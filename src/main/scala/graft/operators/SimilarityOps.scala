package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Similarity search over the embeddings table (Array[Float] vectors).
  * Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
  * variant (bucket on a coarse projection, join within buckets) is the
  * 100-TB path. The inner kernel is the native codegen'd
  * [[graft.expr.DotProduct]] expression — Spark's builtin
  * aggregate/zip_with HOFs evaluate their lambdas on the interpreted
  * path per element, which dominated the pairwise stages.
  *
  * All math runs in double (vectors cast up from float) so the oracle
  * agrees bit-for-bit before the 6-dp round.
  */
object SimilarityOps {

  private def embDouble(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.fanOut(Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
  }

  /** [[embDouble]] plus the per-vector L2 norm, materialized once per
    * (app, dir) through the session frame cache — eleven ANN/similarity
    * queries start from this exact frame, and at 100 TB "embeddings
    * with norms" is a stored feature table, not a per-query recompute. */
  private def embNormed(spark: SparkSession, dir: String): DataFrame =
    DedupOps.cachedFrame(spark, dir, "embNormed") {
      embDouble(spark, dir)
        .withColumn("nv", sqrt(dot(col("v"), col("v"))))
    }

  /** Native codegen'd dot product (graft.expr.DotProduct) — replaces the
    * interpreted aggregate(zip_with(...)) HOF pair in every pairwise
    * kernel below; summation order (left-to-right) is identical so all
    * oracle hashes are unchanged. */
  private def dot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    call_function("dot_product", a, b)

  /** Brute-force cosine top-3 neighbors for query vectors vec_id < 5.
    * The query side is broadcast; ranking is on the rounded score so
    * cross-system ulp drift cannot reorder.
    */
  def knnCosine(spark: SparkSession, dir: String): DataFrame = {
    // Norms are per-vector, not per-pair: compute them once on each side
    // before the join (O(n·d)) so the pairwise stage only does the dot
    // product (O(n·q·d)), not three array folds per pair.
    val e = embNormed(spark, dir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nv").as("nq"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("dot", dot(col("v"), col("qv")))
      .withColumn("cosine", round(col("dot") / (col("nv") * col("nq")), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("q_id"), col("vec_id"), col("cosine"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Semantic benchmark decontamination: the embedding-space twin of
    * the exact/bloom n-gram decontaminators (`q_decontaminate`,
    * `q_bloom_decontaminate`) — paraphrased benchmark leakage survives
    * string matching, so modern pipelines also sweep the corpus for
    * training items whose EMBEDDING sits above a cosine threshold to
    * any held-out benchmark item. Benchmark side = the 5 probe vectors
    * (constant, broadcast); corpus side streams once through the
    * codegen'd dot-product kernel; cosines are 6-dp rounded before the
    * threshold so the flag can't sit on an ulp. Per probe: corpus size
    * checked, items flagged at τ, the max cosine seen, and the first
    * flagged id. O(n·q·d) with q a literal — the same constant-probe
    * shape as the ANN family, never corpus×corpus. */
  def semDecontaminate(spark: SparkSession, dir: String,
      tau: Double = 0.3): DataFrame = {
    val e = embNormed(spark, dir)
    val bench = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nv").as("nq"))
    e.filter(col("vec_id") >= 5)
      .join(broadcast(bench))
      .withColumn("cosine",
        round(dot(col("v"), col("qv")) / (col("nv") * col("nq")), 6))
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("cosine") >= tau, 1L).otherwise(0L)).as("n_flagged"),
        max(col("cosine")).as("max_cosine"),
        min(when(col("cosine") >= tau, col("vec_id"))).as("first_flagged_id"))
      .orderBy(col("q_id"))
  }

  /** Embedding-cosine near-duplicate pairs for a sampled probe set
    * (every 20th vector), derived from the SAME sign-bucket candidate
    * generator as [[bucketedNearDup]]: the sampled side equi-joins the
    * corpus ON THE BUCKET, later-id collisions are scored exactly, and
    * the threshold filters on the ROUNDED score so a boundary pair
    * cannot flip between engines on ulp drift. No O(n) broadcast, no
    * inequality-only join — the probe side is small so AQE broadcasts
    * it as a BroadcastHashJoin at bench scale and falls back to a
    * shuffle on the bucket key beyond the size gate. (This replaced the
    * round-2 brute-force broadcast-sample formulation.)
    */
  def cosineNearDup(spark: SparkSession, dir: String,
      threshold: Double = 0.3): DataFrame = {
    val e = embNormed(spark, dir)
      .withColumn("bucket", bucketExpr)
    val probes = e.filter(col("vec_id") % 20 === 0)
      .select(col("bucket"), col("vec_id").as("a_id"), col("v").as("av"), col("nv").as("na"))
    e.select(col("bucket"), col("vec_id").as("b_id"), col("v").as("bv"), col("nv").as("nb"))
      .join(probes, Seq("bucket"))
      .filter(col("b_id") > col("a_id"))
      .withColumn("dot", dot(col("av"), col("bv")))
      .withColumn("cosine", round(col("dot") / (col("na") * col("nb")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), col("cosine"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Per-label vector-norm statistics — the aggregate-over-array probe. */
  /** Embedding drift monitor: per label, the L2 distance between the
    * centroids of two content-addressed halves (even/odd vec_id — the
    * deterministic stand-in for "yesterday's batch vs today's"). A
    * nonzero-but-small drift is the healthy baseline; a jump says the
    * embedding model or upstream corpus shifted and ANN indexes need a
    * rebuild. Per-dim means QUANTIZE to 6 dp before the distance (the
    * k-means handoff discipline — both engines then square identical
    * numbers); everything is one posexplode aggregate over (label, dim)
    * plus a |labels|-row join.
    */
  def vectorDrift(spark: SparkSession, dir: String): DataFrame = {
    val e = embDouble(spark, dir).withColumn("half", col("vec_id") % 2)
    val mu = e
      .select(col("label"), col("half"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(
        round(avg(when(col("half") === 0, col("x"))), 6).as("mu_a"),
        round(avg(when(col("half") === 1, col("x"))), 6).as("mu_b"))
    val n = e.groupBy(col("label").as("nl"))
      .agg(
        sum(when(col("half") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_b"))
    mu.join(Tables.maybeBroadcast(n), col("label") === col("nl"))
      .groupBy(col("label"), col("n_a"), col("n_b"))
      .agg(round(sqrt(sum((col("mu_a") - col("mu_b")) * (col("mu_a") - col("mu_b")))), 6)
        .as("drift_l2"))
      .orderBy(col("label"))
  }

  def labelNorms(spark: SparkSession, dir: String): DataFrame =
    embDouble(spark, dir)
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vectors"),
        round(avg(col("norm")), 6).as("avg_norm"),
        round(min(col("norm")), 6).as("min_norm"),
        round(max(col("norm")), 6).as("max_norm"),
      )
      .orderBy(col("label"))

  /** IVF-style ANN: assign every vector to its nearest "centroid" (the
    * first 8 vectors stand in for trained centroids — deterministic, no
    * RNG), then answer top-k queries WITHIN the query's cell only
    * (nprobe=1). This is the inverted-file index shape: the expensive
    * pairwise stage touches one cell instead of the corpus, and at scale
    * the cell assignment is the shuffle key. Assignment ties break on
    * centroid id via the rounded score.
    */
  def ivfTopK(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val e = embNormed(spark, dir)
    val centroids = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nv").as("nc"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("c_id"))
    val assigned = e.join(broadcast(centroids), lit(true))
      .withColumn("c_cos", round(
        dot(col("v"), col("cv")) / (col("nv") * col("nc")), 6))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("nv"), col("c_id").as("cell"))
    val queries = assigned.filter(col("vec_id") >= 10 && col("vec_id") < 15)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nv").as("nq"),
        col("cell").as("q_cell"))
    val wRank = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    assigned.join(broadcast(queries),
        col("cell") === col("q_cell") && col("vec_id") =!= col("q_id"))
      .withColumn("cosine", round(
        dot(col("v"), col("qv")) / (col("nv") * col("nq")), 6))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("cell"), col("vec_id"), col("cosine"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** ANN index QUALITY: recall@k of the IVF cell-probe answer against
    * the exact brute-force top-k for the same query vectors — the
    * estimator-quality companion to [[ivfTopK]], the way
    * `DedupOps.minhashEstVsExact` audits MinHash. This is the number an
    * index owner actually watches: how much of the true neighborhood the
    * nprobe=1 cell search surrendered. Both sides rank on the ROUNDED
    * score with a vec_id tie-break so the top-k sets are deterministic
    * cross-engine; hits count via a left join from the exact set (a
    * query with zero IVF overlap still reports, with recall 0).
    */
  def ivfRecall(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val ivf = ivfTopK(spark, dir, k)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    val e = embNormed(spark, dir)
    val q = e.filter(col("vec_id") >= 10 && col("vec_id") < 15)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nv").as("nq"))
    val wRank = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    val exact = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cosine", round(
        dot(col("v"), col("qv")) / (col("nv") * col("nq")), 6))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"))
    exact.join(ivf, Seq("q_id", "vec_id"), "left_outer")
      .groupBy(col("q_id"))
      .agg(
        count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"),
        round(sum(coalesce(col("hit"), lit(0L))) * lit(1.0) / count(lit(1)), 6)
          .as("recall"),
      )
      .orderBy(col("q_id"))
  }

  /** NDCG@k of the IVF answer against the exact top-k ordering — the
    * position-weighted companion to [[ivfRecall]]: recall says how MANY
    * true neighbors survived the cell probe, NDCG says WHERE they
    * landed (a hit demoted to rank k is worth 1/log₂(k+1) of a rank-1
    * hit). Binary relevance — an IVF result is relevant iff it is in
    * the exact top-k — with the ideal DCG derived from the exact ranks
    * themselves, so the denominator needs no closed form. Same
    * constant-bounded broadcast shape as every ANN audit here; both
    * rankings reuse the rounded-cosine/vec_id tie-break so the sets are
    * deterministic cross-engine, and a query whose probed cell held no
    * true neighbor still reports (NDCG 0).
    */
  def ivfNdcg(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val ivf = ivfTopK(spark, dir, k).select(col("q_id"), col("vec_id"), col("rn"))
    val e = embNormed(spark, dir)
    val q = e.filter(col("vec_id") >= 10 && col("vec_id") < 15)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nv").as("nq"))
    val wRank = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    val exact = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cosine", round(
        dot(col("v"), col("qv")) / (col("nv") * col("nq")), 6))
      .withColumn("ern", row_number().over(wRank))
      .filter(col("ern") <= k)
      .select(col("q_id"), col("vec_id"), col("ern"))
      .localCheckpoint() // feeds both the relevance join and the ideal DCG
    val dcg = ivf
      .join(exact.select(col("q_id"), col("vec_id"), lit(1L).as("rel")),
        Seq("q_id", "vec_id"), "left_outer")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("rel"), lit(0L)).cast("double") / log2(col("rn") + 1))
        .as("dcg"))
    val idcg = exact.groupBy(col("q_id"))
      .agg(sum(lit(1.0) / log2(col("ern") + 1)).as("idcg"))
    idcg.join(dcg, Seq("q_id"), "left_outer")
      .select(col("q_id"),
        round(coalesce(col("dcg"), lit(0.0)), 6).as("dcg"),
        round(col("idcg"), 6).as("idcg"),
        round(coalesce(col("dcg"), lit(0.0)) / col("idcg"), 6).as("ndcg"))
      .orderBy(col("q_id"))
  }

  /** Hard-negative mining for metric learning: for each probe vector,
    * the top-3 most-similar vectors with a DIFFERENT label — the
    * near-miss impostors a contrastive/triplet objective needs (random
    * negatives are trivially far; the hard ones sit just across the
    * boundary). Same constant-probe skeleton as the ANN audits (5
    * broadcast queries against the corpus scan, per-query rank window);
    * the label inequality is a residual predicate on the broadcast
    * join, not a new join shape. At 100 TB the probe side is the
    * training batch — constant-bounded by construction.
    */
  def hardNegatives(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val e = embNormed(spark, dir) // carries (vec_id, label, v, nv)
    val q = e.filter(col("vec_id") >= 10 && col("vec_id") < 15)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nv").as("nq"), col("label").as("q_label"))
    val wRank = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    e.join(broadcast(q),
        col("vec_id") =!= col("q_id") && col("label") =!= col("q_label"))
      .withColumn("cosine", round(
        dot(col("v"), col("qv")) / (col("nv") * col("nq")), 6))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("q_label"), col("rn"),
        col("vec_id").as("neg_id"), col("label").as("neg_label"), col("cosine"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** MRR@k of the IVF list — the third retrieval-quality audit beside
    * recall ([[ivfRecall]]) and NDCG ([[ivfNdcg]]): the reciprocal rank
    * of the FIRST exact-top-k hit in each query's IVF answer, 0 when the
    * probed cells miss entirely. MRR is the metric single-answer
    * retrieval (RAG lookup, entity search) actually optimizes — recall
    * says "a right answer is somewhere in the list", MRR says "how far
    * the user scrolls". Same constant-bounded plan skeleton as NDCG:
    * the exact neighborhood comes from the one brute-force pass over
    * the 5-query broadcast, the first-hit rank is a min per query.
    */
  def ivfMrr(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val ivf = ivfTopK(spark, dir, k).select(col("q_id"), col("vec_id"), col("rn"))
    val e = embNormed(spark, dir)
    val q = e.filter(col("vec_id") >= 10 && col("vec_id") < 15)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nv").as("nq"))
    val wRank = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    val exact = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cosine", round(
        dot(col("v"), col("qv")) / (col("nv") * col("nq")), 6))
      .withColumn("ern", row_number().over(wRank))
      .filter(col("ern") <= k)
      .select(col("q_id"), col("vec_id"))
    val firstHit = ivf.join(exact, Seq("q_id", "vec_id"), "left_semi")
      .groupBy(col("q_id"))
      .agg(min(col("rn")).as("first_hit_rank"))
    q.select(col("q_id"))
      .join(firstHit, Seq("q_id"), "left_outer")
      .select(col("q_id"),
        coalesce(col("first_hit_rank"), lit(0L)).as("first_hit_rank"),
        round(coalesce(lit(1.0) / col("first_hit_rank"), lit(0.0)), 6)
          .as("reciprocal_rank"))
      .orderBy(col("q_id"))
  }

  /** The IVF tuning curve: recall@k at nprobe ∈ {1, 2, 4} in ONE plan —
    * the accuracy/cost knob every inverted-file index exposes. Queries
    * keep their `nprobe` nearest cells (centroid rank ≤ nprobe), the
    * candidate set grows cell by cell, and each (nprobe, query) ranks
    * its own top-k against the exact brute-force neighborhood. The three
    * curve points share one centroid-scoring pass and one candidate
    * join: candidates carry their cell's centroid rank, an explode over
    * the nprobe literals replicates each candidate into every curve
    * point that would probe its cell, and ranking partitions on
    * (nprobe, q_id). Every broadcast side is constant-bounded (8
    * centroids / 5 queries / 3 literals).
    */
  def ivfNprobeRecall(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val e = embNormed(spark, dir)
    val centroids = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nv").as("nc"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("c_id"))
    val scoredc = e.join(broadcast(centroids), lit(true))
      .withColumn("c_cos", round(
        dot(col("v"), col("cv")) / (col("nv") * col("nc")), 6))
      .withColumn("crank", row_number().over(wAssign))
    val assigned = scoredc.filter(col("crank") === 1)
      .select(col("vec_id"), col("v"), col("nv"), col("c_id").as("cell"))
    val queryCells = scoredc
      .filter(col("vec_id") >= 10 && col("vec_id") < 15 && col("crank") <= 4)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nv").as("nq"),
        col("c_id").as("q_cell"), col("crank"))
    val wRank = Window.partitionBy(col("np"), col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    val ivfTop = assigned
      .join(broadcast(queryCells),
        col("cell") === col("q_cell") && col("vec_id") =!= col("q_id"))
      .withColumn("cosine", round(
        dot(col("v"), col("qv")) / (col("nv") * col("nq")), 6))
      .withColumn("np", explode(array(lit(1), lit(2), lit(4))))
      .filter(col("crank") <= col("np"))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= k)
      .select(col("np"), col("q_id"), col("vec_id"), lit(1L).as("hit"))
    val q = e.filter(col("vec_id") >= 10 && col("vec_id") < 15)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nv").as("nq"))
    val wExact = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    val exact = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cosine", round(
        dot(col("v"), col("qv")) / (col("nv") * col("nq")), 6))
      .withColumn("rn", row_number().over(wExact))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"))
      .withColumn("np", explode(array(lit(1), lit(2), lit(4))))
    exact.join(ivfTop, Seq("np", "q_id", "vec_id"), "left_outer")
      .groupBy(col("np"), col("q_id"))
      .agg(round(sum(coalesce(col("hit"), lit(0L))) * lit(1.0) / count(lit(1)), 6)
        .as("recall"))
      .orderBy(col("np"), col("q_id"))
  }

  /** The sign-pattern LSH bucket of the first 8 dimensions (a fixed
    * coarse random-hyperplane surrogate). */
  private val bucketExpr = expr(
    """concat_ws('', transform(slice(v, 1, 8), x ->
         CASE WHEN x >= cast(0 AS double) THEN '1' ELSE '0' END))""")

  /** Near-duplicate pairs at scale: LSH-bucket every vector by sign
    * pattern, equi-join ON THE BUCKET (a plain shuffle-by-key join — no
    * broadcast of anything O(n), no cross join), then exact-cosine-score
    * only within-bucket candidates. Each vector lands in exactly one
    * bucket so a pair is generated at most once — no distinct needed.
    * This is the 100-TB formulation: the shuffle key is the bucket, the
    * pairwise stage is sum over buckets of |bucket|², and bucket width
    * (number of sign bits) tunes that fan-in. [[cosineNearDup]] is the
    * sampled-probe variant over the same candidate generator.
    */
  def bucketedNearDup(spark: SparkSession, dir: String,
      threshold: Double = 0.3): DataFrame =
    nearDupPairs(spark, dir, threshold).orderBy(col("a_id"), col("b_id"))

  /** The (a_id, b_id, cosine) near-dup pair frame WITHOUT the
    * presentation sort, materialized once per (app, dir, threshold)
    * through the session frame cache: six graph-family registry queries
    * (components, degrees, triangles, pagerank, cluster sizes, …) all
    * start from these pairs, and each would otherwise re-run the
    * bucket join + pairwise cosine stage from the parquet scan. Same
    * amortization discipline as DedupOps' band/bigram tables — the
    * single-app stand-in for writing the pair table out once at 100 TB.
    */
  private[operators] def nearDupPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.3): DataFrame =
    DedupOps.cachedFrame(spark, dir, s"nearDupPairs:$threshold") {
      val e = embNormed(spark, dir)
        .withColumn("bucket", bucketExpr)
      val a = e.select(col("bucket"), col("vec_id").as("a_id"),
        col("v").as("av"), col("nv").as("na"))
      val b = e.select(col("bucket"), col("vec_id").as("b_id"),
        col("v").as("bv"), col("nv").as("nb"))
      a.join(b, Seq("bucket"))
        .filter(col("a_id") < col("b_id"))
        .withColumn("dot", dot(col("av"), col("bv")))
        .withColumn("cosine", round(col("dot") / (col("na") * col("nb")), 6))
        .filter(col("cosine") >= threshold)
        .select(col("a_id"), col("b_id"), col("cosine"))
    }

  /** Matryoshka truncation audit: does nearest-neighbor RANKING survive
    * prefix-dimension truncation — the question behind serving MRL-style
    * embeddings at d/8 or d/4 of the trained width (retrieval cost is
    * linear in d; if recall@k holds at d=8, the ANN index shrinks 8×).
    * One broadcast of the constant probe set, ONE pairwise pass scoring
    * every candidate at all widths simultaneously (prefix dots reuse the
    * same rows — no per-width re-join), then one q_id-partitioned window
    * per width; recall@k against the full-width exact top-k assembles
    * from the rank flags. Cosines are 6-dp-quantized BEFORE ranking with
    * vec_id tie-break, the cross-engine rank discipline every exact-topk
    * query here uses.
    */
  def matryoshkaRecall(spark: SparkSession, dir: String,
      k: Int = 10, dims: Seq[Int] = Seq(8, 16, 32)): DataFrame = {
    def pref(c: org.apache.spark.sql.Column, d: Int) = slice(c, 1, d)
    val e0 = embDouble(spark, dir)
    val e = dims.foldLeft(e0.withColumn("nfull", sqrt(dot(col("v"), col("v"))))) {
      case (df, d) => df.withColumn(s"n$d",
        sqrt(dot(pref(col("v"), d), pref(col("v"), d))))
    }
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id") +: col("v").as("qv") +:
        col("nfull").as("qnfull") +:
        dims.map(d => col(s"n$d").as(s"qn$d")): _*)
    var scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cfull",
        round(dot(col("v"), col("qv")) / (col("nfull") * col("qnfull")), 6))
    for (d <- dims) scored = scored.withColumn(s"c$d",
      round(dot(pref(col("v"), d), pref(col("qv"), d))
        / (col(s"n$d") * col(s"qn$d")), 6))
    def w(c: String) = Window.partitionBy(col("q_id"))
      .orderBy(col(c).desc, col("vec_id"))
    var ranked = scored.withColumn("rnfull", row_number().over(w("cfull")))
    for (d <- dims) ranked = ranked.withColumn(s"rn$d", row_number().over(w(s"c$d")))
    val recalls = dims.map(d =>
      round(sum(when(col(s"rn$d") <= k, 1L).otherwise(0L)) / lit(k.toDouble), 6)
        .as(s"recall_$d"))
    ranked
      .filter(col("rnfull") <= k)
      .groupBy(col("q_id"))
      .agg(recalls.head, recalls.tail: _*)
      .orderBy(col("q_id"))
  }

  /** Symmetric int8 quantization audit — the serving-side compression
    * every 100-TB embedding store applies (4× smaller, SIMD-friendly):
    * per-vector scale = max|x|/127, round-to-nearest levels, and the
    * reconstruction-error profile per label measured in the same pass.
    * Error accounting is the repo's exactness discipline: per-CELL
    * integer ppm (round(|err|·10⁶) as BIGINT) summed order-independently,
    * plus an order-independent max — no double sum ever crosses a
    * rounding boundary, so the audit is hash-stable under any
    * partitioning. One posexplode + one hash aggregate; nothing pairwise.
    */
  def int8QuantAudit(spark: SparkSession, dir: String): DataFrame = {
    val e = embDouble(spark, dir)
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))) / 127.0)
    e.select(col("label"), col("vec_id"), col("scale"),
        posexplode(col("v")).as(Seq("dim", "x")))
      .withColumn("err", when(col("scale") === 0.0, 0.0)
        .otherwise(abs(col("x") - round(col("x") / col("scale"), 0) * col("scale"))))
      .groupBy(col("label"))
      .agg(
        countDistinct(col("vec_id")).as("n_vectors"),
        count(lit(1)).as("n_cells"),
        sum(round(col("err") * 1e6, 0).cast("long")).as("total_err_ppm"),
        round(max(col("err")), 6).as("max_err"))
      .withColumn("mean_abs_err",
        round(col("total_err_ppm") / (col("n_cells") * 1000000.0), 6))
      .orderBy(col("label"))
  }

  /** Binary-sign embedding recall — the 32×-compression serving trade
    * study beside [[matryoshkaRecall]]'s width cut: every dimension
    * collapses to its sign bit, candidate ranking runs on integer
    * Hamming distance, and recall@10 against the exact full-precision
    * cosine top-10 says whether the binarized index is usable. The
    * Hamming rank is EXACT integer arithmetic (no quantize-before-rank
    * discipline needed — distances are small ints, vec_id breaks ties),
    * and the per-probe mean Hamming of the true top-10 calibrates the
    * radius a binary index would need. Same constant-probe broadcast
    * shape as every ANN audit here.
    */
  def hammingRecall(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val bitsOf = (c: org.apache.spark.sql.Column) =>
      transform(c, x => when(x >= 0, 1).otherwise(0))
    val e = embNormed(spark, dir)
      .withColumn("bits", bitsOf(col("v")))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nv").as("nq"), col("bits").as("qbits"))
    val wC = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    val wH = Window.partitionBy(col("q_id")).orderBy(col("hamming"), col("vec_id"))
    e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cosine",
        round(dot(col("v"), col("qv")) / (col("nv") * col("nq")), 6))
      .withColumn("hamming", expr(
        """aggregate(zip_with(bits, qbits,
             (a, b) -> CASE WHEN a <> b THEN 1 ELSE 0 END),
           0, (acc, x) -> acc + x)"""))
      .withColumn("rnc", row_number().over(wC))
      .withColumn("rnh", row_number().over(wH))
      .filter(col("rnc") <= k)
      .groupBy(col("q_id"))
      .agg(
        round(sum(when(col("rnh") <= k, 1L).otherwise(0L)) / lit(k.toDouble), 6)
          .as("recall_hamming"),
        round(sum(col("hamming")) / lit(k.toDouble), 6).as("top_mean_hamming"))
      .orderBy(col("q_id"))
  }

  /** K-means cluster purity — the label-agreement eval run after any
    * unsupervised clustering before its cells are trusted for semantic
    * dedup or topic sampling: per cell, the majority true label's share
    * of members. Reuses [[kmeansStep]]'s assignment discipline (k=8
    * constant centroid broadcast, 6-dp-quantized distances, c_id
    * tie-break) so the cells match `q_kmeans_step` exactly; purity is
    * exact integer counts with one terminal division. Random synthetic
    * embeddings land near 1/k — the honest no-structure baseline the
    * audit exists to detect.
    */
  def clusterPurity(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val e = embDouble(spark, dir).withColumn("nv2", dot(col("v"), col("v")))
    val centroids = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nv2").as("nc2"))
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("dist2"), col("c_id"))
    val wTop = Window.partitionBy(col("cell"))
      .orderBy(col("n").desc, col("label"))
    e.join(broadcast(centroids), lit(true))
      .withColumn("dist2", round(
        col("nv2") + col("nc2") - lit(2.0) * dot(col("v"), col("cv")), 6))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .groupBy(col("c_id").as("cell"), col("label"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rtop", row_number().over(wTop))
      .groupBy(col("cell"))
      .agg(
        sum(col("n")).as("n_vectors"),
        min(when(col("rtop") === 1, col("label"))).as("top_label"),
        max(when(col("rtop") === 1, col("n"))).as("top_n"))
      .withColumn("purity",
        round(col("top_n") / col("n_vectors").cast("double"), 6))
      .orderBy(col("cell"))
  }

  /** Per-label centroid — the k-means update step over labeled
    * embeddings: posexplode to (label, dim, x), then one partial+final
    * hash aggregate per (label, dim) cell. Map-side partials mean each
    * partition contributes ONE accumulator per (label, dim) — at 100 TB
    * the shuffle carries #labels × #dims running sums per partition, not
    * vectors. (A fixed-width vector-sum UDAF would shave the explode
    * fan-out; the exploded form keeps the whole step in codegen'd
    * Column algebra.)
    */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    embDouble(spark, dir)
      .select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(round(avg(col("x")), 6).as("centroid"), count(lit(1)).as("n_vectors"))
      .orderBy(col("label"), col("dim"))

  /** Embedding-space anomaly audit: every vector's squared distance to
    * its own label's centroid, fenced at the rank-selected p95 per
    * label — the mislabeled/garbage-embedding detector run before
    * clustering or ANN-index builds trust the labels. Centroids are the
    * [[labelCentroids]] aggregate QUANTIZED to 6 dp and reassembled
    * into k bounded arrays (the k-means handoff discipline), so the
    * distance pass is one equi-join on label against k rows; the fence
    * is an exact order statistic (row_number rank, no interpolation)
    * from one keyed window. Nothing pairwise, nothing unkeyed. */
  def centroidOutliers(spark: SparkSession, dir: String): DataFrame = {
    val e = embDouble(spark, dir).withColumn("nv2", dot(col("v"), col("v")))
    val cent = e
      .select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(round(avg(col("x")), 6).as("mu"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("mu")))),
        s => s.getField("mu")).as("cv"))
    val dists = e.join(broadcast(cent), Seq("label"))
      .withColumn("dist2", round(
        col("nv2") + dot(col("cv"), col("cv"))
          - lit(2.0) * dot(col("v"), col("cv")), 6))
      .select(col("label"), col("dist2"))
    val fences = dists
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("label")).orderBy(col("dist2"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("label"))))
      .groupBy(col("label"))
      .agg(min(when(col("rn") === expr("(n - 1) * 95 div 100 + 1"),
        col("dist2"))).as("fence"))
    dists.join(broadcast(fences), Seq("label"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vectors"),
        round(min(col("fence")), 6).as("p95_dist2"),
        sum(when(col("dist2") > col("fence"), 1L).otherwise(0L)).as("n_outliers"),
        round(max(col("dist2")), 6).as("max_dist2"),
      )
      .orderBy(col("label"))
  }

  /** Diagonal-covariance Mahalanobis outlier audit — the SCALED twin of
    * [[centroidOutliers]]: each dimension's deviation is divided by that
    * label's per-dim standard deviation before squaring, so a vector is
    * anomalous for being far out in a NARROW dimension even when wide
    * dimensions dominate raw Euclidean distance (the failure mode a
    * plain centroid distance can't see). Per-(label, dim) moments come
    * from one posexplode hash aggregate (shuffle carries k×d
    * accumulators, never vectors), are QUANTIZED (mu 6 dp, sd 4 dp — the
    * k-means handoff discipline, so float noise can't leak into the
    * score), reassembled into k bounded (mu[], sd[]) rows, and
    * broadcast; the z² pass is one equi-join on label with the sum
    * taken in fixed index order (deterministic cross-engine). Fence =
    * the exact per-label p95 rank statistic on the rounded score.
    */
  def mahalanobisOutliers(spark: SparkSession, dir: String): DataFrame = {
    val e = embDouble(spark, dir)
    val stats = e
      .select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(round(avg(col("x")), 6).as("mu"),
        round(stddev_samp(col("x")), 4).as("sd"))
      .groupBy(col("label"))
      .agg(
        transform(array_sort(collect_list(struct(col("dim"), col("mu")))),
          s => s.getField("mu")).as("muv"),
        transform(array_sort(collect_list(struct(col("dim"), col("sd")))),
          s => s.getField("sd")).as("sdv"))
    val scored = e.join(broadcast(stats), Seq("label"))
      .withColumn("z2", round(expr(
        """aggregate(sequence(0, size(v) - 1), cast(0 AS double),
             (acc, i) -> acc + ((v[i] - muv[i]) / sdv[i])
                             * ((v[i] - muv[i]) / sdv[i]))"""), 6))
      .select(col("label"), col("z2"))
    val fences = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("label")).orderBy(col("z2"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("label"))))
      .groupBy(col("label"))
      .agg(min(when(col("rn") === expr("(n - 1) * 95 div 100 + 1"),
        col("z2"))).as("fence"))
    scored.join(broadcast(fences), Seq("label"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vectors"),
        round(min(col("fence")), 6).as("p95_z2"),
        sum(when(col("z2") > col("fence"), 1L).otherwise(0L)).as("n_outliers"),
        round(max(col("z2")), 6).as("max_z2"),
      )
      .orderBy(col("label"))
  }

  /** Per-dimension embedding profile (mean/std/min/max for each of the
    * d dimensions) — the statistics pass behind feature normalization /
    * whitening and the first sanity check on a new embedding dump
    * (dead dimensions, scale drift). Same shape as [[labelCentroids]]:
    * posexplode then one partial+final hash agg keyed on dim — the
    * shuffle carries d accumulators per partition, never vectors.
    */
  def dimStats(spark: SparkSession, dir: String): DataFrame =
    embDouble(spark, dir)
      .select(posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("x")), 6).as("mean_val"),
        round(stddev_samp(col("x")), 4).as("std_val"),
        round(min(col("x")), 6).as("min_val"),
        round(max(col("x")), 6).as("max_val"),
      )
      .orderBy(col("dim"))

  /** One power-iteration step of PCA over the embeddings, as distributed
    * linear algebra on DataFrames: build the sample covariance matrix
    * C (d×d cells, one keyed aggregate over the [[dimCorr]] pair
    * fan-out — the shuffle carries per-cell moment sums, never vectors),
    * then multiply by the deterministic start vector v₀ = 1/√d·(1,…,1)
    * and report, per dimension, the resulting unnormalized component,
    * the normalized top-eigenvector estimate, and the Rayleigh-quotient
    * eigenvalue estimate ‖Cv₀‖ (v₀ unit). √d is exact in binary for
    * d a power of four (64 ⇒ ‖v₀‖ divides by exactly 8), so both
    * engines scale identically; nothing is rounded until the final
    * projection. The matvec is a second keyed aggregate (group the d²
    * cells by row index) — at 100 TB the iteration loop is
    * O(d²)-state, data passes once per step.
    */
  def pcaStep(spark: SparkSession, dir: String): DataFrame = {
    val x = embDouble(spark, dir)
      .select(col("vec_id"), posexplode(col("v")).as(Seq("dim", "x")))
      .localCheckpoint() // feeds both sides of the covariance pair join
    val a = x.select(col("vec_id"), col("dim").as("i"), col("x").as("xi"))
    val b = x.select(col("vec_id"), col("dim").as("j"), col("x").as("xj"))
    // full d×d moment table: c_ij = (S_ij − S_i·S_j/N) / (N−1)
    val cov = a.join(b, Seq("vec_id"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("xi") * col("xj")).as("sij"),
        sum(col("xi")).as("si"), sum(col("xj")).as("sj"),
        count(lit(1)).as("nn"))
      .withColumn("c",
        (col("sij") - col("si") * col("sj") / col("nn")) / (col("nn") - lit(1)))
    // y = C·v₀ with v₀ = (1/8,…,1/8): one row-keyed aggregate
    val y = cov.groupBy(col("i"))
      .agg((sum(col("c")) / lit(8.0)).as("y"))
      .localCheckpoint() // feeds the norm scalar AND the projection
    // ‖y‖: bounded d-element driver-side scalar, inlined as a literal
    // (the documented TF-IDF pattern — no 1-row BNLJ stage)
    val norm = math.sqrt(y.agg(sum(col("y") * col("y"))).head().getDouble(0))
    y.select(col("i").cast("int").as("dim"),
        round(col("y"), 6).as("cv0"),
        round(col("y") / lit(norm), 6).as("loading"),
        round(lit(norm), 6).as("eigval_est"))
      .orderBy(col("dim"))
  }

  /** Top correlated embedding-dimension pairs — the redundancy audit
    * behind feature pruning / whitening decisions ([[dimStats]] finds
    * dead dimensions; this finds duplicated ones). Every vector fans out
    * to its (dim, value) cells once; the pair stage is a self-equi-join
    * ON vec_id (each key meets exactly its own d cells — keyed fan-out,
    * no cross join), and Pearson r is one partial+final `corr`
    * aggregate per (i, j) cell pair, mergeable at scale. Ranking is on
    * the ROUNDED |r| (tie-break (i, j)) so cross-engine ulp drift in the
    * moment sums cannot reorder the top-k.
    */
  def dimCorr(spark: SparkSession, dir: String, topK: Int = 20): DataFrame = {
    val x = embDouble(spark, dir)
      .select(col("vec_id"), posexplode(col("v")).as(Seq("dim", "x")))
      .localCheckpoint() // feeds both sides of the pair join — one fan-out pass
    val a = x.select(col("vec_id"), col("dim").as("dim_i"), col("x").as("xi"))
    val b = x.select(col("vec_id"), col("dim").as("dim_j"), col("x").as("xj"))
    a.join(b, Seq("vec_id"))
      .filter(col("dim_i") < col("dim_j"))
      .groupBy(col("dim_i"), col("dim_j"))
      .agg(round(corr(col("xi"), col("xj")), 4).as("corr_val"),
        count(lit(1)).as("n"))
      .orderBy(abs(col("corr_val")).desc, col("dim_i"), col("dim_j"))
      .limit(topK)
  }

  /** One full Lloyd iteration of k-means over the embeddings —
    * assignment, update, and convergence diagnostics in a single job:
    * every vector goes to its nearest (squared-euclidean) centroid (the
    * first k vectors stand in for an init, deterministic like
    * [[ivfTopK]]), and each cell reports its size, its inertia
    * (Σ dist², the quantity Lloyd descends), and how far the updated
    * centroid moved. Distances expand to ‖v‖² + ‖c‖² − 2·v·c with the
    * per-VECTOR norms precomputed once, so the pairwise stage is one
    * native dot product per (vector, centroid) — and the oracle mirrors
    * that exact expression tree so both engines sum in the same order.
    * The centroid side is k constant rows (broadcast); the update is
    * the [[labelCentroids]] posexplode agg keyed on (cell, dim). At
    * scale the iteration loop would localCheckpoint per round like
    * GraphOps' connected components.
    */
  def kmeansStep(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val e = embDouble(spark, dir).withColumn("nv2", dot(col("v"), col("v")))
    // feeds the assignment join AND the shift comparison — one pass
    val centroids = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nv2").as("nc2"))
      .localCheckpoint()
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("dist2"), col("c_id"))
    // assignments feed the size/inertia agg AND the centroid update
    val assigned = e.join(broadcast(centroids), lit(true))
      .withColumn("dist2", round(
        col("nv2") + col("nc2") - lit(2.0) * dot(col("v"), col("cv")), 6))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("c_id").as("cell"), col("dist2"))
      .localCheckpoint()
    val sizes = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"), round(sum(col("dist2")), 6).as("inertia"))
    val newC = assigned
      .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim"))
      .agg(round(avg(col("x")), 6).as("mu"))
    val oldC = centroids
      .select(col("c_id").as("cell"), posexplode(col("cv")).as(Seq("dim", "cx")))
    val shifts = newC.join(oldC, Seq("cell", "dim"))
      .groupBy(col("cell"))
      .agg(round(sqrt(sum((col("mu") - col("cx")) * (col("mu") - col("cx")))), 6)
        .as("shift"))
    sizes.join(shifts, Seq("cell"))
      .select(col("cell"), col("n_vectors"), col("inertia"), col("shift"))
      .orderBy(col("cell"))
  }

  /** Multi-iteration Lloyd k-means — [[kmeansStep]] run to (near)
    * convergence, reporting per-iteration cell sizes and inertia so the
    * monotone descent is visible in the result itself. The iteration
    * protocol is built for cross-engine exactness AND scale: after each
    * update the centroids are QUANTIZED to 6 dp — the same
    * round-before-rank discipline every scorer here uses, applied
    * between iterations so floating-point summation-order drift can
    * never compound across steps — and fetched to the driver as a
    * bounded k×d scalar block (512 doubles; the documented TF-IDF
    * pattern, NOT an O(data) collect) to be re-broadcast as the next
    * step's constant side. Per iteration: one broadcast-join assignment
    * pass over a localCheckpoint'ed vector table (lineage cut like the
    * connected-components loop), one posexplode hash agg for the
    * update. Inertia is strictly non-increasing across iterations —
    * spec-pinned.
    */
  def kmeansIters(spark: SparkSession, dir: String,
      k: Int = 8, iters: Int = 3): DataFrame = {
    import spark.implicits._
    val e = embDouble(spark, dir)
      .withColumn("nv2", dot(col("v"), col("v")))
      .localCheckpoint() // scanned once, assigned every iteration
    var cents: Seq[(Long, Seq[Double])] = e.filter(col("vec_id") < k)
      .select(col("vec_id"), col("v")).collect().toSeq
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1)
    var out: Option[DataFrame] = None
    for (it <- 1 to iters) {
      val cdf = broadcast(cents.toDF("c_id", "cv")
        .withColumn("nc2", dot(col("cv"), col("cv"))))
      val wA = Window.partitionBy(col("vec_id")).orderBy(col("dist2"), col("c_id"))
      val assigned = e.join(cdf, lit(true))
        .withColumn("dist2", round(
          col("nv2") + col("nc2") - lit(2.0) * dot(col("v"), col("cv")), 6))
        .withColumn("rn", row_number().over(wA))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("v"), col("c_id").as("cell"), col("dist2"))
        .localCheckpoint() // feeds the iteration report AND the update
      val report = assigned.groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vectors"), round(sum(col("dist2")), 6).as("inertia"))
        .withColumn("iter", lit(it))
      out = Some(out.fold(report)(_.unionByName(report)))
      if (it < iters) {
        val mus = assigned
          .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy(col("cell"), col("dim"))
          .agg(round(avg(col("x")), 6).as("mu"))
          .collect() // bounded: k×d cells
          .groupBy(_.getLong(0))
          .map { case (c, rows) =>
            c -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
          }
        // an emptied cell keeps its previous centroid
        cents = cents.map { case (c, old) => c -> mus.getOrElse(c, old) }
      }
    }
    out.get
      .select(col("iter"), col("cell"), col("n_vectors"), col("inertia"))
      .orderBy(col("iter"), col("cell"))
  }

  /** LSH-bucketed near-neighbor candidates: bucket every vector by the
    * sign pattern of its first 8 dimensions (a fixed coarse random-
    * hyperplane surrogate), then count collisions per bucket. At scale
    * this is the shuffle-by-bucket pre-join that replaces the O(n²)
    * cross join.
    */
  def signBuckets(spark: SparkSession, dir: String): DataFrame =
    embDouble(spark, dir)
      .withColumn("bucket", bucketExpr)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"), min(col("vec_id")).as("min_vec_id"))
      .orderBy(col("bucket"))

  /** Product-quantization assignment — the compression half of the
    * IVF-PQ index ([[ivfTopK]] is the cell half): split each vector
    * into m = 8 contiguous subvectors and assign every subvector to its
    * nearest codeword from a per-subspace codebook (the first 8
    * vectors' subvectors — the same deterministic constant-bounded init
    * as [[kmeansStep]]). Output is the per-(subspace, codeword)
    * population and quantization error: the audit that says whether 64
    * floats compress to 8 code bytes without collapsing. The codebook
    * join is an EQUI join on (subspace, dim) against a constant-bounded
    * exploded codebook — no pairwise stage anywhere; assignment ranks
    * on the 6-dp-rounded distance with a codeword tie-break (the
    * round-before-rank discipline). */
  def pqAssign(spark: SparkSession, dir: String, m: Int = 8): DataFrame = {
    val d = Tables.embeddings(spark, dir)
      .select(size(col("embedding"))).head().getInt(0)
    val xi = embDouble(spark, dir)
      .select(col("vec_id"), posexplode(col("v")).as(Seq("i", "x")))
      .withColumn("sub", expr(s"i div ${d / m}"))
    val cb = xi.filter(col("vec_id") < 8)
      .select(col("vec_id").as("code"), col("sub"), col("i"), col("x").as("cx"))
      .localCheckpoint()
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("d2"), col("code"))
    xi.join(broadcast(cb), Seq("sub", "i"))
      .groupBy(col("vec_id"), col("sub"), col("code"))
      .agg(round(sum((col("x") - col("cx")) * (col("x") - col("cx"))), 6).as("d2"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .groupBy(col("sub"), col("code"))
      .agg(count(lit(1)).as("n_vectors"), round(sum(col("d2")), 6).as("sq_err"))
      .orderBy(col("sub"), col("code"))
  }

  /** Pairwise L2 and cosine distances between the k label centroids —
    * the cluster-geometry audit (which classes are confusable, is the
    * embedding space collapsing) read after every clustering or
    * fine-tune run. One corpus-scale centroid aggregate (posexplode +
    * partial/final hash agg, the [[labelCentroids]] pass), QUANTIZED to
    * 6 dp (the k-means handoff discipline, so both engines take the
    * distance of identical doubles), then a k²-row self-join on dim —
    * everything after the first aggregate is k·dims-bounded. */
  def centroidDistances(spark: SparkSession, dir: String): DataFrame = {
    val cent = embDouble(spark, dir)
      .select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(round(avg(col("x")), 6).as("mu"))
      .localCheckpoint()
    val a = cent.select(col("label").as("label_a"), col("dim"), col("mu").as("mua"))
    val b = cent.select(col("label").as("label_b"), col("dim"), col("mu").as("mub"))
    a.join(broadcast(b), Seq("dim"))
      .filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(
        round(sqrt(sum((col("mua") - col("mub")) * (col("mua") - col("mub")))), 6)
          .as("l2_dist"),
        round(sum(col("mua") * col("mub")) /
          (sqrt(sum(col("mua") * col("mua"))) * sqrt(sum(col("mub") * col("mub")))), 6)
          .as("cosine"))
      .orderBy(col("label_a"), col("label_b"))
  }

  /** Johnson–Lindenstrauss random projection to k = 16 dimensions with a
    * deterministic ±1 matrix (md5-parity of "i:j" — reproducible on any
    * engine, no stored matrix), plus the distortion audit: each vector's
    * projected squared norm over k·‖x‖² (E[yⱼ²] = ‖x‖² for ±1 signs, so
    * the expectation is exactly 1), which JL says concentrates near 1. This is the dimensionality-reduction step run
    * before clustering/ANN at scale — the projection is one broadcast
    * join (d·k sign rows) + a keyed partial aggregate, map-side
    * everywhere; projected coordinates are quantized at 6 dp before the
    * norm so both engines square identical doubles. */
  def jlProjection(spark: SparkSession, dir: String, k: Int = 16): DataFrame = {
    // embedding width from one row (bounded single-row fetch) so the
    // sign matrix covers every dimension whatever the dataset
    val d = Tables.embeddings(spark, dir)
      .select(size(col("embedding"))).head().getInt(0)
    // ±1 from the parity of the 4th hex digit of md5("i:j") — equals the
    // parity of the integer value of the first 4 digits, but is exactly
    // portable as a character test
    val signs = spark.range(d.toLong * k)
      .selectExpr(s"id DIV $k AS i", s"id % $k AS j")
      .withColumn("s",
        when(substring(md5(concat_ws(":", col("i"), col("j"))), 4, 1)
          .isin("1", "3", "5", "7", "9", "b", "d", "f"), lit(-1.0))
          .otherwise(lit(1.0)))
    val xi = embDouble(spark, dir)
      .select(col("vec_id"), posexplode(col("v")).as(Seq("i", "xv")))
    // the ratio divides the RAW sums: a quotient of two 6-dp-quantized
    // values can land exactly on a decimal half, where engine rounding
    // modes diverge — raw double sums make exact halves measure-zero
    val norms = xi.groupBy(col("vec_id"))
      .agg(sum(col("xv") * col("xv")).as("n2raw"))
    val proj = xi.join(broadcast(signs), Seq("i"))
      .groupBy(col("vec_id"), col("j"))
      .agg(round(sum(col("xv") * col("s")), 6).as("y"))
      .groupBy(col("vec_id"))
      .agg(sum(col("y") * col("y")).as("p2raw"))
    norms.join(proj, Seq("vec_id"))
      .select(col("vec_id"),
        round(col("n2raw"), 6).as("norm2"),
        round(col("p2raw"), 6).as("proj_norm2"),
        round(col("p2raw") / (lit(k.toDouble) * col("n2raw")), 6).as("ratio"))
      .orderBy(col("vec_id"))
  }

  /** SemDeDup-style semantic dedup over the embedding space (Abbas et
    * al. 2023, arXiv:2303.09540): cluster first, then search for
    * near-duplicates ONLY within a cluster — the pairwise stage is
    * cell-bounded instead of corpus-bounded, which is the whole reason
    * the method exists at 100 TB. Stages: (1) assign every vector to
    * its nearest centroid (deterministic first-8 init, the same
    * convention as [[ivfTopK]]); (2) within each cell, rank members by
    * vec_id and keep the first `cap` for the pairwise stage (the same
    * per-bucket cap discipline as the LSH band candidates — a
    * degenerate mega-cell costs at most cap²/2 pairs, and the cap is a
    * deterministic rank so the oracle reproduces it exactly); (3) score
    * within-cell pairs with exact cosine and keep those at or above the
    * rounded threshold; (4) contract the pair graph to clusters with
    * the O(log d)-round star algorithm; (5) per cluster keep ONE
    * representative — the member LEAST similar to its centroid
    * (SemDeDup's diversity-preserving choice: the most typical members
    * are the redundant ones), ties on vec_id. Output is the verdict
    * table for every vector that participates in a semantic-dup
    * cluster. Shuffle keys: cell for the pair stage, component for the
    * keep choice — nothing O(n) is broadcast (centroids are k rows).
    */
  def semDedup(spark: SparkSession, dir: String,
      threshold: Double = 0.3, cap: Int = 250): DataFrame = {
    val e = embNormed(spark, dir)
    val centroids = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nv").as("nc"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("c_id"))
    val assigned = e.join(broadcast(centroids), lit(true))
      .withColumn("c_cos", round(
        dot(col("v"), col("cv")) / (col("nv") * col("nc")), 6))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("nv"),
        col("c_id").as("cell"), col("c_cos").as("cent_cos"))
    val wCell = Window.partitionBy(col("cell")).orderBy(col("vec_id"))
    // localCheckpoint: the capped membership feeds both sides of the
    // pair join AND the verdict join — materialize once
    val capped = assigned.withColumn("crn", row_number().over(wCell))
      .filter(col("crn") <= cap).drop("crn")
      .localCheckpoint()
    val pairs = capped.select(col("cell"), col("vec_id").as("a_id"),
        col("v").as("av"), col("nv").as("na"))
      .join(capped.select(col("cell"), col("vec_id").as("b_id"),
        col("v").as("bv"), col("nv").as("nb")), Seq("cell"))
      .filter(col("b_id") > col("a_id"))
      .withColumn("cosine", round(
        dot(col("av"), col("bv")) / (col("na") * col("nb")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"))
    val comps = GraphOps.connectedComponentsStar(pairs, "a_id", "b_id")
    val members = comps.join(
      capped.select(col("vec_id").as("node"), col("cell"), col("cent_cos")),
      Seq("node"))
    val wKeep = Window.partitionBy(col("component"))
      .orderBy(col("cent_cos").asc, col("node"))
    members.withColumn("krn", row_number().over(wKeep))
      .select(col("component").as("cluster"), col("node").as("vec_id"),
        col("cell"), col("cent_cos"), (col("krn") === 1).cast("int").as("keep"))
      .orderBy(col("cluster"), col("vec_id"))
  }
}
