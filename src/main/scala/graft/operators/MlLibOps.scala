package graft.operators

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, Tokenizer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib-backed near-dup detection: the documented 100-TB path for ML-4
  * (SURVEY.md §2.11). Where graft's own md5 MinHash (DedupOps) is
  * oracle-checkable, this is the battle-tested library variant:
  * tokens → binary term vectors (HashingTF) → MinHashLSH (seeded, so
  * deterministic) → approxSimilarityJoin, which blocks candidate pairs by
  * LSH bucket instead of the O(n²) cross join.
  */
object MlLibOps {

  /** Near-duplicate pairs with Jaccard distance below `maxDistance`.
    * Deterministic for a fixed seed, but hash-function internals are
    * implementation-specific, so this is test-verified (known planted
    * duplicates) rather than DuckDB-oracle'd.
    */
  def minhashLshPairs(docs: DataFrame, maxDistance: Double = 0.4): DataFrame = {
    val tokenized = new Tokenizer()
      .setInputCol("text").setOutputCol("words")
      .transform(docs)
    val vectorized = new HashingTF()
      .setInputCol("words").setOutputCol("features")
      .setBinary(true).setNumFeatures(1 << 16)
      .transform(tokenized)
    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setSeed(42L).setNumHashTables(4)
    val model = lsh.fit(vectorized)
    model.approxSimilarityJoin(vectorized, vectorized, maxDistance, "jaccard_dist")
      .select(
        col("datasetA.doc_id").as("a_id"),
        col("datasetB.doc_id").as("b_id"),
        round(col("jaccard_dist"), 6).as("jaccard_dist"),
      )
      .filter(col("a_id") < col("b_id"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** MLlib FP-Growth over the per-order part baskets — the library
    * scale path for association mining, beside [[graft.operators.MlOps.assocRules]]'
    * oracle-checked pair-join formulation the way [[minhashLshPairs]]
    * sits beside the md5 MinHash: FP-Growth mines ALL frequent itemsets
    * (not just pairs) from a compressed prefix tree, the right tool
    * once itemsets beyond size 2 matter. Deterministic (counts are
    * exact), but the itemset enumeration order is implementation-
    * specific, so this is test-verified against the exact pair counts
    * rather than DuckDB-oracle'd.
    */
  def fpGrowthItemsets(baskets: DataFrame, minSupport: Double): DataFrame = {
    val grouped = baskets
      .groupBy(col("o"))
      .agg(collect_set(col("item")).as("items"))
    val model = new org.apache.spark.ml.fpm.FPGrowth()
      .setItemsCol("items").setMinSupport(minSupport).setMinConfidence(0.0)
      .fit(grouped)
    model.freqItemsets
      .select(
        concat_ws(",",
          transform(sort_array(col("items")), x => x.cast("string"))).as("itemset"),
        size(col("items")).as("n_items"), col("freq"))
      .orderBy(col("freq").desc, col("itemset"))
  }
}
