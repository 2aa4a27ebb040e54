package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Near-duplicate detection for training-data pipelines: MinHash,
  * SimHash, and n-gram Jaccard. All signature computation is per-row
  * higher-order-function Column algebra (transform/aggregate/array_min)
  * — embarrassingly parallel, no shuffle until the final (tiny) signature
  * group-by, which is exactly the shape that scales: at 100 TB the
  * signatures (bytes per doc) shuffle, never the documents.
  *
  * Hashes are md5-hex based so the DuckDB oracle computes bit-identical
  * signatures (Spark murmur3 `hash()` has no DuckDB twin).
  */
object DedupOps {

  /** Distinct non-empty whitespace tokens as an array column. */
  private def tokensCol = array_remove(array_distinct(split(col("text"), " ")), "")

  /** MinHash signature computation without the presentation sort —
    * the md5 fan-out dominates, so the scan is spread across all cores
    * first. */
  private def signatures(spark: SparkSession, dir: String): DataFrame =
    Tables.fanOut(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .withColumn("tokens", tokensCol)
      .withColumn("signature", expr(
        """concat_ws(',', transform(sequence(0, 7), i ->
             substring(array_min(transform(tokens, t ->
               md5(concat(cast(i AS string), '|', t)))), 1, 8)))"""))
      .select(col("doc_id"), col("signature"))

  /** MinHash signature, k=8 permutations approximated by seed-prefixed
    * md5: sig_i = min over tokens of md5(i || '|' || token), first 8 hex
    * chars kept. Docs sharing a full signature are near-dup candidates
    * (the LSH band-bucket join is this group-by on signature prefixes).
    */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    signatures(spark, dir).orderBy(col("doc_id"))

  /** LSH band join on the MinHash signature: 4 bands of 2 minhashes;
    * docs colliding in any band are candidate pairs. Output is the
    * bucket census (band, bucket, n_docs) for buckets with >1 doc.
    */
  def minhashBands(spark: SparkSession, dir: String): DataFrame =
    signatures(spark, dir)
      .withColumn("bands", expr(
        """transform(sequence(0, 3), b -> struct(b AS band,
             concat(element_at(split(signature, ','), b * 2 + 1), '|',
                    element_at(split(signature, ','), b * 2 + 2)) AS bucket))"""))
      // explode_outer, deliberately: bands is always length 4, and the
      // non-outer form makes InferFiltersFromGenerate add a size(bands)>0
      // filter that Catalyst pushes below the fan-out exchange — where it
      // re-evaluates the whole minhash expression single-threaded. The
      // outer generator is exempt from that rule and semantically
      // identical here.
      .select(col("doc_id"), explode_outer(col("bands")).as("bb"))
      .groupBy(col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc_id"))
      .filter(col("n_docs") > 1)
      .orderBy(col("band"), col("bucket"))

  /** 32-bit SimHash from md5 hex digits: bit j is the sign of the sum
    * over tokens of ±1 by the high bit of hex digit j of md5(token).
    */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    Tables.fanOut(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .withColumn("tokens", tokensCol)
      .withColumn("simhash", expr(
        """concat_ws('', transform(sequence(0, 31), j ->
             CASE WHEN aggregate(tokens, 0, (acc, t) -> acc +
               (CASE WHEN substring(md5(t), j + 1, 1) IN ('8','9','a','b','c','d','e','f')
                     THEN 1 ELSE -1 END)) > 0
             THEN '1' ELSE '0' END))"""))
      .select(col("doc_id"), col("simhash"))
      .orderBy(col("doc_id"))

  /** Word-bigram Jaccard similarity, sampled pairs (every-50th doc as the
    * left side vs all later docs). DELIBERATELY the small-scale
    * brute-force oracle twin for the Jaccard math; at scale, candidate
    * pairs come from a bucket pre-join (minhashBands collisions /
    * SimilarityOps.bucketedNearDup shape) and exact Jaccard runs only
    * within buckets. NOTE the synthetic corpus makes full band-join
    * pair enumeration degenerate (shuffled-word duplicates collapse
    * minhash buckets — see MlOps.tokensetDedup for the fingerprint
    * formulation that handles exactly that case with no pair stage).
    * inter/union via distinct-array algebra; union = |A|+|B|-|A∩B| so
    * no cross-system array ordering matters.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.fanOut(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .withColumn("toks", split(col("text"), " "))
      .withColumn("grams", expr(
        """CASE WHEN size(toks) < 2 THEN array()
           ELSE array_distinct(transform(sequence(1, size(toks) - 1), i ->
             concat(element_at(toks, i), ' ', element_at(toks, i + 1)))) END"""))
      .select(col("doc_id"), col("grams"))
    val left = grams.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("a_id"), col("grams").as("a_grams"))
    val pairs = grams
      .join(broadcast(left), col("doc_id") > col("a_id"))
      .withColumn("inter", size(array_intersect(col("a_grams"), col("grams"))))
      .withColumn("uni", size(col("a_grams")) + size(col("grams")) - col("inter"))
    pairs
      .select(
        col("a_id"), col("doc_id").as("b_id"),
        round(col("inter") / when(col("uni") === 0, 1).otherwise(col("uni")), 6)
          .as("jaccard"),
      )
      .orderBy(col("a_id"), col("b_id"))
  }
}
