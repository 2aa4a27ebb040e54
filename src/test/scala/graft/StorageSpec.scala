package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layer posture: bucketed co-located joins (the 100-TB shuffle
  * eliminator) and csv/json source round-trips. */
class StorageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val dir = SparkTestSession.sf0001
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    orders.write.mode("overwrite")
      .bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bucketed")
    customer.write.mode("overwrite")
      .bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so bucketing is what avoids the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() === 1500)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }

  test("partitioned parquet writes prune partitions at read time") {
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val base = Files.createTempDirectory("partitioned").toString
    docs.write.mode("overwrite").partitionBy("lang").parquet(s"$base/docs")
    val wanted = docs.filter(col("lang") === "en").count()
    val read = spark.read.parquet(s"$base/docs").filter(col("lang") === "en")
    val plan = read.queryExecution.executedPlan.toString
    // the lang predicate must become a partition filter on the scan (no
    // data read from other lang dirs), not a post-scan row filter —
    // "PartitionFilters: []" would print even without pruning, so match
    // the lang predicate INSIDE the bracket list
    assert("PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(plan).isDefined,
      s"no partition pruning:\n$plan")
    assert(read.count() === wanted)
  }

  test("dynamic partition overwrite replaces only the written partitions") {
    val base = Files.createTempDirectory("dynpart").toString + "/t"
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      Seq((1L, "en", 10), (2L, "es", 20))
        .toDF("doc_id", "lang", "n").write
        .mode("overwrite").partitionBy("lang").parquet(base)
      // incremental backfill: rewrite ONLY lang=en; es must survive
      Seq((9L, "en", 99)).toDF("doc_id", "lang", "n").write
        .mode("overwrite").partitionBy("lang").parquet(base)
      val got = spark.read.parquet(base)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"))).toSet
      assert(got === Set((9L, "en"), (2L, "es")),
        "dynamic overwrite must not clobber untouched partitions")
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }

  test("maxRecordsPerFile shards the corpus write into bounded training shards") {
    // Training readers want many bounded shards, not one file per task:
    // the writer must split a partition's output at the record cap.
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
      .coalesce(1) // worst case: all rows arrive at ONE write task
    val base = Files.createTempDirectory("shards").toString + "/corpus"
    docs.write.mode("overwrite")
      .option("maxRecordsPerFile", 20)
      .parquet(base)
    val files = new java.io.File(base).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val total = docs.count()
    assert(files.length >= (total / 20).toInt,
      s"expected >= ${total / 20} shards for $total rows, got ${files.length}")
    assert(spark.read.parquet(base).count() === total)
  }

  test("csv and json sinks round-trip the documents sample") {
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val base = Files.createTempDirectory("roundtrip").toString
    docs.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    docs.write.mode("overwrite").json(s"$base/json")
    val backCsv = spark.read.option("header", "true")
      .schema(docs.schema).csv(s"$base/csv")
    val backJson = spark.read.schema(docs.schema).json(s"$base/json")
    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("doc_id") * col("n_chars"))).head().getLong(0)
    assert(backCsv.count() === docs.count())
    assert(backJson.count() === docs.count())
    assert(checksum(backCsv) === checksum(docs))
    assert(checksum(backJson) === checksum(docs))
  }

  test("orc sink round-trips with predicate pushdown at the scan") {
    // ORC is the second columnar interchange format a Spark shop meets
    // (Hive estates); the engine must read/write it with the same
    // pushdown behavior it gets from parquet.
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val base = Files.createTempDirectory("orc").toString
    docs.write.mode("overwrite").option("compression", "zlib").orc(s"$base/docs")
    val back = spark.read.orc(s"$base/docs")
    assert(back.count() === docs.count())
    assert(back.agg(sum(col("doc_id") * col("n_chars"))).head().getLong(0)
      === docs.agg(sum(col("doc_id") * col("n_chars"))).head().getLong(0))
    val filtered = back.filter(col("n_chars") > 300).select(col("doc_id"))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,300)"),
      s"filter not pushed to the ORC scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"),
      s"columns not pruned at the ORC scan:\n$plan")
  }
}
