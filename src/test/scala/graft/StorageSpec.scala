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

  test("corrupt JSON records quarantine under PERMISSIVE and abort under FAILFAST") {
    // Real feeds ship malformed lines; at 100 TB the ingest job must
    // split them into a quarantine table and keep going, not die at row
    // three — and a schema-contract job must be able to demand FAILFAST.
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("quarantine").toString
    Files.writeString(java.nio.file.Paths.get(s"$base/feed.json"),
      """{"id": 1, "lang": "en"}
        |{"id": 2 "lang": "de"}
        |{"id": 3, "lang": "fr"}
        |not json at all
        |{"id": 5, "lang": "es"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("lang", StringType),
      StructField("_corrupt_record", StringType)))
    val read = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$base/feed.json")
      .localCheckpoint() // corrupt-column queries need the materialized frame
    val good = read.filter(col("_corrupt_record").isNull)
    val quarantine = read.filter(col("_corrupt_record").isNotNull)
    assert(good.count() === 3)
    assert(good.select(sum(col("id"))).head().getLong(0) === 1L + 3L + 5L)
    assert(quarantine.count() === 2)
    // the quarantine row carries the raw line for replay/debugging
    assert(quarantine.select(col("_corrupt_record")).collect()
      .exists(_.getString(0).contains("not json at all")))
    val failfast = spark.read
      .schema(StructType(schema.dropRight(1)))
      .option("mode", "FAILFAST")
      .json(s"$base/feed.json")
    val err = intercept[org.apache.spark.SparkException] { failfast.collect() }
    assert(err.getMessage.contains("MALFORMED_RECORD_IN_PARSING")
      || String.valueOf(err.getCause).contains("Malformed"),
      s"FAILFAST did not surface the malformed record: ${err.getMessage}")
  }

  test("parquet schema evolution: mergeSchema unions column sets across file generations") {
    // A long-lived lake table gains columns over time; readers must see
    // the union with nulls backfilled, without rewriting old files.
    val base = Files.createTempDirectory("evolve").toString
    Seq((1L, "en")).toDF("doc_id", "lang")
      .write.mode("overwrite").parquet(s"$base/t/gen=1")
    Seq((2L, "de", 0.9)).toDF("doc_id", "lang", "quality")
      .write.mode("overwrite").parquet(s"$base/t/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$base/t")
    assert(merged.columns.toSet === Set("doc_id", "lang", "quality", "gen"))
    val rows = merged.orderBy(col("doc_id")).collect()
    assert(rows.length === 2)
    assert(rows(0).isNullAt(rows(0).fieldIndex("quality"))) // backfilled null
    assert(rows(1).getDouble(rows(1).fieldIndex("quality")) === 0.9)
  }

  test("a medium dim joins via shuffled-hash when hinted, skipping both sorts") {
    // The third join strategy beside broadcast (tiny side) and sort-merge
    // (both huge): when one side fits a per-task hash map but is too big
    // to broadcast, SHUFFLE_HASH exchanges both sides yet builds a hash
    // map instead of sorting 2 × 100 TB — the sorts ARE the cost at
    // scale. The hint is how a pipeline pins it; the plan assert is what
    // keeps it pinned.
    val dir = SparkTestSession.sf0001
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val customer = spark.read.parquet(s"$dir/customer.parquet")
      val joined = orders.join(customer.hint("shuffle_hash"),
        col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("ShuffledHashJoin"),
        s"shuffle_hash hint did not select a hash join:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"unexpected sort-merge:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
