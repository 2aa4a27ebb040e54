package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VersionedTable

/** The commit-log streaming source: version-as-offset tailing, schema
  * from the parquet footer, checkpointed resume that serves each commit
  * exactly once. */
class VersionedStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString

  private def stream(root: String) = spark.readStream
    .format("graft.sources.VersionedStreamProvider")
    .option("path", root).load()

  test("schema comes from the footer; appended commits arrive as batches") {
    val root = freshDir("vstream")
    val t = new VersionedTable(root)
    t.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.append(spark, Seq((3L, "c")).toDF("id", "v"))

    val df = stream(root)
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Seq(("id", LongType), ("v", StringType)))

    val q = df.writeStream.format("memory").queryName("vs1")
      .option("checkpointLocation", freshDir("vs1ck"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("vs1").as[(Long, String)].collect().sorted ===
      Array((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("checkpointed restart serves only commits after the stored version") {
    val root = freshDir("vstream2")
    val ck = freshDir("vs2ck")
    val out = freshDir("vs2out")
    val t = new VersionedTable(root)
    t.append(spark, Seq((1L, "a")).toDF("id", "v"))

    // the memory sink cannot recover a checkpoint, so exactly-once
    // shows up on a file sink: across a restart no commit is re-served
    def drain(): Unit = {
      val q = stream(root).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).count() === 1)

    // two more commits while the consumer is down; an overwrite's ADD
    // side streams (the re-frozen rows), its removes do not
    t.append(spark, Seq((2L, "b")).toDF("id", "v"))
    t.overwrite(spark, Seq((9L, "z")).toDF("id", "v"))

    drain()
    assert(spark.read.parquet(out).as[(Long, String)].collect().sorted ===
      Array((1L, "a"), (2L, "b"), (9L, "z")),
      "resume must serve exactly the unseen commits, never re-serve v0")
  }

  test("full lake loop: stream in via appendBatch, stream out via the log tail") {
    implicit val sc = spark.sqlContext
    val root = freshDir("vloop")
    val t = new VersionedTable(root)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]

    // producer leg: micro-batches land as exactly-once commits
    val ingest = input.toDF().writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        t.appendBatch(spark, b, id); ()
      }
      .option("checkpointLocation", freshDir("vloop-ick"))
      .outputMode("append").start()
    try {
      input.addData(1, 2, 3)
      ingest.processAllAvailable()
      input.addData(4, 5)
      ingest.processAllAvailable()
    } finally ingest.stop()

    // consumer leg: tail the commit log the producer just wrote
    val q = stream(root).writeStream.format("memory").queryName("vloop")
      .option("checkpointLocation", freshDir("vloop-ock"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("vloop").as[Int].collect().sorted === Array(1, 2, 3, 4, 5),
      "every ingested micro-batch must round-trip through the table exactly once")
  }

  test("batch face: versionAsOf, zone-map file skipping, physical column pruning") {
    import org.apache.spark.sql.functions._
    val root = freshDir("vbatch")
    val t = new VersionedTable(root)
    // three single-file commits with disjoint id ranges + footer stats
    Seq((0L, 50L), (50L, 100L), (100L, 150L)).foreach { case (lo, hi) =>
      t.append(spark,
        spark.range(lo, hi).toDF("id")
          .withColumn("v", concat(lit("r"), col("id").cast("string")))
          .repartition(1),
        statsCol = Some("id"))
    }
    def batch(opts: (String, String)*) = {
      val r = spark.read.format("graft.sources.VersionedStreamProvider")
        .option("path", root)
      opts.foldLeft(r) { case (b, (k, x)) => b.option(k, x) }.load()
    }

    assert(batch().count() === 150, "count(*) reads only footers, still exact")
    assert(batch("versionAsOf" -> "0").select("id").as[Long].collect().sorted
      === (0L until 50L).toArray, "time travel through the batch face")

    // a pushed comparison must open ONE of the three files
    val hit = batch().filter(col("id") === 120L)
    assert(hit.rdd.getNumPartitions === 1, "zone maps did not skip files")
    assert(hit.select("v").as[String].collect() === Array("r120"))
    assert(batch().rdd.getNumPartitions === 3, "unfiltered scan reads all files")

    // projection reordered vs file order exercises the positional map
    assert(batch().select("v", "id").where(col("id") === 7L)
      .as[(String, Long)].collect() === Array(("r7", 7L)))
  }

  test("DSv2 write: tasks stage their files, the driver commits ONCE") {
    import org.apache.spark.sql.functions._
    val root = freshDir("vwrite")
    def write(df: org.apache.spark.sql.DataFrame, mode: String): Unit =
      df.write.format("graft.sources.VersionedStreamProvider")
        .option("path", root).option("statsCol", "id").mode(mode).save()

    write(spark.range(0L, 100L).toDF("id")
      .withColumn("v", concat(lit("w"), col("id").cast("string")))
      .repartition(4), "append")
    val t = new VersionedTable(root)
    assert(t.version === 0L, "4 task files, ONE commit")
    assert(t.read(spark).count() === 100)
    val stats = t.filesWithStatsAt(0L).flatMap(_._2)
    assert(stats.nonEmpty && stats.forall(_._1 == "id"),
      "zone maps harvested during the task writes")

    write(spark.range(100L, 120L).toDF("id").withColumn("v", lit("x")), "append")
    assert(t.read(spark).count() === 120)

    write(spark.range(0L, 7L).toDF("id").withColumn("v", lit("z")), "overwrite")
    assert(t.read(spark).count() === 7)
    assert(t.history.map(_._2) === Seq("append", "append", "overwrite"))
    assert(t.readAsOf(spark, 1L).count() === 120,
      "time travel must survive the truncating write")

    // full DSv2 round trip: written by the provider, read by the provider
    assert(spark.read.format("graft.sources.VersionedStreamProvider")
      .option("path", root).load().count() === 7)
  }

  test("DSv2 streaming sink: epochs land exactly once through the batch ledger") {
    implicit val sc = spark.sqlContext
    val root = freshDir("vsink")
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    val q = input.toDF().writeStream
      .format("graft.sources.VersionedStreamProvider")
      .option("path", root)
      .option("checkpointLocation", freshDir("vsink-ck"))
      .outputMode("append").start()
    try {
      input.addData(1, 2, 3)
      q.processAllAvailable()
      input.addData(4, 5)
      q.processAllAvailable()
    } finally q.stop()
    val t = new VersionedTable(root)
    assert(t.read(spark).as[Int].collect().sorted === Array(1, 2, 3, 4, 5))
    assert(t.committedBatchIds === Set(0L, 1L),
      "each epoch is one ledgered commit — replays would be dropped")
  }

  test("startingVersion skips history; vacuumed windows fail loudly") {
    val root = freshDir("vstream3")
    val t = new VersionedTable(root)
    t.append(spark, Seq((1L, "a")).toDF("id", "v"))
    t.append(spark, Seq((2L, "b")).toDF("id", "v"))

    val q = spark.readStream
      .format("graft.sources.VersionedStreamProvider")
      .option("path", root).option("startingVersion", "1").load()
      .writeStream.format("memory").queryName("vs3")
      .option("checkpointLocation", freshDir("vs3ck"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("vs3").as[(Long, String)].collect() === Array((2L, "b")))

    // end v0's time travel, then ask for its window
    t.overwrite(spark, Seq((9L, "z")).toDF("id", "v"))
    t.vacuum(keepFrom = 2L)
    assertThrows[IllegalArgumentException](t.filesAddedAt(0L))
  }

  test("a restore replays its re-referenced files to log-tailing consumers") {
    // append-mode CDF semantics (the public Delta behavior): a RESTORE
    // commit re-ADDS the rolled-back files, so a downstream consumer
    // tailing the log sees those rows again — by design, since its view
    // must converge to the restored table state. Consumers that resumed
    // BEFORE the restore already hold the bad window; the replay is what
    // lets an idempotent sink (keyed upsert) settle on the target rows.
    val root = freshDir("vstream-restore")
    val t = new VersionedTable(root)
    t.append(spark, Seq((1L, "good")).toDF("id", "v"))   // v0
    t.overwrite(spark, Seq((2L, "bad")).toDF("id", "v")) // v1
    val rv = t.restore(spark, 0L)                        // v2: re-adds v0's file
    assert(rv === 2L)
    assert(t.filesAddedAt(rv) === t.filesAt(0L),
      "the restore commit's adds are v0's files by reference")

    // a consumer starting AT the restore version serves exactly the
    // restored snapshot — one batch, the re-referenced rows
    val q = spark.readStream
      .format("graft.sources.VersionedStreamProvider")
      .option("path", root).option("startingVersion", rv.toString).load()
      .writeStream.format("memory").queryName("vsr")
      .option("checkpointLocation", freshDir("vsrck"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("vsr").as[(Long, String)].collect() === Array((1L, "good")))
  }

  test("admission control: ReadLimit caps the commits claimed per batch") {
    import graft.sources.{VersionOffset, VersionedMicroBatchStream}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val root = freshDir("vstream-rl")
    val t = new VersionedTable(root)
    // 3 commits × 1 file × 100 rows
    (0 until 3).foreach(i => t.append(spark,
      spark.range(i * 100L, (i + 1) * 100L).toDF("id").repartition(1)))

    val s = new VersionedMicroBatchStream(root, 0L, None, None, None,
      changeFeed = false, failOnDataLoss = true, t.read(spark).schema)
    def latest(from: Long, l: ReadLimit): Long =
      s.latestOffset(VersionOffset(from), l).asInstanceOf[VersionOffset].v

    assert(latest(-1, ReadLimit.allAvailable()) === 2)
    assert(latest(-1, ReadLimit.maxFiles(1)) === 0)
    assert(latest(-1, ReadLimit.maxFiles(2)) === 1)
    assert(latest(0, ReadLimit.maxFiles(2)) === 2, "the cap slides with start")
    // the rows budget comes from footer metadata: 100 per commit
    assert(latest(-1, ReadLimit.maxRows(150)) === 0)
    assert(latest(-1, ReadLimit.maxRows(200)) === 1)
    // a commit is the atomic publication unit: the first outstanding one
    // is admitted whole even when it alone overflows the budget
    assert(latest(-1, ReadLimit.maxRows(10)) === 0)
    assert(latest(-1, ReadLimit.compositeLimit(
      Array(ReadLimit.maxFiles(3), ReadLimit.maxRows(150)))) === 0,
      "a composite limit admits the intersection")
    // nothing outstanding → the offset holds still
    assert(latest(2, ReadLimit.maxFiles(1)) === 2)
  }

  test("changeFeed streams MoR deletes as tagged rows; absent without the option") {
    val root = freshDir("vstream-cdc")
    val t = new VersionedTable(root)
    t.append(spark, spark.range(0, 30).toDF("id").repartition(2))  // v0
    t.deleteRowsWhere(spark, "id % 10 = 3")                        // v1: 3,13,23
    t.deleteRowsWhere(spark, "id % 10 = 7")                        // v2: 7,17,27

    // default contract unchanged: the delete windows serve NOTHING and
    // there is no _change_type column
    val plain = stream(root)
    assert(!plain.schema.fieldNames.contains("_change_type"))
    val q0 = plain.writeStream.format("memory").queryName("vcdc0")
      .option("checkpointLocation", freshDir("vcdc0ck"))
      .trigger(Trigger.AvailableNow()).start()
    q0.awaitTermination()
    assert(spark.table("vcdc0").count() === 30,
      "without changeFeed the MoR delete windows must stay invisible")

    // with the option: inserts for v0, and each delete window serves
    // exactly ITS vector growth (the v2 window diffs against v1's
    // sidecar — never re-serves v1's positions)
    val cdc = spark.readStream.format("graft.sources.VersionedStreamProvider")
      .option("path", root).option("changeFeed", "true").load()
    assert(cdc.schema.fieldNames.takeRight(2) ===
      Array("_change_type", "_commit_version"))
    val q1 = cdc.writeStream.format("memory").queryName("vcdc1")
      .option("checkpointLocation", freshDir("vcdc1ck"))
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()
    val rows = spark.table("vcdc1").as[(Long, String, Long)].collect()
    assert(rows.count(_._2 == "insert") === 30)
    assert(rows.filter(_._2 == "insert").forall(_._3 == 0L),
      "inserts carry their commit version")
    val deletes = rows.filter(_._2 == "delete").map(_._1).sorted
    assert(deletes === Array(3L, 7L, 13L, 17L, 23L, 27L),
      "each deleted row surfaces exactly once across the two windows")
    // _commit_version orders the feed: v1's deletes vs v2's
    assert(rows.filter(r => r._2 == "delete" && r._3 == 1L).map(_._1).sorted ===
      Array(3L, 13L, 23L))
    assert(rows.filter(r => r._2 == "delete" && r._3 == 2L).map(_._1).sorted ===
      Array(7L, 17L, 27L))

    // an aggregate that projects ONLY the tag column still counts right
    // (the footer-count path must honor include-mode cardinality)
    val q2 = spark.readStream.format("graft.sources.VersionedStreamProvider")
      .option("path", root).option("changeFeed", "true").load()
      .select("_change_type")
      .writeStream.format("memory").queryName("vcdc2")
      .option("checkpointLocation", freshDir("vcdc2ck"))
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.table("vcdc2").as[String].collect()
      .count(_ == "delete") === 6)

    // changeFeed is a streaming option: the batch face refuses it
    val ex = intercept[Exception] {
      spark.read.format("graft.sources.VersionedStreamProvider")
        .option("path", root).option("changeFeed", "true").load().count()
    }
    assert(ex.getMessage.contains("changeFeed") ||
      Option(ex.getCause).exists(_.getMessage.contains("changeFeed")))
  }

  test("changeFeed serves file-CDC for rewrite commits; maintenance is invisible") {
    val root = freshDir("vstream-cdc2")
    val t = new VersionedTable(root)
    t.append(spark, spark.range(0, 20).toDF("id").repartition(1),
      statsCol = Some("id"))             // v0: 20 inserts
    t.deleteWhere(spark, "id", 5L, 9L)   // v1: CoW rewrite of the one file
    t.compact(spark, targetFiles = 1)    // v2: maintenance — must serve NOTHING
    val q = spark.readStream.format("graft.sources.VersionedStreamProvider")
      .option("path", root).option("changeFeed", "true").load()
      .writeStream.format("memory").queryName("vcdc3")
      .option("checkpointLocation", freshDir("vcdc3ck"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("vcdc3").as[(Long, String, Long)].collect()
    // v1 is file-CDC: the removed file's 20 rows surface as deletes,
    // the rewritten survivors (15) as inserts — carried rows on both
    // sides, the changesBetween contract; v2 contributes zero rows
    assert(rows.count(_._2 == "insert") === 35)
    assert(rows.filter(_._2 == "delete").map(_._1).sorted ===
      (0L until 20L).toArray)
    assert(rows.forall(_._3 < 2L), "the maintenance commit v2 serves nothing")
    assert(rows.count(_._3 == 1L) === 35, "v1's file-CDC = 20 deletes + 15 inserts")
    // consumer-side reconciliation nets out to exactly the head state
    val net = rows.groupBy(_._1).view.mapValues(rs =>
      rs.count(_._2 == "insert") - rs.count(_._2 == "delete")).toMap
    assert(net.filter(_._2 > 0).keys.toSeq.sorted ===
      t.read(spark).select("id").as[Long].collect().sorted)

    // the CDC tag column name is RESERVED under the option
    val t2 = new VersionedTable(freshDir("vstream-cdc3"))
    t2.append(spark, Seq((1L, "x")).toDF("id", "_change_type"))
    val ex = intercept[Exception] {
      spark.readStream.format("graft.sources.VersionedStreamProvider")
        .option("path", t2.root).option("changeFeed", "true").load()
    }
    assert(ex.getMessage.contains("_change_type") ||
      Option(ex.getCause).exists(_.getMessage.contains("_change_type")))
  }

  test("include-mode reader stays correct across multiple row groups") {
    // a small parquet block size forces several row groups per file —
    // the shape where the grown-position reader's group skipping must
    // still deliver exactly the wanted rows
    val hc = spark.sparkContext.hadoopConfiguration
    val old = Option(hc.get("parquet.block.size"))
    hc.set("parquet.block.size", (64 * 1024).toString)
    val root = try {
      val r = freshDir("vstream-cdcrg")
      val t = new VersionedTable(r)
      t.append(spark, spark.range(0, 200000).toDF("id").repartition(1))
      t.deleteRowsWhere(spark, "id = 123 OR id = 199999")
      r
    } finally old match {
      case Some(v) => hc.set("parquet.block.size", v)
      case None => hc.unset("parquet.block.size")
    }
    val file = new VersionedTable(root).filesAt(0L).head
    val pr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file),
        new org.apache.hadoop.conf.Configuration()))
    val nGroups = try pr.getFooter.getBlocks.size finally pr.close()
    assert(nGroups > 1, s"need a multi-row-group file, got $nGroups group(s)")
    val q = spark.readStream.format("graft.sources.VersionedStreamProvider")
      .option("path", root).option("changeFeed", "true").load()
      .writeStream.format("memory").queryName("vcdcrg")
      .option("checkpointLocation", freshDir("vcdcrgck"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("vcdcrg").as[(Long, String, Long)].collect()
    assert(rows.count(_._2 == "insert") === 200000)
    assert(rows.filter(_._2 == "delete").map(_._1).sorted ===
      Array(123L, 199999L),
      "group skipping must still surface exactly the grown positions")
  }

  test("the batch scan reports PRUNED statistics to the planner") {
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val root = freshDir("vstream-stats")
    val t = new VersionedTable(root)
    // a tiny file [0, 9] and a big file [1000, 100999], zone maps on id
    t.append(spark, spark.range(0, 10).toDF("id").repartition(1),
      statsCol = Some("id"))
    t.append(spark, spark.range(1000, 101000).toDF("id").repartition(1),
      statsCol = Some("id"))
    def statsOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case r: DataSourceV2ScanRelation => r.computeStats()
      }.head
    val dsv2 = spark.read.format("graft.sources.VersionedStreamProvider")
      .option("path", root).load()
    val full = statsOf(dsv2)
    val pruned = statsOf(dsv2.filter("id < 100"))
    // the pruned probe reports ONE small file, not the table
    assert(pruned.sizeInBytes < full.sizeInBytes / 10,
      s"pruned=${pruned.sizeInBytes} full=${full.sizeInBytes}")
    // row counts are exact from the recorded footer rows
    assert(full.rowCount.contains(BigInt(100010)))
    assert(pruned.rowCount.contains(BigInt(10)))
    // ...and a MoR delete's vector cardinality is subtracted
    t.deleteRowsWhere(spark, "id < 5")
    val afterDv = statsOf(spark.read
      .format("graft.sources.VersionedStreamProvider")
      .option("path", root).load().filter("id < 100"))
    assert(afterDv.rowCount.contains(BigInt(5)))
    // the payoff: a selective probe joined against a big frame is
    // AUTO-broadcast — no hint — because the scan's reported size sits
    // under the broadcast threshold
    val big = spark.range(0, 200000).toDF("id")
    val joined = big.join(dsv2.filter("id < 100"), "id")
    val hasBroadcast = joined.queryExecution.sparkPlan.toString
      .contains("BroadcastHashJoin")
    assert(hasBroadcast,
      "a pruned scan under the broadcast threshold must plan a broadcast join:\n" +
        joined.queryExecution.sparkPlan.toString)

    // a scan serving a STREAM reports UNKNOWN: head-snapshot numbers
    // would mis-describe a drain (it replays history) and per-trigger
    // stats would sweep the table's files every trigger
    val builder = new graft.sources.VersionedScanBuilder(
      root, 0L, None, None, None, None, false, true, dsv2.schema)
    val scan = builder.build()
    scan.toMicroBatchStream(freshDir("vstatsck"))
    val streamStats = scan
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(!streamStats.sizeInBytes.isPresent && !streamStats.numRows.isPresent,
      "a streaming scan must not report head-snapshot statistics")
  }

  test("maxFilesPerTrigger paces an AvailableNow drain into per-commit batches") {
    val root = freshDir("vstream-rl2")
    val t = new VersionedTable(root)
    (0 until 3).foreach(i => t.append(spark,
      spark.range(i * 10L, (i + 1) * 10L).toDF("id").repartition(1)))

    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft.sources.VersionedStreamProvider")
      .option("path", root).option("maxFilesPerTrigger", "1").load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.synchronized { batches += b.count() }; ()
      }
      .option("checkpointLocation", freshDir("vsrl2ck"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(batches.toList === List(10L, 10L, 10L),
      "one commit (one file) per micro-batch under maxFilesPerTrigger=1")
  }
}
