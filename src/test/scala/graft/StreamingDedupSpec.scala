package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.{BucketState, BucketedDoc, CandidatePair}

/** Streaming LSH dedup: bucket collisions must surface candidate pairs
  * across micro-batches (state carries the remembered arrivals), and the
  * per-bucket cap must bound both state and emission. */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("exact duplicates collide across micro-batches; unrelated docs do not") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDS().toDF("doc_id", "text")
    val out = StreamingDedup.candidatePairs(spark, docs)
    val q = out.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      // batch 1: two unrelated docs (disjoint vocab -> disjoint buckets)
      input.addData((1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta theta"))
      q.processAllAvailable()
      assert(spark.table("sdedup").count() === 0)
      // batch 2: an exact duplicate of doc 1 arrives later -> its full
      // signature matches, so all 4 band buckets collide with doc 1
      input.addData((3L, "alpha beta gamma delta"))
      q.processAllAvailable()
      val pairs = spark.table("sdedup").as[CandidatePair].collect()
      assert(pairs.nonEmpty && pairs.forall(p => p.a_id == 1L && p.b_id == 3L))
      assert(pairs.length === 4, s"expected one collision per band, got $pairs")
      // batch 3: a re-delivery of doc 3 (at-least-once source) must not
      // emit duplicate pairs - the remembered set already holds it
      input.addData((3L, "alpha beta gamma delta"))
      q.processAllAvailable()
      assert(spark.table("sdedup").count() === 4)
    } finally q.stop()
  }

  test("update function: collision emission, dedup, and the bucket cap") {
    def st(ids: Long*) = new TestGroupState(
      if (ids.isEmpty) None else Some(BucketState(ids.toList)))
    def docs(ids: Long*) = ids.map(BucketedDoc("b", _)).iterator
    // two same-bucket arrivals in ONE batch pair with each other (id
    // order, so shuffle order cannot flip who is "earlier"), and the
    // state remembers both
    val s0 = st()
    assert(StreamingDedup.updateBucket(20)("b", docs(5L, 2L), s0).toSeq
      === Seq(CandidatePair("b", 2L, 5L)))
    assert(s0.get.docIds === List(2L, 5L))
    // later arrival pairs with every remembered doc
    val s1 = st(2L, 5L)
    val emitted = StreamingDedup.updateBucket(20)("b", docs(9L), s1).toSeq
    assert(emitted === Seq(CandidatePair("b", 2L, 9L), CandidatePair("b", 5L, 9L)))
    // re-delivery of a remembered id is a no-op
    val s2 = st(2L, 5L)
    assert(StreamingDedup.updateBucket(20)("b", docs(5L), s2).isEmpty)
    assert(s2.get.docIds === List(2L, 5L))
    // at the cap: nothing new is remembered or emitted (degenerate-bucket
    // guard - state and fan-out stay bounded)
    val s3 = st(1L, 2L)
    assert(StreamingDedup.updateBucket(2)("b", docs(7L), s3).isEmpty)
    assert(s3.get.docIds === List(1L, 2L))
  }
}
