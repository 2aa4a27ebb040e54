package graft.expr

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a TypedImperativeAggregate: at
  * most k counters per group, CONSTANT memory regardless of input
  * cardinality, mergeable partial+final like any built-in aggregate —
  * the sketch tier for "which tokens dominate this 100-TB corpus"
  * where an exact term count would shuffle the whole vocabulary.
  *
  * Guarantee (the property the spec pins): every item with true
  * frequency > n/(k+1) survives in the final candidate set, under ANY
  * partitioning of the input — each decrement step retires k+1 distinct
  * item occurrences, so an over-threshold item can never be fully
  * cancelled. Counts are lower-bound estimates and the exact candidate
  * set below the threshold is processing-order dependent, so the
  * registry query is declared oracle-free (rows-only).
  *
  * The merge is the Agarwal et al. mergeable-summaries rule: sum
  * counters, then subtract the (k+1)-th largest count from every entry
  * and drop non-positives — preserving the error bound.
  */
case class FreqItemsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "freq_items"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_items requires STRING input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val item = v.asInstanceOf[UTF8String]
    buffer.get(item) match {
      case Some(c) => buffer.update(item, c + 1)
      case None if buffer.size < k => buffer.update(item.clone(), 1L)
      case None =>
        // decrement-all: retires one occurrence of k+1 DISTINCT items
        // (this one plus the k residents) — the step the guarantee
        // rides on
        val dead = buffer.iterator.flatMap { case (key, c) =>
          if (c == 1L) Some(key) else { buffer.update(key, c - 1); None }
        }.toList
        dead.foreach(buffer.remove)
    }
    buffer
  }

  override def merge(a: mutable.HashMap[UTF8String, Long],
      b: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b.foreach { case (key, c) =>
      a.update(key, a.getOrElse(key, 0L) + c)
    }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from everyone, drop <= 0
      val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = a.iterator.flatMap { case (key, c) =>
        if (c - cut <= 0L) Some(key) else { a.update(key, c - cut); None }
      }.toList
      dead.foreach(a.remove)
    }
    a
  }

  /** Surviving candidates, sorted lexically (a set property — counts are
    * order-dependent lower bounds and deliberately not emitted). */
  override def eval(buffer: mutable.HashMap[UTF8String, Long]): Any =
    new GenericArrayData(buffer.keysIterator.toArray.sortBy(_.toString))

  override def serialize(buffer: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val entries = buffer.toArray
    val size = 4 + entries.map(e => 4 + e._1.numBytes() + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.foreach { case (key, c) =>
      val bytes = key.getBytes
      bb.putInt(bytes.length)
      bb.put(bytes)
      bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      out.update(UTF8String.fromBytes(arr), bb.getLong())
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = newChildren.head)
}
