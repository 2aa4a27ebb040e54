package graft.expr

import java.nio.ByteBuffer

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch as a TypedImperativeAggregate: depth×width counters
  * per group, CONSTANT memory regardless of key cardinality, and a
  * merge that is plain elementwise addition — the frequency-sketch
  * complement to the candidate-set Misra–Gries ([[FreqItemsAgg]]):
  * MG answers "which items are heavy", CMS answers "how often is THIS
  * item seen" for any probe, at 100-TB key cardinalities where an
  * exact per-key count would shuffle the whole keyspace.
  *
  * Guarantees the spec pins: estimates NEVER undercount (each probe's
  * counters each saw every occurrence of it), and the sketch is
  * bit-identical under any partitioning of the input (counter addition
  * is commutative/associative over longs). Row hashes are seeded
  * MurmurHash3 over the item bytes — pure and engine-independent, but
  * not expressible in DuckDB SQL, so the registry query is declared
  * oracle-free and its overcount bound is spec-asserted against exact
  * counts instead.
  *
  * Output: one "term:estimate" string per probe term, in probe order —
  * the integer-string array encoding the driver's hash compare
  * factorizes reliably (the [[TopKValuesAgg]] trick).
  */
case class CountMinAgg(
    child: Expression,
    probes: Seq[String],
    depth: Int = 4,
    width: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cms_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_counts requires STRING input, got ${child.dataType.catalogString}")

  private def cell(row: Int, bytes: Array[Byte]): Int =
    row * width + ((MurmurHash3.bytesHash(bytes, row) & 0x7fffffff) % width)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var r = 0
    while (r < depth) {
      buffer(cell(r, bytes)) += 1L
      r += 1
    }
    buffer
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buffer: Array[Long]): Any = {
    val out = probes.map { term =>
      val bytes = UTF8String.fromString(term).getBytes
      var est = Long.MaxValue
      var r = 0
      while (r < depth) {
        est = math.min(est, buffer(cell(r, bytes)))
        r += 1
      }
      UTF8String.fromString(s"$term:$est")
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}
