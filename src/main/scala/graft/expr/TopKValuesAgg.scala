package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Bounded exact top-k values per group as a TypedImperativeAggregate —
  * the low-level imperative-buffer aggregate tier (the shape HLL/sketch
  * aggregates use), complementing the typed Aggregator in AdvancedOps.
  *
  * The buffer is a sorted-descending array of at most k doubles; insert
  * is O(k), merge is a bounded merge — so memory per group is constant
  * and the aggregate runs partial+final like any built-in. Result is the
  * top-k VALUES (a multiset property), so ties cannot make the output
  * row-order dependent.
  */
case class TopKValuesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "top_k_values"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_values requires DOUBLE input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Double] = Array.empty

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer
    else insert(buffer, v.asInstanceOf[Double])
  }

  private def insert(buffer: Array[Double], v: Double): Array[Double] = {
    if (buffer.length == k && v <= buffer(k - 1)) return buffer
    val out = new Array[Double](math.min(k, buffer.length + 1))
    var i = 0
    // position of v in the descending buffer
    while (i < buffer.length && buffer(i) > v) i += 1
    System.arraycopy(buffer, 0, out, 0, math.min(i, out.length))
    if (i < out.length) out(i) = v
    if (i + 1 <= out.length - 1)
      System.arraycopy(buffer, i, out, i + 1, out.length - i - 1)
    out
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val out = new Array[Double](math.min(k, a.length + b.length))
    var ia = 0; var ib = 0; var io = 0
    while (io < out.length) {
      if (ia < a.length && (ib >= b.length || a(ia) >= b(ib))) {
        out(io) = a(ia); ia += 1
      } else {
        out(io) = b(ib); ib += 1
      }
      io += 1
    }
    out
  }

  override def eval(buffer: Array[Double]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.length)
    bb.putInt(buffer.length)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bb.getInt())(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKValuesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKValuesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKValuesAgg =
    copy(child = newChildren.head)
}
