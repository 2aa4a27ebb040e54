package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Per-payload byte statistics — the decode kernel of
  * [[graft.operators.MultimodalOps]] as a native codegen'd expression:
  * one O(n) byte walk per row producing (n_bytes, mean_byte, max_byte,
  * min_byte), entirely inside the enclosing whole-stage-codegen span.
  * This is the documented stand-in for a real media decoder (no codecs
  * ship in this environment); a JPEG/PCM decode would replace the loop
  * body while keeping the shape — payload bytes consumed where they are
  * scanned, only the narrow feature struct survives the operator.
  *
  * Semantics are bit-identical to the imperative `mapPartitions`
  * formulation it replaces (kept as
  * `MultimodalOps.extractFeaturesBatched` — the batched-iterator decoder
  * contract): an EMPTY payload yields mean NaN (0/0), max 0, min 255,
  * exactly what the open-coded accumulators produce.
  */
case class ByteStats(child: Expression)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"byte_stats requires a BINARY input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false),
    StructField("max_byte", IntegerType, nullable = false),
    StructField("min_byte", IntegerType, nullable = false)))

  override def prettyName: String = "byte_stats"

  /** The kernel, shared by the interpreted and codegen paths. */
  def compute(bytes: Array[Byte]): InternalRow = {
    var sum = 0L
    var mx = 0
    var mn = 255
    var i = 0
    val n = bytes.length
    while (i < n) {
      val v = bytes(i) & 0xff
      sum += v
      if (v > mx) mx = v
      if (v < mn) mn = v
      i += 1
    }
    new GenericInternalRow(Array[Any](
      n.toLong, sum.toDouble / n, mx, mn))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteStats", this, classOf[ByteStats].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): ByteStats =
    copy(child = newChild)
}
