package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** `|distinct(a) ∩ b|` over two ARRAY<STRING> columns — semantically
  * `size(array_intersect(a, b))` (distinct common elements; a null
  * element counts once if present on both sides) without materializing
  * the intersection ARRAY. The builtin builds the result array element
  * by element just so `size` can read its length; per candidate pair in
  * the Jaccard hot path that is pure allocation churn. Here one hash set
  * per side membership test and an int counter do the same job, invoked
  * from generated code via a reference call so the enclosing stage stays
  * in whole-stage codegen.
  */
case class IntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"intersect_size requires two ARRAY<STRING> inputs, got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_size"

  /** The kernel, shared by the interpreted and codegen paths. */
  def compute(x: ArrayData, y: ArrayData): Int = {
    val inRight = new java.util.HashSet[AnyRef]()
    var rightHasNull = false
    var i = 0
    val ny = y.numElements()
    while (i < ny) {
      if (y.isNullAt(i)) rightHasNull = true
      else inRight.add(y.getUTF8String(i))
      i += 1
    }
    val counted = new java.util.HashSet[AnyRef]()
    var leftHasNull = false
    var c = 0
    var j = 0
    val nx = x.numElements()
    while (j < nx) {
      if (x.isNullAt(j)) {
        if (!leftHasNull && rightHasNull) c += 1
        leftHasNull = true
      } else {
        val e = x.getUTF8String(j)
        if (inRight.contains(e) && counted.add(e)) c += 1
      }
      j += 1
    }
    c
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("intersectSize", this, classOf[IntersectSize].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSize =
    copy(left = newLeft, right = newRight)
}
