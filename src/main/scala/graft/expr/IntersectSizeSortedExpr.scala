package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** `|distinct(a) ∩ distinct(b)|` over two SORTED ARRAY<STRING> columns —
  * the two-pointer formulation of [[IntersectSize]]: when both inputs
  * are sorted ascending (Spark's `array_sort`, which also places nulls
  * last), the distinct common count falls out of one merge walk with
  * ZERO allocation — no hash set build per pair, no per-element hashing,
  * just UTF8String binary comparisons. In the Jaccard hot path the sort
  * is paid ONCE per document in the feature table while the merge runs
  * once per candidate PAIR, so the trade is sort(n·d log d) for
  * hash-free pairs(k·d) — strictly better whenever documents appear in
  * more than a couple of pairs.
  *
  * PRECONDITION: both arrays sorted ascending with nulls last (exactly
  * `array_sort`'s contract). Duplicates are tolerated (equal runs are
  * skipped), so the value equals `size(array_intersect(a, b))` for any
  * sorted inputs; a null present on BOTH sides counts once, mirroring
  * the builtin.
  */
case class IntersectSizeSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"intersect_size_sorted requires two ARRAY<STRING> inputs, got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_size_sorted"

  /** The kernel, shared by the interpreted and codegen paths. */
  def compute(x: ArrayData, y: ArrayData): Int = {
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny && !x.isNullAt(i) && !y.isNullAt(j)) {
      val a = x.getUTF8String(i)
      val b = y.getUTF8String(j)
      val cmp = a.compareTo(b)
      if (cmp == 0) {
        c += 1
        // skip the full equal-run on both sides so duplicates count once
        i += 1
        while (i < nx && !x.isNullAt(i) && x.getUTF8String(i).compareTo(a) == 0) i += 1
        j += 1
        while (j < ny && !y.isNullAt(j) && y.getUTF8String(j).compareTo(a) == 0) j += 1
      } else if (cmp < 0) i += 1
      else j += 1
    }
    // nulls sort last: any remaining null on both sides joins once
    var xNull = false
    while (i < nx && !xNull) { xNull = x.isNullAt(i); i += 1 }
    var yNull = false
    while (j < ny && !yNull) { yNull = y.isNullAt(j); j += 1 }
    if (xNull && yNull) c += 1
    c
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("intersectSorted", this, classOf[IntersectSizeSorted].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSizeSorted =
    copy(left = newLeft, right = newRight)
}
