package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst GENERATOR (the UDTF side of the extension surface,
  * completing the scalar [[RiskScore]] / aggregate [[TopKValuesAgg]]
  * triple): `ngram_pos(tokens, n)` emits one (pos, gram) row per
  * word n-gram of the token array, 1-based position included — the
  * positional signal a plain `explode(transform(...))` spelling drops
  * unless it pays an extra `arrays_zip(sequence(...))`. Planned by
  * GenerateExec exactly like the built-in explode family: rows stream
  * straight out of the scan task with no intermediate array
  * materialized per row (the transform-then-explode spelling allocates
  * the full gram array per document before exploding it).
  *
  * Null tokens never reach it from the registry query (tokens are
  * filter(split(...))); defensively, a window containing a null token
  * emits no row rather than a null gram, so downstream group-bys never
  * see a fabricated key.
  */
case class NGramPos(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, "ngram_pos n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_pos requires ARRAY<STRING> input, got ${other.catalogString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def prettyName: String = "ngram_pos"

  @transient private lazy val sep = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) return Nil
    val toks = data.asInstanceOf[ArrayData].toObjectArray(StringType)
    val m = toks.length - n + 1
    if (m <= 0) return Nil
    (0 until m).iterator.flatMap { i =>
      var j = i
      var hasNull = false
      while (j < i + n) { if (toks(j) == null) hasNull = true; j += 1 }
      if (hasNull) Iterator.empty
      else {
        val win = new Array[UTF8String](n)
        var k = 0
        while (k < n) { win(k) = toks(i + k).asInstanceOf[UTF8String]; k += 1 }
        Iterator.single(InternalRow((i + 1).toLong, UTF8String.concatWs(sep, win: _*)))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramPos =
    copy(child = newChild)
}
