package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Positional-checksum document fingerprint:
  * `sum_i codepoint(text[i]) * i (1-based) mod 1e9+7` — exactly the value
  * of the Column-algebra fold
  * `aggregate(sequence(1, length(text)), 0L, (acc, i) ->
  *    (acc + ascii(substring(text, i, 1)) * i) % 1000000007)`
  * but computed in ONE pass over the UTF8String bytes. The HOF spelling
  * is O(d²) per row: every `substring(text, i, 1)` re-scans i bytes to
  * find the i-th character, inside the interpreted lambda path. This
  * kernel decodes each UTF-8 codepoint once while walking the bytes
  * (Spark's `ascii` is `codePointAt(0)` of the first char, which for a
  * single decoded character IS its codepoint), so a d-char document costs
  * O(d) in generated code instead of O(d²) interpreted.
  *
  * Stepwise mod keeps the accumulator < 1e9+7, so `cp * i + acc` cannot
  * overflow int64 for any realistic document (i would need to exceed
  * ~8.4e9 characters). Matches the fold bit-for-bit: mod distributes over
  * the non-negative addition chain.
  */
case class Fingerprint(child: Expression)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fingerprint requires a STRING input, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint"

  /** The kernel, shared by the interpreted and codegen paths. */
  def compute(s: UTF8String): Long = {
    val n = s.numBytes
    var acc = 0L
    var i = 0
    var pos = 1L
    while (i < n) {
      val b = s.getByte(i)
      var cp = 0
      var len = 1
      if ((b & 0x80) == 0) { cp = b; len = 1 }
      else if ((b & 0xE0) == 0xC0) { cp = b & 0x1F; len = 2 }
      else if ((b & 0xF0) == 0xE0) { cp = b & 0x0F; len = 3 }
      else { cp = b & 0x07; len = 4 }
      var k = 1
      while (k < len && i + k < n) {
        cp = (cp << 6) | (s.getByte(i + k) & 0x3F)
        k += 1
      }
      acc = (acc + cp.toLong * pos) % 1000000007L
      pos += 1
      i += len
    }
    acc
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fingerprint", this, classOf[Fingerprint].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Fingerprint =
    copy(child = newChild)
}
