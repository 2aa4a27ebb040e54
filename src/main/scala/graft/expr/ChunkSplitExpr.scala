package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (the rsync/LBFS boundary trick, the binary
  * counterpart of text shingling): split a payload wherever the rolling
  * sum of the last 4 byte values is ≡ 0 (mod 64) — boundaries depend
  * only on LOCAL content, so inserting or deleting bytes re-chunks just
  * the neighborhood of the edit while every other chunk keeps its
  * digest. That re-synchronization is what makes chunk-level dedup of
  * shifted/edited binaries work where fixed-stride framing
  * ([[graft.operators.MultimodalOps]]' frame sampler) loses alignment
  * after the first edit.
  *
  * Returns the md5 hex digest of every chunk, in order. Mean chunk
  * length ≈ 64 bytes (the mask width); a cut at 1-based position i is
  * taken only for 4 ≤ i < n, so chunks are never empty and a short
  * payload (< 5 bytes) is one chunk. One O(n) byte walk per row in
  * generated code — the per-position `substring(text, i, 1)` spelling
  * of a rolling window is the O(n²) interpreted anti-pattern this
  * kernel exists to avoid (see [[Fingerprint]]).
  */
case class ChunkSplit(child: Expression)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"chunk_split requires a STRING input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "chunk_split"

  /** The kernel, shared by the interpreted and codegen paths. */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var i = 3 // 0-based index of the 4th byte = 1-based position 4
    while (i < n - 1) {
      val sum = (bytes(i) & 0xFF) + (bytes(i - 1) & 0xFF) +
        (bytes(i - 2) & 0xFF) + (bytes(i - 3) & 0xFF)
      if (sum % 64 == 0) {
        out += md5hex(bytes, start, i + 1 - start)
        start = i + 1
      }
      i += 1
    }
    out += md5hex(bytes, start, n - start)
    new GenericArrayData(out.toArray)
  }

  private def md5hex(b: Array[Byte], off: Int, len: Int): UTF8String = {
    // one digest instance per thread, reset per chunk: mean chunk is
    // ~64 bytes, so a getInstance() per chunk would dominate the O(n)
    // byte walk with allocation (the expression object is shared across
    // tasks via the codegen references array, hence thread-local)
    val md = ChunkSplit.digests.get()
    md.reset()
    md.update(b, off, len)
    val digest = md.digest()
    val hex = new java.lang.StringBuilder(32)
    digest.foreach { x =>
      hex.append(Character.forDigit((x >> 4) & 0xF, 16))
      hex.append(Character.forDigit(x & 0xF, 16))
    }
    UTF8String.fromString(hex.toString)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("chunkSplit", this, classOf[ChunkSplit].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkSplit =
    copy(child = newChild)
}

object ChunkSplit {
  private[expr] val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}
