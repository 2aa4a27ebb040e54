package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextFunctions

/** The reference's `calculate_risk_score` Python UDF
  * (reference: spark_jobs/preprocessing_streaming.py:53-68,
  * spark_jobs/kafka_consumer_simple.py:35-47) as a native Catalyst
  * expression with whole-stage codegen: +10 per distress keyword
  * substring-contained in the lowercased input (once per keyword), capped
  * at 100; 0 on null/empty.
  *
  * Semantics are byte-identical to the Column-algebra form in
  * `TextFunctions.riskScore` (lower → UTF8String.contains per keyword):
  * `q_risk_score_expr` must hash-match `q_risk_score`. The expression
  * never returns null (null input scores 0, like the Python UDF's
  * `if not text: return 0`).
  *
  * Versus the reference's `BatchEvalPython` node this stays inside the
  * generated Java of the enclosing stage: no row serialization boundary,
  * which was the reference pipeline's only non-Catalyst execution cost.
  */
case class RiskScore(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType | NullType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"risk_score requires STRING input, got ${other.catalogString}")
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "risk_score"

  private lazy val keywordsUtf8: Array[UTF8String] =
    TextFunctions.riskKeywords.map(UTF8String.fromString).toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else {
      val lowered = v.asInstanceOf[UTF8String].toLowerCase
      var hits = 0
      var i = 0
      while (i < keywordsUtf8.length) {
        if (lowered.contains(keywordsUtf8(i))) hits += 1
        i += 1
      }
      math.min(100, hits * 10)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val kws = ctx.addReferenceObj("riskKeywords", keywordsUtf8,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val lowered = ctx.freshName("lowered")
    val hits = ctx.freshName("hits")
    val i = ctx.freshName("i")
    val resultCode =
      code"""
         |${childGen.code}
         |int ${ev.value} = 0;
         |if (!${childGen.isNull}) {
         |  org.apache.spark.unsafe.types.UTF8String $lowered =
         |    ${childGen.value}.toLowerCase();
         |  int $hits = 0;
         |  for (int $i = 0; $i < $kws.length; $i++) {
         |    if ($lowered.contains($kws[$i])) $hits++;
         |  }
         |  ${ev.value} = Math.min(100, $hits * 10);
         |}
       """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): RiskScore =
    copy(child = newChild)
}
