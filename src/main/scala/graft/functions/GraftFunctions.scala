package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expr.RiskScore

/** Registration of graft's native expressions into the Catalyst function
  * registry, both per-session (for externally built sessions like the
  * driver's) and via SparkSessionExtensions (for sessions we build).
  */
object GraftFunctions {

  private val riskScoreBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, "risk_score expects exactly one argument")
    RiskScore(exprs.head)
  }

  /** Make `risk_score(str)` callable from SQL / call_function on an
    * existing session. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "risk_score", riskScoreBuilder, "built-in")
}

/** `SparkSession.builder().withExtensions(new GraftExtensions)` — or
  * `spark.sql.extensions=graft.functions.GraftExtensions` — injects the
  * function at session build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("risk_score"),
      new ExpressionInfo(classOf[RiskScore].getName, "risk_score"),
      exprs => RiskScore(exprs.head),
    ))
    // Fold the 16-way Column-algebra risk shape into the native
    // expression wherever user code spelled it out by hand.
    ext.injectOptimizerRule(_ => graft.expr.RiskScoreRewrite)
  }
}
