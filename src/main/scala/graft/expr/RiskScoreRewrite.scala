package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.functions.TextFunctions

/** Demonstrative optimizer rule (SURVEY.md §4.3): recognizes the
  * Column-algebra risk-score shape
  * `least(100, (cast(contains(lc, kw1) as int) + ...) * 10)` over the
  * full 16-keyword set and folds it into the native [[RiskScore]]
  * expression — collapsing a 16-branch predicate tree into one tight
  * codegen'd loop. Injected via [[graft.functions.GraftExtensions]].
  *
  * Conservative by construction: it only fires when every Contains leaf
  * tests the SAME lowered child against exactly the canonical keyword
  * set; anything else is left untouched.
  */
object RiskScoreRewrite extends Rule[LogicalPlan] {

  private val canonicalKeywords: Set[String] = TextFunctions.riskKeywords.toSet

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case l @ Least(Seq(IntLit(100), TimesTen(hits))) =>
        extractRiskChild(hits).map(RiskScore(_): Expression).getOrElse(l)
      case l @ Least(Seq(TimesTen(hits), IntLit(100))) =>
        extractRiskChild(hits).map(RiskScore(_): Expression).getOrElse(l)
    }

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
  }

  private object TimesTen {
    def unapply(e: Expression): Option[Expression] = e match {
      case Multiply(h, IntLit(10), _) => Some(h)
      case Multiply(IntLit(10), h, _) => Some(h)
      case _ => None
    }
  }

  /** Flatten the Add tree of cast(contains(child, kw) as int) leaves;
    * succeed only if all leaves share one child and the keyword set is
    * exactly the canonical list. */
  private def extractRiskChild(hits: Expression): Option[Expression] = {
    def leaves(e: Expression): Option[Seq[(Expression, String)]] = e match {
      case Add(a, b, _) =>
        for (la <- leaves(a); lb <- leaves(b)) yield la ++ lb
      case Cast(Contains(child, Literal(kw, _)), IntegerType, _, _) if kw != null =>
        Some(Seq(child -> kw.toString))
      case _ => None
    }
    leaves(hits).flatMap { ls =>
      val children = ls.map(_._1).distinct
      val kws = ls.map(_._2).toSet
      if (children.length == 1 && kws == canonicalKeywords) Some(children.head)
      else None
    }
  }
}
