package graft.plans

import graft.storm.{GoFmtF, GoFmtG}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Expression, ExpressionInfo, In, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Engine extension point (`--conf spark.sql.extensions=graft.plans.
  * GraftExtensions` or `.withExtensions(new GraftExtensions)`):
  *
  *  - registers the engine's custom expressions in the function registry —
  *    `go_fmt_g` / `go_fmt_f` (the Go float formatters the ID contract
  *    needs, SURVEY.md §2.8) and `array_dot` (the similarity-search
  *    kernel) — so all are reachable from SQL text as well as the
  *    DataFrame API;
  *  - injects [[CollapseIdempotentEnumNormalize]], the demonstration
  *    optimizer rule of SURVEY.md §4.2: enum-normalization `CASE WHEN x IN
  *    (...) THEN x ELSE '' END` chains are idempotent, so applying one to
  *    its own output collapses to a single application. Composed pipelines
  *    (enrich ∘ enrich, or enrich over already-normalized fixtures) pay for
  *    the normalization once instead of twice.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("go_fmt_g"),
      new ExpressionInfo(classOf[GoFmtG].getName, "go_fmt_g"),
      (children: Seq[Expression]) => GoFmtG(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("go_fmt_f"),
      new ExpressionInfo(classOf[GoFmtF].getName, "go_fmt_f"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"go_fmt_f requires (value, precision), got ${children.length} args")
        val prec = children(1) match {
          case Literal(p: Int, _) => p
          case other => throw new IllegalArgumentException(
            s"go_fmt_f precision must be an integer literal, got $other")
        }
        GoFmtF(children.head, prec)
      }))
    ext.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[graft.functions.ArrayDot].getName, "array_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"array_dot requires exactly 2 arguments, got ${children.length}")
        graft.functions.ArrayDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler_sim"),
      new ExpressionInfo(
        classOf[graft.functions.JaroWinklerSim].getName, "jaro_winkler_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"jaro_winkler_sim requires exactly 2 arguments, got ${children.length}")
        graft.functions.JaroWinklerSim(children.head, children(1))
      }))
    ext.injectOptimizerRule(_ => CollapseIdempotentEnumNormalize)
  }
}

/** Collapse `normalize(normalize(x))` → `normalize(x)` for the exact-match
  * enum normalization shape `CASE WHEN x IN (lit...) THEN x ELSE '' END`
  * (reference `normalizeEventType`, transform.go:166-173).
  *
  * Safe because the rewrite only fires when the outer and inner CaseWhen
  * have structurally identical literal sets and the branch value is the
  * predicate input itself — the transform is then a projection onto a fixed
  * point set, hence idempotent. */
object CollapseIdempotentEnumNormalize extends Rule[LogicalPlan] {

  private object EnumNormalize {
    /** Matches CASE WHEN child IN (lits) THEN child ELSE '' END and yields
      * (child, literal set). */
    def unapply(e: Expression): Option[(Expression, Seq[Literal])] = e match {
      case CaseWhen(Seq((In(value, list), branch)), Some(Literal(els, _)))
          if value.semanticEquals(branch) && els != null &&
            els.toString == "" && list.forall(_.isInstanceOf[Literal]) =>
        Some((value, list.map(_.asInstanceOf[Literal])))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case outer @ EnumNormalize(EnumNormalize(inner, innerLits), outerLits)
          if innerLits.map(_.value) == outerLits.map(_.value) =>
        outer match {
          case CaseWhen(Seq((In(_, list), _)), els) =>
            CaseWhen(Seq((In(inner, list), inner)), els)
          case other => other
        }
    }
}
