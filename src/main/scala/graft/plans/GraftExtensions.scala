package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, LongDotProduct}

/** Catalyst extension wiring: registers graft's native functions into
  * the session's FunctionRegistry so SQL text can use them
  * (`SELECT vec_dot(a, b) ...`), in addition to the Column API.
  *
  * Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Also injects [[RangeJoinRewrite]] (opt-in via
  * `spark.graft.rangeJoin.binWidth`; a no-op otherwise) — the one
  * Rule[LogicalPlan] this library ships. The reference surface itself
  * needs none (SURVEY.md §4): every rewrite it relies on is built-in
  * Catalyst behavior.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.vecDot)
    e.injectFunction(GraftExtensions.vecDotLong)
    e.injectOptimizerRule(_ => new RangeJoinRewrite)
  }
}

object GraftExtensions {
  val vecDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[DotProduct].getCanonicalName, "vec_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "vec_dot(a, b) takes exactly 2 arguments")
      DotProduct(children.head, children(1))
    })

  val vecDotLong: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot_long"),
    new ExpressionInfo(classOf[LongDotProduct].getCanonicalName, "vec_dot_long"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "vec_dot_long(a, b) takes exactly 2 arguments")
      LongDotProduct(children.head, children(1))
    })
}
