package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, GetStructField}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{PcmHeaderStats, PcmStats}

/** Decode pruning for the media expressions — the optimizer exploiting
  * ALGEBRAIC STRUCTURE of a custom expression the way Catalyst's
  * column pruning exploits schemas: `pcm_stats(x).sample_rate` and
  * `.n_samples` are pure functions of the RIFF chunk headers, so a
  * query consuming only those fields ("total audio seconds per
  * source") need never run the O(samples) decode loop. This rule
  * rewrites such extractions to [[PcmHeaderStats]], which shares the
  * validation walk bit-for-bit (null on exactly the same payloads —
  * the rewrite is value-identical on every input).
  *
  * Safety: the rewrite fires only when EVERY use of that payload's
  * `pcm_stats` in the plan is a cheap-field extraction. One expensive
  * field (`peak_abs`/`sum_abs`/`energy`) or a bare whole-struct use
  * disqualifies its child — otherwise the plan would carry BOTH
  * expressions and common-subexpression reuse of the full decode
  * would be lost (pruning must never make a plan slower).
  *
  * Registered by [[GraftExtensions]]; DecodePruneRuleSpec pins the
  * rewrite, the value identity, and both disqualification paths.
  */
object DecodePruneRule extends Rule[LogicalPlan] {

  private val cheapOrdinals = Set(0, 1) // sample_rate, n_samples

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // census: every pcm_stats occurrence per canonicalized payload —
    // total nodes, cheap extractions, expensive extractions. A bare
    // (non-extracted) use shows up as total > cheap + expensive.
    val total = mutable.Map.empty[Expression, Int].withDefaultValue(0)
    val cheap = mutable.Map.empty[Expression, Int].withDefaultValue(0)
    val costly = mutable.Map.empty[Expression, Int].withDefaultValue(0)
    plan.foreach { op =>
      op.expressions.foreach(_.foreach {
        case GetStructField(p: PcmStats, ord, _) =>
          val k = p.child.canonicalized
          if (cheapOrdinals(ord)) cheap(k) += 1 else costly(k) += 1
        case p: PcmStats =>
          total(p.child.canonicalized) += 1
        case _ => ()
      })
    }
    def allUsesCheap(child: Expression): Boolean = {
      val k = child.canonicalized
      cheap(k) > 0 && costly(k) == 0 && total(k) == cheap(k)
    }
    if (total.isEmpty) plan
    else plan.transformAllExpressions {
      case GetStructField(p: PcmStats, ord, name)
          if cheapOrdinals(ord) && allUsesCheap(p.child) =>
        GetStructField(PcmHeaderStats(p.child), ord, name)
    }
  }
}
