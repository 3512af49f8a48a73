package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a pure range-predicate inner join
  * (`pt >= start AND pt < end`, no equi-conjunct) into the binned
  * equi-join of [[graft.operators.RangeJoin]] — automatically, for raw
  * SQL/DataFrame plans that would otherwise fall back to
  * BroadcastNestedLoopJoin (unbounded broadcast + |points|·|intervals|
  * compute: the non-scalable shape this library forbids).
  *
  * Opt-in: set `spark.graft.rangeJoin.binWidth` to a positive bin width
  * (same unit as the join columns); 0 (default) disables the rule. The
  * rewrite is narrow by design — it only fires on an INNER join whose
  * condition is exactly the two range conjuncts over LongType
  * expressions, each side-pure and deterministic — and it keeps the
  * original predicate as the residual filter, so it is a pure plan
  * transformation: the result set is provably identical (the bin
  * equality is implied by the range predicate whenever both hold).
  *
  * Runs post-analysis (user-provided optimizer batch), so it builds
  * RESOLVED nodes: the generated bin attribute is constructed directly
  * and the original join output is re-projected on top.
  *
  * Install via `spark.experimental.extraOptimizations` or
  * [[GraftExtensions]] (`spark.sql.extensions=graft.plans.GraftExtensions`).
  */
class RangeJoinRewrite extends Rule[LogicalPlan] {

  private def binWidth: Long =
    conf.getConfString(RangeJoinRewrite.binWidthKey, "0").toLong

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = binWidth
    if (w <= 0) plan
    else plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        matchRange(cond, left, right) match {
          case Some((pt, start, end, ptOnLeft)) =>
            val (ptPlan, ivPlan) = if (ptOnLeft) (left, right) else (right, left)
            def bin(x: Expression): Expression =
              Floor(Divide(Cast(x, DoubleType), Literal(w.toDouble)))
            val ptBin = Alias(bin(pt), "_graft_pt_bin")()
            val newPt = Project(ptPlan.output :+ ptBin, ptPlan)
            // every bin the interval [start, end) overlaps; end is
            // exclusive, hence the (end - 1) upper bound. No explicit
            // step: Spark infers ±1, so a degenerate interval
            // (end <= start) yields descending bins instead of a
            // runtime error — the residual range filter (vacuously
            // false for such intervals) then drops every candidate,
            // preserving the original join's empty result.
            // Sequence is TimeZoneAwareExpression: a post-analysis rule
            // must supply the session zone itself or the plan goes
            // unresolved (irrelevant to LongType bins, but required)
            val seq = new Sequence(bin(start),
              bin(Subtract(end, Literal(1L))), None,
              Some(conf.sessionLocalTimeZone))
            val ivBin = AttributeReference("_graft_iv_bin", LongType, nullable = false)()
            val newIv = Generate(Explode(seq), unrequiredChildIndex = Nil,
              outer = false, qualifier = None, generatorOutput = Seq(ivBin),
              child = ivPlan)
            val newCond = And(EqualTo(ptBin.toAttribute, ivBin), cond)
            val (nl, nr) = if (ptOnLeft) (newPt, newIv) else (newIv, newPt)
            Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
          case None => j
        }
    }
  }

  /** Match `pt >= start AND pt < end` (either conjunct order) with `pt`
    * drawn wholly from one join side and `start`/`end` wholly from the
    * other; all three LongType and deterministic. Returns
    * (pt, start, end, ptOnLeft).
    */
  private def matchRange(cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Boolean)] = {
    val conjuncts = cond match {
      case And(a, b) => Seq(a, b)
      case _ => return None
    }
    val ge = conjuncts.collectFirst { case GreaterThanOrEqual(p, s) => (p, s) }
    val lt = conjuncts.collectFirst { case LessThan(p, e) => (p, e) }
    (ge, lt) match {
      case (Some((p1, start)), Some((p2, end))) if p1.semanticEquals(p2) =>
        val all = Seq(p1, start, end)
        if (!all.forall(e => e.dataType == LongType && e.deterministic)) return None
        def from(side: LogicalPlan, e: Expression) =
          e.references.nonEmpty && e.references.subsetOf(side.outputSet)
        if (from(left, p1) && from(right, start) && from(right, end))
          Some((p1, start, end, true))
        else if (from(right, p1) && from(left, start) && from(left, end))
          Some((p1, start, end, false))
        else None
      case _ => None
    }
  }
}

object RangeJoinRewrite {
  val binWidthKey = "spark.graft.rangeJoin.binWidth"
}
