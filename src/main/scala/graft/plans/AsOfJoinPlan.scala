package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Logical as-of join: for each left (probe) row, attach the single
  * right (state) row with equal keys and the greatest `rightTime <=
  * leftTime` — the point-in-time join Spark has no built-in operator
  * for (the reference's pipeline joins landed snapshots instead;
  * `spark_jobs/spark_job1.py` line 18's equi-join is the degenerate
  * "state already aligned" case).
  *
  * This is the library's preference-order-(c) tier (SURVEY.md §4): a
  * custom LogicalPlan planned by [[AsOfJoinStrategy]] into
  * [[AsOfJoinExec]], a sorted-merge physical operator. The
  * preference-order-(a) composition ([[graft.operators.AsOfJoin.asOf]],
  * union + ordered window) stays as the cross-gate twin: same oracle,
  * two independent engines.
  *
  * Semantics (matching DuckDB's `ASOF [LEFT] JOIN ... ON l.k = r.k AND
  * l.ts >= r.ts` — or `l.ts <= r.ts` for the forward direction — which
  * the oracle uses natively):
  *  - equal keys; backward picks the greatest right time at-or-before
  *    the probe's time, forward (`isForward`) the smallest right time
  *    at-or-after it;
  *  - `tolerance` (pandas merge_asof-style) bounds |probe − state| in
  *    the time column's native units (micros for timestamps): a
  *    nearest-match farther than the bound is no match at all;
  *  - ties on right time resolve to the last row in (key, time) sort
  *    order (backward) / the first (forward) — callers needing
  *    determinism must make (key, time) unique on the right (the
  *    shipped queries aggregate states first);
  *  - NULL in any key or in the time never matches (SQL equality);
  *  - `isLeftOuter = true` keeps unmatched probes with a null-extended
  *    right side, `false` drops them.
  *
  * Both key lists must agree in arity and exact data types (hash
  * co-partitioning and the shared key ordering rely on it); builders
  * cast before constructing the node.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    isLeftOuter: Boolean,
    isForward: Boolean = false,
    tolerance: Option[Long] = None)
  extends BinaryNode {

  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs matching, non-empty key lists")

  override def output: Seq[Attribute] =
    left.output ++ (if (isLeftOuter) right.output.map(_.withNullability(true))
                    else right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]. Injected via
  * [[GraftExtensions]] (`injectPlannerStrategy`) or idempotently through
  * `spark.experimental.extraStrategies` by
  * [[graft.operators.AsOfJoin.asOfExec]].
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, outer, fwd, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, outer, fwd, tol,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge as-of join.
  *
  * Physical contract: both children hash-clustered on the join keys
  * (`ClusteredDistribution` pair — EnsureRequirements co-partitions
  * them, exactly as for SortMergeJoin) and sorted within partitions by
  * (keys ASC, time ASC). `doExecute` then zips partitions and performs
  * ONE forward merge pass: the right iterator never rewinds, each right
  * row is inspected a bounded number of times, and the only per-key
  * state is the single latest-so-far candidate row (one row copy, not a
  * buffered group).
  *
  * Scale: cost is the two shuffle+sorts (identical to the sort-merge
  * equi-join Spark would run for the same keys) plus an O(|L| + |R|)
  * streaming merge with O(1) memory — no window buffering of the
  * union of both sides (the composition's cost), no per-key
  * materialization, spill handled entirely by the child sorts. Skewed
  * keys behave like SMJ skew (AQE's skew-split does not apply to custom
  * nodes; pre-salting remains the escape hatch, as documented for every
  * keyed operator in SCALE.md).
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    isLeftOuter: Boolean,
    isForward: Boolean,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"as-of join key types differ: ${leftKeys.map(_.dataType)} vs ${rightKeys.map(_.dataType)}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of join time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")
  require(tolerance.forall(_ >= 0), "as-of join tolerance must be >= 0")
  require(tolerance.isEmpty || AsOfJoinExec.tolerable(leftTime.dataType),
    s"as-of join tolerance unsupported for time type ${leftTime.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ (if (isLeftOuter) right.output.map(_.withNullability(true))
                    else right.output)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  // Left rows stream through in order, so the left child's partitioning
  // and the required (keys, time) ordering both survive verbatim.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val outer = isLeftOuter
    val forward = isForward
    val tol = tolerance
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter0) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      // Bind against nullable right attrs: outer null-extension writes
      // nulls into fields whose child schema says non-nullable, and a
      // projection bound non-nullable would skip the isNullAt check.
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ (if (outer) rOut.map(_.withNullability(true)) else rOut))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      val rIter = rIter0.buffered
      val needTol = tol.isDefined
      val tolVal = tol.getOrElse(0L)
      // time value in native long units, for the tolerance bound only
      // (comparisons always go through the generic ordering)
      def timeLong(row: InternalRow): Long = timeType match {
        case IntegerType | DateType => row.getInt(0).toLong
        case _ => row.getLong(0)
      }
      // later >= earlier is guaranteed by the ordering checks at both
      // call sites, but LongType time columns admit values near
      // Long.Min/Max whose raw difference wraps negative; an overflowing
      // delta exceeds any representable tolerance, so it is out.
      def withinTol(later: Long, earlier: Long): Boolean =
        try Math.subtractExact(later, earlier) <= tolVal
        catch { case _: ArithmeticException => false }
      // Backward state: latest right row consumed whose (key, time) was
      // <= some probe's (key, time); stays valid across probes of the
      // same key because probe times are non-decreasing within a key.
      var candidate: InternalRow = null
      var candidateKey: UnsafeRow = null
      var candidateTime: Long = 0L

      def nonMatch(l: InternalRow): Iterator[InternalRow] =
        if (outer) { numOutputRows += 1; Iterator.single(resultProj(joined(l, nullRight))) }
        else Iterator.empty

      def emit(l: InternalRow, r: InternalRow): Iterator[InternalRow] = {
        numOutputRows += 1
        Iterator.single(resultProj(joined(l, r)))
      }

      lIter.flatMap { l =>
        val lk = lKeyProj(l)
        if (lk.anyNull) nonMatch(l)
        else {
          val lt = lTimeProj(l)
          if (lt.isNullAt(0)) nonMatch(l)
          else {
            var done = false
            while (!done && rIter.hasNext) {
              val r = rIter.head
              val rk = rKeyProj(r)
              if (rk.anyNull) rIter.next() // NULL key never matches any probe
              else {
                val kc = keyOrd.compare(rk, lk)
                if (kc < 0) rIter.next() // key group already passed by probes
                else if (kc > 0) done = true
                else {
                  val rt = rTimeProj(r)
                  if (rt.isNullAt(0)) rIter.next() // NULL time never matches
                  else if (forward) {
                    // discard strictly-before rows (dead for every later
                    // probe too); stop at the first at-or-after, which is
                    // exactly this probe's nearest forward match
                    if (timeOrd.compare(rt, lt) < 0) rIter.next() else done = true
                  } else if (timeOrd.compare(rt, lt) <= 0) {
                    // newer at-or-before state: replaces the candidate
                    candidate = r.copy()
                    candidateKey = rk.copy()
                    if (needTol) candidateTime = timeLong(rt)
                    rIter.next()
                  } else done = true
                }
              }
            }
            if (forward) {
              // match = the UNCONSUMED head (later probes of this key may
              // need the same state row): equal key, time at-or-after,
              // within tolerance
              if (rIter.hasNext) {
                val r = rIter.head
                val rk = rKeyProj(r)
                if (!rk.anyNull && keyOrd.compare(rk, lk) == 0) {
                  val rt = rTimeProj(r)
                  if (!rt.isNullAt(0) && timeOrd.compare(rt, lt) >= 0 &&
                      (!needTol || withinTol(timeLong(rt), timeLong(lt))))
                    emit(l, r)
                  else nonMatch(l)
                } else nonMatch(l)
              } else nonMatch(l)
            } else if (candidateKey != null && keyOrd.compare(candidateKey, lk) == 0 &&
                (!needTol || withinTol(timeLong(lt), candidateTime))) {
              emit(l, candidate)
            } else nonMatch(l)
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinExec {
  /** Time types the tolerance bound supports: fixed-point types whose
    * internal representation subtracts meaningfully (timestamp micros,
    * date days, raw integers).
    */
  private[plans] def tolerable(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | LongType | IntegerType | DateType => true
    case _ => false
  }
}
