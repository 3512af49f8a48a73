package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** User-journey operators over keyed event streams.
  *
  * Ref behavior: the reference's per-server stream aggregation
  * (jobs/job1.py) keyed by host; these generalize the same
  * shuffle-by-key shapes to per-user journey analysis.
  */
object Behavior {

  /** Ordered-funnel conversion with SEQUENTIAL semantics: a user is at
    * stage k iff for every step i ≤ k the first qualifying `steps(i-1)`
    * event is strictly after the stage-(i-1) anchor (an out-of-order
    * later-step event does not convert). Input must carry `user_id`,
    * `event_type`, and an integer event-time `tu`.
    *
    * Output: (user_id, stage, t1..tn) — stage ∈ [0, steps.length], tᵢ
    * the anchor time of step i (null once the funnel broke).
    *
    * Scale: the sequential dependency is irreducibly one min-aggregate
    * per stage, each joined to the previous anchor — but every exchange
    * hashes the SAME key (user_id), so stages co-locate, anchor frames
    * are ≤|users| rows (broadcast-able), and stage k+1 only scans
    * stage-k survivors' candidate events. No window sort, no state
    * bigger than one (user, anchor) row per stage.
    */
  def funnelStages(ev: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val anchors = steps.zipWithIndex.foldLeft(List.empty[DataFrame]) {
      case (acc, (step, i)) =>
        val cand = ev.filter(col("event_type") === step)
        val anchored = acc.headOption match {
          case None =>
            cand.groupBy(col("user_id")).agg(min(col("tu")).as(s"t${i + 1}"))
          case Some(prev) =>
            cand.join(prev.select(col("user_id"), col(s"t$i")), "user_id")
              .where(col("tu") > col(s"t$i"))
              .groupBy(col("user_id")).agg(min(col("tu")).as(s"t${i + 1}"))
        }
        anchored :: acc
    }.reverse
    val joined = anchors.foldLeft(ev.select(col("user_id")).distinct()) {
      (b, a) => b.join(a, Seq("user_id"), "left")
    }
    val stage = steps.indices.foldLeft(lit(0L)) { (els, i) =>
      when(col(s"t${i + 1}").isNotNull, lit((i + 1).toLong)).otherwise(els)
    }
    joined.select(col("user_id") +: stage.as("stage") +:
      steps.indices.map(i => col(s"t${i + 1}")): _*)
  }

  /** Rows of the typed streaming funnel. */
  case class FunnelEvent(user_id: Long, event_type: String, tu: Long)
  case class StageAdvance(user_id: Long, stage: Int, tu: Long)

  /** Per-user funnel progress: next step index awaited + last anchor.
    * O(1) per key — the stream-state analogue of one anchor row. */
  case class FunnelState(stage: Int, anchor: Long)

  /** Streaming form of [[funnelStages]]: per-user GroupState tracks the
    * awaited step and its anchor across micro-batches, emitting one
    * StageAdvance per conversion (Append mode). Identical semantics to
    * the batch form when each user's events are processed in event-time
    * order: "first qualifying event strictly after the previous anchor"
    * is exactly the greedy pass the batch min-aggregates compute — so
    * each batch's group is sorted by (tu, then type for determinism)
    * before folding, and cross-batch order is the stream's delivery
    * contract (front it with a watermarked sort if the wire reorders;
    * same caveat as [[graft.streaming.Transitions.transitionsStream]]).
    *
    * Scale: state is two numbers per user, never grows, no timeout
    * needed for boundedness; per-batch work is one sort of that user's
    * batch slice. FunnelStreamSpec proves batch parity on the fixture
    * events and state survival across micro-batch splits.
    */
  def funnelStream(ds: Dataset[FunnelEvent], steps: Seq[String])
      : Dataset[StageAdvance] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          var cur = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val out = rows.toSeq.sortBy(e => (e.tu, e.event_type)).flatMap { e =>
            if (cur.stage < steps.length && e.event_type == steps(cur.stage) &&
                (cur.stage == 0 || e.tu > cur.anchor)) {
              cur = FunnelState(cur.stage + 1, e.tu)
              Some(StageAdvance(uid, cur.stage, e.tu))
            } else None
          }
          state.update(cur)
          out.iterator
      }
  }
}
