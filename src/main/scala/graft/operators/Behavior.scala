package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** User-journey operators over keyed event streams.
  *
  * Ref behavior: the reference's per-server stream aggregation
  * (spark_jobs/spark_job1.py) keyed by host; these generalize the same
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

  /** A completed funnel: first-step anchor, completion time, and the
    * end-to-end conversion latency (t_last − t_first). */
  case class Conversion(user_id: Long, t_first: Long, t_last: Long,
                        latency_us: Long)

  /** [[FunnelState]] plus the stage-1 anchor the latency is measured
    * from — still O(1) per key. */
  case class ConvState(stage: Int, anchor: Long, first: Long)

  /** Streaming conversions: the same greedy per-user fold as
    * [[funnelStream]], but tracking the stage-1 anchor so the funnel's
    * COMPLETION emits one (t_first, t_last, latency) row — the stream
    * analogue of the batch `funnelStages(...).filter(stage === n)`
    * latency input. A user emits at most once (the state parks at
    * steps.length afterwards), matching the batch form's
    * first-completion semantics. Same delivery contract and O(1)-per-key
    * state as [[funnelStream]].
    */
  def conversionsStream(ds: Dataset[FunnelEvent], steps: Seq[String])
      : Dataset[Conversion] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[ConvState]) =>
          var cur = state.getOption.getOrElse(ConvState(0, Long.MinValue, 0L))
          val out = rows.toSeq.sortBy(e => (e.tu, e.event_type)).flatMap { e =>
            if (cur.stage < steps.length && e.event_type == steps(cur.stage) &&
                (cur.stage == 0 || e.tu > cur.anchor)) {
              cur = ConvState(cur.stage + 1, e.tu,
                if (cur.stage == 0) e.tu else cur.first)
              if (cur.stage == steps.length)
                Some(Conversion(uid, cur.first, e.tu, e.tu - cur.first))
              else None
            } else None
          }
          state.update(cur)
          out.iterator
      }
  }

  /** Per-window conversion-latency percentiles over a conversion stream
    * — the streaming twin of `q_conversion_latency`'s summary, emitted
    * once per closed tumbling window of COMPLETION time (Append mode:
    * a window's row is final when the watermark passes its end).
    *
    * Exact percentiles need every value of the window, so the
    * aggregation state is O(conversions per open window) — the
    * irreducible cost of exactness, bounded because conversions are a
    * small fraction of events and windows close; swap the `percentile`
    * calls for `approx_percentile` to make state O(sketch) if a
    * workload ever violates that. Two stateful operators chain here
    * (flatMapGroupsWithState → windowed agg), which Append mode
    * supports: the conversion's completion time is the event time, and
    * `delay` is how long a late-completing user can still count.
    */
  def conversionLatencyStream(conv: Dataset[Conversion], windowSec: Int,
                              delay: String = "0 seconds"): DataFrame = {
    conv.toDF()
      .withColumn("ts", timestamp_micros(col("t_last")))
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), s"$windowSec seconds"))
      .agg(count(lit(1)).as("n_converted"),
        expr("percentile(latency_us, 0.5)").as("p50_us"),
        expr("percentile(latency_us, 0.9)").as("p90_us"))
      .select(col("window.start").as("win_start"), col("n_converted"),
        col("p50_us"), col("p90_us"))
  }
}
