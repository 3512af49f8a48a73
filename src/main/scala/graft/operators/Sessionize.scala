package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sessionization: merge each key's events into sessions separated by
  * silence gaps ≥ `gap` — the user-session / document-burst constructor
  * a training pipeline uses to turn event logs into examples.
  *
  * Built on Spark's native `session_window` (A1's data-driven sibling):
  * in batch it is one shuffle on the key + a sort-based merge per key;
  * in streaming the same call maintains watermark-bounded session state
  * with merge-on-update. Merge is boundary-INCLUSIVE — an event at
  * exactly `prev + gap` extends the session (measured; SessionizeSpec
  * pins it) — which a gaps-and-islands SQL oracle (lag + cumulative
  * flag sum, new session iff silence > gap) reproduces exactly on
  * integer-ms arithmetic.
  *
  * Scale: state/shuffle are keyed by the session key; skewed keys are
  * ordinary agg skew (AQE / salting); nothing is corpus-quadratic.
  */
object Sessionize {

  /** Sessions per key with aggregates; emits epoch-second bounds
    * (engine-portable — see the oracle rules in SimilarityQueries et al).
    */
  def sessions(df: DataFrame, keyCol: String, tsCol: String, gap: String,
               aggs: Seq[Column]): DataFrame =
    df.groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start").cast("long"))
      .withColumn("session_end", col("session_window.end").cast("long"))
      .drop("session_window")

  /** Streaming form: identical grouping, with the watermark that lets
    * the engine finalize (emit + evict) a session once event time has
    * moved `watermark` past its close — Append-mode output, state
    * bounded by active sessions × keys. Same session semantics as the
    * batch form (SessionizeSpec asserts stream ≡ batch on shared input).
    */
  def sessionsStream(df: DataFrame, keyCol: String, tsCol: String, gap: String,
                     watermark: String, aggs: Seq[Column]): DataFrame =
    sessions(df.withWatermark(tsCol, watermark), keyCol, tsCol, gap, aggs)

  /** Per-key explicit session state for the timeout form. */
  final case class SessState(startUs: Long, lastUs: Long, n: Long)

  /** One closed session. `session_end_us` is the LAST EVENT's time
    * (the `session_window` form reports last + gap — callers compare
    * accordingly).
    */
  final case class SessOut(key: Long, session_start_us: Long,
                           session_end_us: Long, n_events: Long)

  /** CUSTOM-STATE sessionizer with EVENT-TIME TIMEOUT — the
    * `flatMapGroupsWithState` + `GroupStateTimeout.EventTimeTimeout`
    * facet of the state API (the built-in `session_window` path above
    * cannot run user code at session close; this one can — enrich,
    * side-output, price the session — and is the template for any
    * "emit when the key goes quiet" operator).
    *
    * Semantics: events within `gapUs` of EITHER session edge extend it
    * (start can move backward for a late-but-in-gap arrival); an event
    * past `last + gap` closes the session (emitted immediately) and
    * opens a new one; an event before `start − gap` — a cross-batch
    * stray from an era whose sessions may already be emitted — emits
    * as its own singleton session (never silently folded, never lost);
    * the watermark passing `last + gap` fires the timeout and emits
    * the still-open session. Equals batch gaps-and-islands whenever
    * cross-batch arrival is nondecreasing BY SESSION (within-batch
    * order is arbitrary — the batch slice is sorted); online emission
    * cannot retroactively merge strays into sessions already emitted,
    * which is the inherent stream/batch boundary every append-mode
    * sessionizer has. SessionTimeoutStreamSpec pins all four paths.
    *
    * Scale: state is ONE SessState per active key (not per event);
    * shuffle is the groupByKey on the session key; timeouts evict
    * state, so resident size tracks concurrently-active keys only.
    */
  def sessionsTimeoutStream(df: DataFrame, keyCol: String, tsCol: String,
      gapUs: Long, watermark: String): org.apache.spark.sql.Dataset[SessOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    // the WATERMARKED TIMESTAMP COLUMN must reach the stateful operator
    // unchanged — projecting it to a long would strip the watermark tag
    // and fail analysis ("Event-time timeout not supported without
    // watermark"); micros are derived inside the lambda instead
    df.withWatermark(tsCol, watermark)
      .select(col(keyCol).cast("long").as("k"), col(tsCol).as("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (key: Long, raw: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[SessState]) =>
          val rows = raw.map { case (k, t) =>
            (k, graft.core.TimeCodec.micros(t))
          }
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessOut(key, s.startUs, s.lastUs, s.n))
          } else {
            // in-batch arrival order is not event order — sort the
            // micro-batch slice. Cross-batch disorder (bounded by the
            // watermark) is handled by EXTENT, not arrival: an event
            // within `gap` of either session edge extends that edge
            // (including moving `start` BACKWARD); an event more than
            // `gap` before the current start is a stray from an
            // already-sealed era — it emits as its own session rather
            // than corrupting the current one (online emission cannot
            // retroactively merge it with sessions already emitted;
            // equality with batch gaps-and-islands holds whenever
            // cross-batch arrival is nondecreasing by session).
            val ts = rows.map(_._2).toArray
            java.util.Arrays.sort(ts)
            var closed = List.empty[SessOut]
            var cur = state.getOption.orNull
            ts.foreach { t =>
              cur =
                if (cur == null) SessState(t, t, 1)
                else if (t - cur.lastUs > gapUs) {
                  closed ::= SessOut(key, cur.startUs, cur.lastUs, cur.n)
                  SessState(t, t, 1)
                } else if (cur.startUs - t > gapUs) {
                  closed ::= SessOut(key, t, t, 1)
                  cur
                } else SessState(math.min(cur.startUs, t),
                  math.max(cur.lastUs, t), cur.n + 1)
            }
            state.update(cur)
            // fire once the watermark clears the session's close
            state.setTimeoutTimestamp((cur.lastUs + gapUs) / 1000 + 1)
            closed.reverse.iterator
          }
      }
  }

  /** Session-transcript assembly under a token budget — the chat-data
    * export step: each key's events are cut into gap-separated sessions
    * (gaps-and-islands, so every EVENT carries its session id — the
    * `session_window` aggregate form above can't hand per-row ids to a
    * downstream prefix cut), ordered within the session by (time, id),
    * and concatenated until the running token cost exceeds `budget`;
    * the remainder is counted, not silently lost. Cost per event =
    * length(textCol) + 1 (the separator) — exact integers.
    *
    * Output per session: key, session_start (epoch µs), n_events,
    * n_kept, n_dropped, assembled (the kept texts joined by spaces).
    *
    * Scale: both windows partition by key (and key+session) — fully
    * parallel, no global window; the assembled string is bounded by
    * `budget` tokens by construction, so rows stay small no matter how
    * long a session runs. One exchange on key, one aggregate on
    * (key, session).
    *
    * Contract: `budget` must be ≥ the largest single-event cost, so the
    * first event of every session is always kept and `assembled` is
    * never empty (an all-truncated session would surface as "" here but
    * NULL from a SQL string_agg — a cross-engine mismatch this
    * precondition rules out).
    */
  def assembleSessions(df: DataFrame, keyCol: String, idCol: String,
                       textCol: String, tsCol: String,
                       gapUs: Long, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wK = Window.partitionBy(col(keyCol)).orderBy(col("tu"), col(idCol))
    val wS = Window.partitionBy(col(keyCol), col("sid"))
      .orderBy(col("tu"), col(idCol))
    df.select(col(keyCol), col(idCol), col(textCol).as("txt"),
        expr(s"unix_micros(`$tsCol`)").as("tu"))
      .withColumn("prev", lag(col("tu"), 1).over(wK))
      .withColumn("brk",
        when(col("prev").isNull || col("tu") - col("prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(wK))
      .withColumn("cum", sum((length(col("txt")) + 1).cast("long")).over(wS))
      .groupBy(col(keyCol), col("sid"))
      .agg(min(col("tu")).as("session_start"),
        count(lit(1)).as("n_events"),
        sum(when(col("cum") <= budget, 1L).otherwise(0L)).as("n_kept"),
        // collect_list drops the CASE's nulls (the over-budget tail);
        // array_sort on (tu, id, txt) restores event order
        concat_ws(" ", expr(
          s"""transform(
             |  array_sort(collect_list(
             |    CASE WHEN cum <= $budget
             |         THEN struct(tu, `$idCol` AS eid, txt) END)),
             |  x -> x.txt)""".stripMargin)).as("assembled"))
      .withColumn("n_dropped", col("n_events") - col("n_kept"))
      .select(col(keyCol), col("session_start"), col("n_events"),
        col("n_kept"), col("n_dropped"), col("assembled"))
  }

  /** DEBOUNCE (alert rate-limiting): keep an event only if it is more
    * than `cooldownUs` after the last KEPT event of its key — the
    * anchor-advances-on-keep semantics that suppresses alert storms.
    * NOT gap-sessionization: a burst of events 1s apart keeps one
    * event per cooldown window, whereas a session would extend
    * indefinitely and keep only its first.
    *
    * Sequential by definition (each keep decision depends on the
    * previous KEEP, not the previous row), so lag()/windows cannot
    * express it; instead the per-key scan runs as ONE codegen'd
    * `aggregate()` fold over the sorted (epoch, tie) array — declarative,
    * no typed-API detour, engine-exact integer comparisons. Per-key
    * event counts bound the array (the q_chat_assembly argument); the
    * shuffle is the single groupBy(key).
    *
    * Output: (keyCol, e_us, tie) of kept events. The initial anchor is
    * −2⁶² so the first event always keeps without `e − last` overflow.
    */
  def debounce(df: DataFrame, keyCol: String, epochCol: String,
               tieCol: String, cooldownUs: Long): DataFrame = {
    require(cooldownUs >= 0)
    val packed = df.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(epochCol).cast("long").as("e"),
        col(tieCol).cast("long").as("tie")))).as("arr"))
    packed.select(col(keyCol), explode(expr(
        s"""aggregate(arr,
           |  named_struct('last', -4611686018427387904L,
           |    'kept', CAST(array() AS ARRAY<STRUCT<e: BIGINT, tie: BIGINT>>)),
           |  (acc, x) -> IF(x.e - acc.last > ${cooldownUs}L,
           |    named_struct('last', x.e, 'kept', array_append(acc.kept, x)),
           |    acc),
           |  acc -> acc.kept)""".stripMargin)).as("__kept"))
      .select(col(keyCol), col("__kept.e").as("e_us"),
        col("__kept.tie").as(tieCol))
  }
}
