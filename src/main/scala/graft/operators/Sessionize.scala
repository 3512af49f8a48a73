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
}
