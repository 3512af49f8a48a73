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
}
