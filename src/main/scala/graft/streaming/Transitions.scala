package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed value-change detection ("alert edge de-noising"): the
  * reference's consoles print every window's alert row; what an operator
  * actually pages on is the TRANSITION — a server entering or leaving an
  * alert state. Emitting only changes turns a per-window firehose into
  * an episode log.
  *
  * Two forms with identical semantics (property-checked against each
  * other in TransitionsSpec):
  *
  *  - batch: one `lag()` window — oracle-expressible ANSI SQL, used by
  *    `q_alert_transitions`.
  *  - streaming: `flatMapGroupsWithState` — the custom-state primitive;
  *    a lag window over an unbounded stream is not expressible with
  *    windowed aggregation because the previous value may be arbitrarily
  *    old (no watermark can bound it), which is exactly what
  *    GroupState's per-key persistence is for.
  *
  * Scale: batch is one shuffle+sort on the key; streaming state is ONE
  * short string per key (the current value) — O(|keys|), not O(events) —
  * and never grows, so no timeout is needed for boundedness (add one if
  * key churn is unbounded).
  */
object Transitions {

  /** Input/output rows of the typed streaming form. */
  case class KeyedValue(key: String, order: Long, value: String)
  case class Transition(key: String, order: Long, from_value: String, to_value: String)

  /** Batch form: rows where the value differs from the key's previous
    * value in `orderCol` order; a key's first row is always an edge
    * (from_value ""). "No prior row" is detected positionally
    * (row_number), not via lag()'s NULL — so a first value of "" still
    * emits, a mid-stream NULL value still compares (null-safe `<=>`),
    * and a NULL prev renders as "" in from_value, all matching the
    * streaming form below.
    */
  def transitionsBatch(df: DataFrame, keyCol: String, orderCol: String,
                       valCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    df.withColumn("_prev", lag(col(valCol), 1).over(w))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 || !(col("_prev") <=> col(valCol)))
      .select(col(keyCol), col(orderCol),
        coalesce(col("_prev"), lit("")).as("from_value"),
        col(valCol).as("to_value"))
  }

  /** Per-key streaming state: `seen=false` means "no prior value yet" —
    * distinct from any real value (including "" and null), so the first
    * event always emits, matching the batch form's row_number check.
    */
  case class PrevState(seen: Boolean, value: String)

  /** Streaming form: per-key GroupState carries the current value across
    * micro-batches; each batch's rows are processed in `order` order
    * (sorted within the group — bounded by per-key batch volume).
    * Comparison is Scala `==` (null-safe), mirroring the batch `<=>`;
    * a NULL prior renders as "" in from_value, as batch coalesces.
    */
  def transitionsStream(ds: Dataset[KeyedValue]): Dataset[Transition] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedValue], state: GroupState[PrevState]) =>
          var cur = state.getOption.getOrElse(PrevState(seen = false, value = null))
          val out = rows.toSeq.sortBy(_.order).flatMap { e =>
            if (!cur.seen || e.value != cur.value) {
              val from = if (cur.seen) Option(cur.value).getOrElse("") else ""
              cur = PrevState(seen = true, value = e.value)
              Some(Transition(key, e.order, from, e.value))
            } else None
          }
          state.update(cur)
          out.iterator
      }
  }
}
