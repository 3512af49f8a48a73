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
    * value in `orderCol` order; a key's first row is an edge from "".
    */
  def transitionsBatch(df: DataFrame, keyCol: String, orderCol: String,
                       valCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    df.withColumn("_prev", lag(col(valCol), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col(valCol))
      .select(col(keyCol), col(orderCol),
        coalesce(col("_prev"), lit("")).as("from_value"),
        col(valCol).as("to_value"))
  }

  /** Streaming form: per-key GroupState carries the current value across
    * micro-batches; each batch's rows are processed in `order` order
    * (sorted within the group — bounded by per-key batch volume).
    */
  def transitionsStream(ds: Dataset[KeyedValue]): Dataset[Transition] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedValue], state: GroupState[String]) =>
          var cur = state.getOption.getOrElse("")
          val out = rows.toSeq.sortBy(_.order).flatMap { e =>
            if (e.value != cur) {
              val t = Transition(key, e.order, cur, e.value)
              cur = e.value
              Some(t)
            } else None
          }
          state.update(cur)
          out.iterator
      }
  }
}
