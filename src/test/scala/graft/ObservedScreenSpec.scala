package graft

import graft.operators.Profiling
import org.apache.spark.sql.functions._

/** observe()/CollectMetrics telemetry (Profiling.observedScreen): the
  * counters come out of the SAME action that consumes the frame (no
  * second scan), rows pass through untouched, metrics reflect the
  * point in the plan where the observation is attached, and the
  * handle is reusable across actions.
  */
class ObservedScreenSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, false, false), (2L, true, false), (3L, true, true), (4L, false, true),
    (5L, true, false))

  test("counters ride the consuming action; rows pass through untouched") {
    val df = docs.toDF("id", "flag_a", "flag_b")
    val (out, obs) = Profiling.observedScreen(df, Seq("flag_a", "flag_b"))
    val rows = out.collect()
    assert(rows.length == 5) // pass-through
    val m = obs.get
    assert(m("n_rows") == 5L)
    assert(m("n_flagged_flag_a") == 3L)
    assert(m("n_flagged_flag_b") == 2L)
  }

  test("observation placed BEFORE a filter counts the pre-filter stream") {
    val df = docs.toDF("id", "flag_a", "flag_b")
    val (out, obs) = Profiling.observedScreen(df, Seq("flag_a"), "pre_filter")
    val kept = out.filter(!col("flag_a")).collect()
    assert(kept.length == 2)   // the filter dropped 3
    assert(obs.get("n_rows") == 5L) // but telemetry saw all 5
  }

  test("empty flag list is rejected") {
    intercept[IllegalArgumentException] {
      Profiling.observedScreen(docs.toDF("id", "a", "b"), Seq.empty)
    }
  }
}
