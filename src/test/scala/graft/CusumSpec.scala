package graft

import graft.operators.TimeSeries

/** CUSUM control chart (TimeSeries.cusumAlerts): the closed-form
  * prefix-sum/prefix-min rewrite against the hand-run
  * max(0, S + d) recurrence, the reset-at-zero behavior, alert
  * threshold crossing, per-key independence, and the guard.
  */
class CusumSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], k: Long, h: Long) =
    TimeSeries.cusumAlerts(rows.toDF("key", "t", "x"), "key", "t", "x", k, h)
      .orderBy("key", "t")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getBoolean(4)))

  test("hand-run recurrence: dips clamp at zero, spikes accumulate") {
    // k=2: d = [-2, -2, 7, 7] -> S = [0, 0, 7, 14]; h=5 alerts at t=3,4
    val rows = Seq(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 9L), ("a", 4L, 9L))
    assert(run(rows, 2L, 5L).toSeq == Seq(
      ("a", 1L, 0L, false), ("a", 2L, 0L, false),
      ("a", 3L, 7L, true), ("a", 4L, 14L, true)))
  }

  test("decay after a spike, without going negative") {
    // k=2: x=[9,0,0,9] -> d=[7,-2,-2,7] -> S=[7,5,3,10]
    val rows = Seq(("a", 1L, 9L), ("a", 2L, 0L), ("a", 3L, 0L), ("a", 4L, 9L))
    assert(run(rows, 2L, 6L).map(r => (r._3, r._4)).toSeq ==
      Seq((7L, true), (5L, false), (3L, false), (10L, true)))
  }

  test("a clamped-to-zero stretch forgets history completely") {
    // after a deep dip, the next spike starts from 0, not from the dip
    // k=0: x=[-10, 3] -> S=[0, 3] (not -7)
    val rows = Seq(("a", 1L, -10L), ("a", 2L, 3L))
    assert(run(rows, 0L, 100L).map(_._3).toSeq == Seq(0L, 3L))
  }

  test("keys are independent") {
    val rows = Seq(("a", 1L, 9L), ("b", 1L, 0L), ("a", 2L, 9L), ("b", 2L, 0L))
    val out = run(rows, 2L, 5L)
    assert(out.filter(_._1 == "a").map(_._3).toSeq == Seq(7L, 14L))
    assert(out.filter(_._1 == "b").map(_._3).toSeq == Seq(0L, 0L))
  }

  test("threshold guard") {
    intercept[IllegalArgumentException] {
      TimeSeries.cusumAlerts(Seq(("a", 1L, 1L)).toDF("key", "t", "x"),
        "key", "t", "x", 0L, 0L)
    }
  }
}
