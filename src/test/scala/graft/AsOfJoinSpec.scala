package graft

import java.sql.Timestamp
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("as-of join: latest state at-or-before each probe; null before first state") {
    val probes = Seq(
      (1L, ts(50), "u1", 0.5),   // before any state → null
      (2L, ts(100), "u1", 0.6),  // exactly at state(100) → 10.0
      (3L, ts(150), "u1", 0.7),  // between → 10.0
      (4L, ts(250), "u1", 0.8),  // after state(200) → 20.0
      (5L, ts(250), "u2", 0.9)   // other key, no states → null
    ).toDF("event_id", "ts", "user_id", "value")
    val states = Seq(
      ("u1", ts(100), 10.0), ("u1", ts(200), 20.0)
    ).toDF("user_id", "ts", "sval")

    val out = AsOfJoin.asOf(probes, states, Seq("user_id"), "ts", Seq("sval"))
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains(10.0))
    assert(out(3L).contains(10.0))
    assert(out(4L).contains(20.0))
    assert(out(5L).isEmpty)
  }

  test("as-of join preserves a state row whose payload is genuinely NULL") {
    // state(200) carries a NULL sval; a probe after it must see NULL,
    // not the previous state's 10.0 carried over the gap
    val probes = Seq(
      (1L, ts(150), "u1", 0.1),  // after state(100) → 10.0
      (2L, ts(250), "u1", 0.2)   // after NULL-payload state(200) → null
    ).toDF("event_id", "ts", "user_id", "value")
    val states = Seq(
      ("u1", ts(100), Some(10.0)), ("u1", ts(200), Option.empty[Double])
    ).toDF("user_id", "ts", "sval")
    val out = AsOfJoin.asOf(probes, states, Seq("user_id"), "ts", Seq("sval"))
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    assert(out(1L).contains(10.0))
    assert(out(2L).isEmpty)
  }

  test("as-of join keeps every probe row exactly once") {
    val probes = (0 until 100).map(i => (i.toLong, ts(i * 10), "u" + (i % 3), i * 1.0))
      .toDF("event_id", "ts", "user_id", "value")
    val states = Seq(("u0", ts(300), 1.0)).toDF("user_id", "ts", "sval")
    val out = AsOfJoin.asOf(probes, states, Seq("user_id"), "ts", Seq("sval"))
    assert(out.count() == 100)
    assert(out.select("event_id").distinct().count() == 100)
  }
}
