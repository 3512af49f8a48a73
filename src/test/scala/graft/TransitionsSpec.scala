package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Transitions
import graft.streaming.Transitions.{KeyedValue, Transition}

/** Custom-state streaming (flatMapGroupsWithState): the streaming
  * transition detector must equal the batch lag() form on the same
  * input, with per-key state surviving micro-batch boundaries.
  */
class TransitionsSpec extends SparkSpec {
  import spark.implicits._

  private val events = Seq(
    KeyedValue("s1", 10, "OK"), KeyedValue("s1", 20, "OK"),
    KeyedValue("s1", 30, "CPU"), KeyedValue("s1", 40, "CPU"),
    KeyedValue("s1", 50, "OK"),
    KeyedValue("s2", 10, "MEM"), KeyedValue("s2", 20, "MEM"))

  private val expected = Set(
    Transition("s1", 10, "", "OK"), Transition("s1", 30, "OK", "CPU"),
    Transition("s1", 50, "CPU", "OK"), Transition("s2", 10, "", "MEM"))

  test("batch lag form emits exactly the edges") {
    val got = Transitions.transitionsBatch(events.toDF(), "key", "order", "value")
      .as[Transition].collect().toSet
    assert(got == expected)
  }

  test("streaming flatMapGroupsWithState equals batch form; state crosses batches") {
    val src = MemoryStream[KeyedValue](spark)
    val q = Transitions.transitionsStream(src.toDS())
      .writeStream.format("memory").queryName("transitions")
      .outputMode("append").start()
    // split MID-EPISODE: s1 is in "CPU" at the batch boundary — batch 2's
    // first row (40, "CPU") must NOT re-emit, proving state persisted
    src.addData(events.take(4): _*)
    q.processAllAvailable()
    src.addData(events.drop(4): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("transitions").as[Transition].collect().toSet
    assert(got == expected)
  }

  test("batch and stream agree on the empty-string-first edge case") {
    // a key whose FIRST value is "" must emit in both forms ("no prior"
    // is positional, not the "" sentinel), and the ""→"X" edge follows
    val edge = Seq(KeyedValue("e", 1, ""), KeyedValue("e", 2, ""), KeyedValue("e", 3, "X"))
    val expectedEdge = Set(Transition("e", 1, "", ""), Transition("e", 3, "", "X"))
    val batch = Transitions.transitionsBatch(edge.toDF(), "key", "order", "value")
      .as[Transition].collect().toSet
    assert(batch == expectedEdge)
    val src = MemoryStream[KeyedValue](spark)
    val q = Transitions.transitionsStream(src.toDS())
      .writeStream.format("memory").queryName("edge_empty")
      .outputMode("append").start()
    src.addData(edge: _*)
    q.processAllAvailable()
    q.stop()
    assert(spark.table("edge_empty").as[Transition].collect().toSet == expectedEdge)
  }

  test("batch form compares null values null-safely instead of dropping rows") {
    val rows = Seq(("n", 1L, "A"), ("n", 2L, null), ("n", 3L, null), ("n", 4L, "A"))
      .toDF("key", "order", "value")
    val got = Transitions.transitionsBatch(rows, "key", "order", "value")
      .select("key", "order", "from_value", "to_value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    // A→null emits (null-safe !=), null→null suppressed, null→A emits with "" from
    assert(got == Set(("n", 1L, "", "A"), ("n", 2L, "A", null), ("n", 4L, "", "A")))
  }

  test("streaming state is one value per key (bounded), not event history") {
    // 500 same-value events for one key → exactly one emitted transition
    val src = MemoryStream[KeyedValue](spark)
    val q = Transitions.transitionsStream(src.toDS())
      .writeStream.format("memory").queryName("bounded")
      .outputMode("append").start()
    src.addData((1 to 500).map(i => KeyedValue("k", i.toLong, "SAME")): _*)
    q.processAllAvailable()
    val state = q.lastProgress.stateOperators.head.numRowsTotal
    q.stop()
    assert(spark.table("bounded").count() == 1)
    assert(state == 1) // one state row for the one key
  }
}
