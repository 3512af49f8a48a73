package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.TwsOps

/** Streaming SpaceSaving heavy hitters (TwsOps.spaceSavingTws): the
  * hand-replayed decision trace (increment / fill / evict-min with the
  * inherited-error rule), the two textbook guarantees, batch-split
  * invariance of the trace, and per-key isolation of the k budget.
  */
class SpaceSavingStreamSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[(String, Long, String)]], k: Int,
                  name: String): Seq[(String, Long, String, Long, Long, String)] =
    withRocksDb {
      val src = MemoryStream[(String, Long, String)](spark)
      val q = TwsOps.spaceSavingTws(src.toDS().toDF("key", "t", "item"),
          "key", "t", "item", k)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
        spark.table(name)
          .as[(String, Long, String, Long, Long, String)]
          .collect().toSeq.sortBy(r => (r._1, r._2))
      } finally q.stop()
    }

  // k=2 trace: a,a,b,c,c,a
  private val rows = Seq(
    ("g", 1L, "a"), ("g", 2L, "a"), ("g", 3L, "b"),
    ("g", 4L, "c"), ("g", 5L, "c"), ("g", 6L, "a"))

  // hand replay: a:(1,0) a:(2,0) b fills:(1,0) c evicts min b:(2,1)
  // c:(3,1) a:(3,0)
  private val expected = Seq(
    ("g", 1L, "a", 1L, 0L, null), ("g", 2L, "a", 2L, 0L, null),
    ("g", 3L, "b", 1L, 0L, null), ("g", 4L, "c", 2L, 1L, "b"),
    ("g", 5L, "c", 3L, 1L, null), ("g", 6L, "a", 3L, 0L, null))

  test("hand-replayed trace: increment, fill, evict-min with inherited error") {
    assert(run(Seq(rows), 2, "ss_one") == expected)
  }

  test("the trace is invariant under micro-batch splits") {
    assert(run(Seq(rows.take(3), rows.slice(3, 5), rows.drop(5)), 2,
      "ss_split") == expected)
    assert(run(rows.grouped(1).toSeq, 2, "ss_each") == expected)
  }

  test("eviction tie-break is deterministic: min count, then smallest item") {
    // fill with b then a (both count 1); z must evict 'a', not 'b'
    val out = run(Seq(Seq(("g", 1L, "b"), ("g", 2L, "a"), ("g", 3L, "z"))),
      2, "ss_tie")
    assert(out.last == (("g", 3L, "z", 2L, 1L, "a")))
  }

  test("guarantees on a skewed stream: overestimate, bounded error, hh kept") {
    // 30 of 'hot', one each of 10 fillers, k = 4, interleaved
    val fillers = (1 to 10).map(i => s"f$i")
    val stream = (0 until 40).map { i =>
      val item = if (i % 4 == 3) fillers(i / 4) else "hot"
      ("g", i.toLong + 1, item)
    }
    val n = stream.size.toLong
    val k = 4
    val out = run(Seq(stream), k, "ss_skew")
    // replay final counter state from the trace
    val state = scala.collection.mutable.Map.empty[String, (Long, Long)]
    out.foreach { case (_, _, item, est, err, evicted) =>
      if (evicted != null) state.remove(evicted)
      state(item) = (est, err)
    }
    assert(state.size <= k)
    val trueHot = stream.count(_._3 == "hot").toLong
    assert(trueHot > n / k) // hot IS a phi-heavy hitter...
    assert(state.contains("hot")) // ...so SpaceSaving must track it
    val (estHot, errHot) = state("hot")
    assert(estHot >= trueHot) // estimates never undercount
    assert(estHot - errHot <= trueHot) // est - err is a lower bound
    assert(state.values.forall(_._2 <= n / k)) // error ≤ n/k
  }

  test("the k budget is per key") {
    val out = run(Seq(Seq(
      ("g1", 1L, "x"), ("g1", 2L, "y"),
      ("g2", 3L, "p"), ("g2", 4L, "q"))), 2, "ss_keys")
    // four inserts, no evictions anywhere: each key has its own 2 slots
    assert(out.size == 4 && out.forall(_._6 == null))
  }

  test("k guard") {
    intercept[IllegalArgumentException] {
      TwsOps.spaceSavingTws(Seq(("g", 1L, "a")).toDF("key", "t", "item"),
        "key", "t", "item", 0)
    }
  }
}
