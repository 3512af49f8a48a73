package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.TwsOps

/** Event-time token-bucket rate limiter (TwsOps.tokenBucketTws): a
  * hand-computed refill/deny trace, cap clamping, per-key isolation,
  * batch-split invariance, and in-batch timestamp sorting. TimeMode
  * is None (no timers/TTL), so unlike the ProcessingTime TWS services
  * this topology quiesces under processAllAvailable.
  */
class TokenBucketSpec extends SparkSpec {
  import spark.implicits._

  /** Run batches through the limiter (capacity 2, 1 token/s) and
    * collect (key, ts_us, allowed, tokens_after_utok) ordered by ts.
    */
  private def run(batches: Seq[Seq[(String, Long)]],
                  name: String): Seq[(String, Long, Boolean, Long)] =
    withRocksDb {
      val src = MemoryStream[(String, Long)](spark)
      val q = TwsOps.tokenBucketTws(src.toDS().toDF("k", "ts"), "k", "ts",
          capacity = 2L, ratePerSec = 1L)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
        spark.table(name)
          .as[(String, Long, Boolean, Long)]
          .collect().toSeq.sortBy(r => (r._1, r._2))
      } finally q.stop()
    }

  private val trace = Seq(
    ("a", 0L), ("a", 200000L), ("a", 400000L), ("a", 2400000L), ("a", 2500000L))

  private val expected = Seq(
    ("a", 0L, true, 1000000L),       // full bucket, spend 1 of 2
    ("a", 200000L, true, 200000L),   // +0.2 tok refill, spend
    ("a", 400000L, false, 400000L),  // 0.4 tok < 1 -> throttled
    ("a", 2400000L, true, 1000000L), // refill clamps at cap 2, spend
    ("a", 2500000L, true, 100000L))  // +0.1 tok, spend

  test("hand-computed refill/deny trace with cap clamping") {
    assert(run(Seq(trace), "tb_one") == expected)
  }

  test("the verdict sequence is invariant to micro-batch splits") {
    assert(run(Seq(trace.take(3), trace.drop(3)), "tb_split") == expected)
    assert(run(trace.map(Seq(_)), "tb_each") == expected)
  }

  test("rows inside one batch are processed in timestamp order") {
    assert(run(Seq(trace.reverse), "tb_shuffled") == expected)
  }

  test("keys hold independent buckets") {
    val two = trace ++ trace.map { case (_, t) => ("b", t) }
    val out = run(Seq(two), "tb_keys")
    assert(out.filter(_._1 == "a").map(r => (r._2, r._3, r._4)) ==
      expected.map(r => (r._2, r._3, r._4)))
    assert(out.filter(_._1 == "b").map(r => (r._2, r._3, r._4)) ==
      expected.map(r => (r._2, r._3, r._4)))
  }

  test("equal timestamps refill nothing") {
    // burst of 4 at t=0 against capacity 2: two pass, two throttled
    // (rows tie on (key, ts) so assert the multiset, not the order)
    val burst = Seq(("c", 0L), ("c", 0L), ("c", 0L), ("c", 0L))
    val out = run(Seq(burst), "tb_burst")
    assert(out.count(_._3) == 2 && out.count(!_._3) == 2)
    assert(out.map(_._4).min == 0L)
  }

  test("extreme gap × rate refill clamps to cap instead of wrapping") {
    // refill = 1e9 us × 9223372036/s ≈ 9.2233720e18: the PRODUCT fits
    // a long (multiplyExact passes) but utok + refill wraps negative,
    // and min() would then keep the negative bucket — throttling every
    // later event. The clamp must land exactly at full-minus-one-spend.
    val out = withRocksDb {
      val src = MemoryStream[(String, Long)](spark)
      val q = TwsOps.tokenBucketTws(src.toDS().toDF("k", "ts"), "k", "ts",
          capacity = 2000L, ratePerSec = 9223372036L)
        .writeStream.format("memory").queryName("tb_wrap")
        .outputMode("append").start()
      try {
        // gap 2: 1e9 us × rate ≈ 9.2e18 — the PRODUCT fits a long but
        // the sum would wrap; gap 3: 2e9 us × rate ≈ 1.8e19 — the
        // product ITSELF overflows (a multiplyExact here would throw
        // and kill the query on one extreme-gap event)
        src.addData(("w", 0L), ("w", 1000000000L), ("w", 3000000000L))
        q.processAllAvailable()
        spark.table("tb_wrap")
          .as[(String, Long, Boolean, Long)]
          .collect().toSeq.sortBy(_._2)
      } finally q.stop()
    }
    val capUtok = 2000L * 1000000L
    assert(out == Seq(
      ("w", 0L, true, capUtok - 1000000L),
      ("w", 1000000000L, true, capUtok - 1000000L),
      ("w", 3000000000L, true, capUtok - 1000000L)))
  }

  test("guards: positive capacity and rate") {
    val df = Seq(("a", 0L)).toDF("k", "ts")
    intercept[IllegalArgumentException] {
      TwsOps.tokenBucketTws(df, "k", "ts", 0L, 1L)
    }
    intercept[IllegalArgumentException] {
      TwsOps.tokenBucketTws(df, "k", "ts", 1L, 0L)
    }
  }
}
