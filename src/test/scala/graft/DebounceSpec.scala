package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Sessionize
import graft.streaming.TwsOps

/** Debounce semantics (batch fold + streaming TWS twin): the anchor
  * advances on KEEP, distinguishing it from gap-sessionization, and
  * the stream matches the batch over the closed region.
  */
class DebounceSpec extends SparkSpec {
  import spark.implicits._

  test("debounce: anchor advances on keep, NOT on every event") {
    // events at 0, 4, 8, 12 with cooldown 5: keep 0 (anchor 0), drop 4,
    // keep 8 (anchor 8), drop 12. A gap-session (gap 5) would instead
    // extend through every 4-apart event and keep only t=0.
    val df = Seq(("a", 0L, 1L), ("a", 4L, 2L), ("a", 8L, 3L), ("a", 12L, 4L))
      .toDF("k", "e", "id")
    val kept = Sessionize.debounce(df, "k", "e", "id", cooldownUs = 5L)
      .collect().map(_.getLong(1)).sorted
    assert(kept.toSeq == Seq(0L, 8L))
  }

  test("debounce: per-key isolation, tie order, zero cooldown keeps all") {
    val df = Seq(("a", 10L, 2L), ("a", 10L, 1L), ("b", 10L, 1L))
      .toDF("k", "e", "id")
    // cooldown 0: e - last > 0 means the SECOND event at the same
    // epoch drops (not strictly later) — ties resolve by id order
    val kept = Sessionize.debounce(df, "k", "e", "id", 0L)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(kept == Set(("a", 1L), ("b", 1L)))
  }

  private def settle(q: org.apache.spark.sql.streaming.StreamingQuery,
                     table: String, atLeast: Long): Unit = {
    val deadline = System.currentTimeMillis + 30000
    var prev = -1L
    var cur = spark.table(table).count()
    while ((cur < atLeast || cur != prev) &&
        System.currentTimeMillis < deadline) {
      Thread.sleep(150)
      q.processAllAvailable()
      prev = cur
      cur = spark.table(table).count()
    }
  }

  test("stream ≡ batch over the closed region, out-of-order arrival") {
    withRocksDb {
      val src = MemoryStream[(String, Long, Long)](spark)
      val obs = src.toDF().toDF("k", "sec", "tie")
        .select(col("k"), expr("timestamp_seconds(sec)").as("ts"), col("tie"))
      val out = TwsOps.debounceTws(obs, "k", "ts", "tie",
        cooldownUs = 5000000L, watermark = "0 seconds")
      val q = out.writeStream.format("memory").queryName("debounce_tws")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("db-ck").toString)
        .outputMode("append").start()
      try {
        // B-anchored epochs (epoch-0 rows would be late against the
        // engine's INITIAL watermark of 0 — the AsOfTwsSpec convention);
        // out of order within the batch; the anchor chain must follow
        // event time: B keep, B+4 drop, B+8 keep, B+12 drop
        val B = 1000L
        def us(sec: Long) = sec * 1000000L
        src.addData(("a", B + 12, 4L), ("a", B, 1L), ("a", B + 8, 3L),
          ("a", B + 4, 2L))
        q.processAllAvailable()
        src.addData(("a", B + 100, 9L)) // advance watermark, close all
        q.processAllAvailable()
        settle(q, "debounce_tws", 2)
        val got = spark.table("debounce_tws").collect()
          .map(_.getAs[Long]("e_us")).sorted.toSeq
        assert(got == Seq(us(B), us(B + 8)))
        // the anchor carried ACROSS batches: the event 2s after the
        // kept B+100 one is inside its cooldown once it closes
        src.addData(("a", B + 102, 10L), ("a", B + 110, 11L))
        q.processAllAvailable()
        src.addData(("a", B + 200, 12L))
        q.processAllAvailable()
        settle(q, "debounce_tws", 4)
        val all = spark.table("debounce_tws").collect()
          .map(_.getAs[Long]("e_us")).sorted.toSeq
        assert(all == Seq(us(B), us(B + 8), us(B + 100), us(B + 110)),
          s"got $all")
      } finally q.stop()
    }
  }
}
