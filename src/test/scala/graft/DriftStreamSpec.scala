package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Profiling

/** Streaming histogram drift: each closed window's verdict must equal
  * the hand-computed fraction-free L1 against the static baseline,
  * groups absent from the baseline are dropped, and the decision is
  * independent of micro-batch boundaries.
  */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  // baseline for group g: bins 0 and 1 hold two values each → n_ref 4
  private val refRows = Seq(("g", 5L), ("g", 95L), ("g", 105L), ("g", 115L))

  test("window verdicts equal the batch L1; unknown groups drop") {
    val baseline = Profiling.histogramBaseline(
      refRows.toDF("g", "v"), "g", "v", binWidth = 100L, maxBin = 9)

    // window [0,60): 2 values in bin 0, 2 in bin 1 — matches the
    // baseline shape exactly → l1 = 0.
    // window [60,120): all 3 values in bin 0 — l1 = |3·4−2·3|+|0·4−2·3|
    // = 6+6 = 12 over n_win·n_ref = 12 → 1,000,000 ppm.
    // group "h" streams but has no baseline row → dropped.
    val events = Seq(
      ("g", ts(1), 7L), ("g", ts(10), 102L), ("g", ts(30), 9L),
      ("g", ts(50), 110L),
      ("g", ts(61), 8L), ("g", ts(80), 3L), ("g", ts(119), 55L),
      ("h", ts(5), 7L))

    val src = MemoryStream[(String, Timestamp, Long)](spark)
    val q = Profiling.histogramDriftStream(
        src.toDS().toDF("g", "ts", "v"), baseline,
        groupCol = "g", tsCol = "ts", valueCol = "v",
        binWidth = 100L, maxBin = 9,
        windowDur = "60 seconds", watermarkDur = "0 seconds")
      .writeStream.format("memory").queryName("drift_win")
      .outputMode("append").start()
    src.addData(events.take(3): _*); q.processAllAvailable()
    src.addData(events.drop(3): _*); q.processAllAvailable()
    // advance the watermark past every open window
    src.addData(("g", ts(10000), 0L)); q.processAllAvailable()
    q.stop()

    val got = spark.table("drift_win").collect()
      .map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toSet
    assert(got == Set(
      (0L, "g", 4L, 4L, 0L, false),
      (60L, "g", 3L, 4L, 1000000L, true)))
  }
}
