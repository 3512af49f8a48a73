package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Sessionize

/** Event-time-timeout custom-state sessionizer
  * (Sessionize.sessionsTimeoutStream): closed-by-gap sessions emit
  * immediately, the still-open session emits when the WATERMARK clears
  * its close, and the result equals the hand gaps-and-islands model
  * regardless of micro-batch splits.
  */
class SessionTimeoutStreamSpec extends SparkSpec {
  import spark.implicits._

  private val gapUs = 60L * 1000000 // 1 minute

  private def ts(s: Long) = new Timestamp(s * 1000)

  // all times ride a base offset: an event at exactly epoch 0 ties the
  // INITIAL watermark and is filtered as late before the operator
  private val B = 1000L

  test("gap-closed sessions emit in-stream; open session emits on timeout") {
    // key 1: events at B+{0,30,50}s | gap | B+{300,310}s   key 2: B only
    // (key 2's lone event must ride batch 1 — by batch 2 the watermark
    // is already past B and would drop it as late)
    val events = Seq((1L, B), (1L, B + 30), (1L, B + 50), (2L, B),
      (1L, B + 300), (1L, B + 310))
    val src = MemoryStream[(Long, Long)](spark)
    val q = Sessionize.sessionsTimeoutStream(
        src.toDS().toDF("user_id", "sec")
          .select(col("user_id"), expr("timestamp_seconds(sec)").as("ts")),
        "user_id", "ts", gapUs, "10 seconds")
      .writeStream.format("memory").queryName("sess_timeout")
      .outputMode("append").start()

    // batch 1: the first sessions form, nothing can close yet
    events.take(4).foreach(e => src.addData(e))
    q.processAllAvailable()
    // batch 2: key 1's +300s event closes its first session in-stream
    // AND pushes the watermark past every other open close
    events.drop(4).foreach(e => src.addData(e))
    q.processAllAvailable()
    // batch 3: a far-future tick advances the watermark so the
    // remaining open sessions time out
    src.addData((99L, 10000L))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sess_timeout")
      .select(col("key"), col("session_start_us"), col("session_end_us"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val want = Set(
      (1L, B * 1000000, (B + 50) * 1000000, 3L),              // closed by the +300s event
      (1L, (B + 300) * 1000000, (B + 310) * 1000000, 2L),     // closed by timeout
      (2L, B * 1000000, B * 1000000, 1L))                     // closed by timeout
    assert(got.intersect(want) == want, s"got $got")
  }

  test("cross-batch disorder: in-gap stray extends start backward, far stray emits alone") {
    val src = MemoryStream[(Long, Long)](spark)
    val q = Sessionize.sessionsTimeoutStream(
        src.toDS().toDF("user_id", "sec")
          .select(col("user_id"), expr("timestamp_seconds(sec)").as("ts")),
        "user_id", "ts", gapUs, "30 minutes") // wide watermark: strays arrive
      .writeStream.format("memory").queryName("sess_stray")
      .outputMode("append").start()
    src.addData((5L, B + 600)); q.processAllAvailable() // session opens at B+600
    // batch 2: one stray 30s BEFORE the start (in gap → extends start
    // backward), one stray 5 min before (far → its own singleton)
    src.addData((5L, B + 570), (5L, B + 300)); q.processAllAvailable()
    src.addData((99L, B + 10000)); q.processAllAvailable() // fire timeouts
    q.stop()
    val got = spark.table("sess_stray")
      .filter(col("key") === 5L)
      .select(col("session_start_us"), col("session_end_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ((B + 300) * 1000000, (B + 300) * 1000000, 1L), // far stray, alone
      ((B + 570) * 1000000, (B + 600) * 1000000, 2L)), s"got $got")
  }

  test("within-batch disorder sorts out; state is one row per key") {
    val src = MemoryStream[(Long, Long)](spark)
    val q = Sessionize.sessionsTimeoutStream(
        src.toDS().toDF("user_id", "sec")
          .select(col("user_id"), expr("timestamp_seconds(sec)").as("ts")),
        "user_id", "ts", gapUs, "10 seconds")
      .writeStream.format("memory").queryName("sess_disorder")
      .outputMode("append").start()
    // one batch, shuffled order, two sessions per key
    src.addData((7L, B + 400), (7L, B + 30), (7L, B), (7L, B + 390),
      (7L, B + 15))
    q.processAllAvailable()
    src.addData((99L, 10000L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_disorder")
      .filter(col("key") === 7L)
      .select(col("session_start_us"), col("session_end_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((B * 1000000, (B + 30) * 1000000, 3L),
      ((B + 390) * 1000000, (B + 400) * 1000000, 2L)))
  }
}
