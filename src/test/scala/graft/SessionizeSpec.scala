package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("sessions merge up to and including the gap boundary, split past it") {
    val events = Seq(
      ("u1", ts(0), 1.0), ("u1", ts(50), 2.0),
      ("u1", ts(110), 3.0),                       // exactly 60s after t=50 → MERGES
      ("u2", ts(0), 4.0), ("u2", ts(61), 5.0)     // 61 > 60 → splits
    ).toDF("user_id", "ts", "value")
    val got = Sessionize.sessions(events, "user_id", "ts", "60 seconds",
        Seq(count(lit(1)).as("n"), sum(col("value")).as("v")))
      .select("user_id", "session_start", "session_end", "n", "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(got == Set(
      ("u1", 0L, 170L, 3L, 6.0),    // boundary event extends the session
      ("u2", 0L, 60L, 1L, 4.0),
      ("u2", 61L, 121L, 1L, 5.0)))
  }

  test("streaming sessions equal batch sessions once the watermark closes them") {
    val batchInput = Seq(
      ("u1", ts(0), 1.0), ("u1", ts(50), 2.0), ("u1", ts(110), 3.0),
      ("u2", ts(0), 4.0), ("u2", ts(61), 5.0))
    val expected = Sessionize.sessions(batchInput.toDF("user_id", "ts", "value"),
        "user_id", "ts", "60 seconds",
        Seq(count(lit(1)).as("n"), sum(col("value")).as("v")))
      .select("user_id", "session_start", "session_end", "n", "v")
      .collect().map(_.toSeq).toSet

    val src = MemoryStream[(String, Timestamp, Double)](spark)
    val stream = Sessionize.sessionsStream(
        src.toDS().toDF("user_id", "ts", "value"),
        "user_id", "ts", "60 seconds", "0 seconds",
        Seq(count(lit(1)).as("n"), sum(col("value")).as("v")))
      .select("user_id", "session_start", "session_end", "n", "v")
    val q = stream.writeStream.format("memory").queryName("stream_sessions")
      .outputMode("append").start()
    src.addData(batchInput: _*)
    q.processAllAvailable()
    // push event time far past every open session so Append emits them
    src.addData(("u3", ts(10000), 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("stream_sessions").collect().map(_.toSeq).toSet
    assert(got == expected) // u3's own session stays open and unemitted
  }
}
