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

  test("session state survives a checkpointed restart and merges across it") {
    import java.nio.file.{Files, Paths}
    val in = Files.createTempDirectory("sess-in").toString
    val out = Files.createTempDirectory("sess-out").toString + "/sessions"
    val ckpt = Files.createTempDirectory("sess-ckpt").toString

    def runOnce(): Unit = {
      val ev = spark.readStream.schema("user_id LONG, ts TIMESTAMP")
        .option("header", "true").csv(in)
      val q = graft.operators.Sessionize.sessionsStream(ev, "user_id", "ts",
          "15 seconds", "30 seconds",
          Seq(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_events")))
        .writeStream.format("parquet").outputMode("append")
        .option("path", out).option("checkpointLocation", ckpt).start()
      q.processAllAvailable()
      q.stop()
    }

    // run 1: an OPEN session (not emitted — watermark never passes it)
    Files.writeString(Paths.get(s"$in/b1.csv"),
      "user_id,ts\n1,1970-01-01 00:00:00\n1,1970-01-01 00:00:10\n")
    runOnce()
    // run 2 (fresh query, same checkpoint): an event 10s after the
    // stored session's last — MUST merge into the restored state — plus
    // a far-future event that advances the watermark past the close
    Files.writeString(Paths.get(s"$in/b2.csv"),
      "user_id,ts\n1,1970-01-01 00:00:20\n9,1970-01-01 00:20:00\n")
    runOnce()

    val got = spark.read.parquet(out)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // one merged session [0, 20+15) with all 3 events — proof the
    // pre-restart state participated; user 9's session stays open
    assert(got == Set((1L, 0L, 35L, 3L)))
  }
}
