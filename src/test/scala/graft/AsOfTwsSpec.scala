package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin
import graft.streaming.TwsOps

/** The streaming as-of join (TwsOps.asOfTws, state-API-v2 + RocksDB)
  * held output-identical to the batch twin on scripted scenarios with
  * out-of-order arrival — the stream ≡ batch discipline every
  * streaming twin in this library is gated by.
  */
class AsOfTwsSpec extends SparkSpec {
  import spark.implicits._

  private val B = 1000L // epoch anchor seconds (see SessionTimeoutStreamSpec)

  /** Drain until the memory sink stops growing: the timer-only batch
    * that fires after a watermark advance can land just after a
    * processAllAvailable returns, so poll to a fixpoint.
    */
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

  // (key, sec, value) -> DataFrame with a real timestamp column
  private def df(rows: Seq[(Long, Long, Double)]) =
    rows.toDF("user_id", "sec", "v")
      .select(col("user_id"), expr("timestamp_seconds(sec)").as("ts"), col("v"))

  test("stream ≡ batch: out-of-order states and probes, ties, missing keys") {
    withRocksDb {
      // states arrive AFTER probes that need them (within watermark),
      // probe at exactly a state's ts (tie -> match), key 3 has no states
      val probeRows = Seq(
        (1L, B + 10, 0.1), (1L, B + 25, 0.2), (1L, B + 40, 0.3),
        (2L, B + 20, 0.4), (3L, B + 30, 0.5))
      val stateRows = Seq(
        (1L, B + 5, 100.0), (1L, B + 25, 200.0), (2L, B + 30, 300.0))

      val pSrc = MemoryStream[(Long, Long, Double)](spark)
      val sSrc = MemoryStream[(Long, Long, Double)](spark)
      def leg(src: MemoryStream[(Long, Long, Double)]) =
        src.toDS().toDF("user_id", "sec", "v")
          .select(col("user_id"), expr("timestamp_seconds(sec)").as("ts"),
            col("v"))
      val q = TwsOps.asOfTws(leg(pSrc), leg(sSrc), "user_id", "ts", "v", "v",
          "30 seconds")
        .writeStream.format("memory").queryName("asof_tws")
        .outputMode("append").start()

      // batch 1: probes first — their states have NOT arrived yet
      pSrc.addData(probeRows: _*)
      q.processAllAvailable()
      // batch 2: the states land, still within the 30s watermark slack
      sSrc.addData(stateRows: _*)
      q.processAllAvailable()
      // batch 3: push BOTH watermarks far past every probe to flush
      pSrc.addData((99L, B + 10000, 0.0))
      sSrc.addData((99L, B + 10000, 0.0))
      q.processAllAvailable()
      settle(q, "asof_tws", 5)
      q.stop()

      val got = spark.table("asof_tws")
        .filter(col("key") =!= 99L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet

      // batch twin on the same rows
      val want = AsOfJoin.asOf(
          df(probeRows).select(col("user_id"), col("ts"), col("v")),
          df(stateRows).select(col("user_id"), col("ts"),
            col("v").as("sv")),
          Seq("user_id"), "ts", Seq("sv"))
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("v"), col("asof_sv"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet

      assert(got == want, s"stream $got\nbatch $want")
    }
  }

  test("a genuinely-NULL state payload is carried as NULL, not skipped or NaN") {
    withRocksDb {
      val pSrc = MemoryStream[(Long, Long, Double)](spark)
      val sSrc = MemoryStream[(Long, Long, Option[Double])](spark)
      val probes = pSrc.toDS().toDF("user_id", "sec", "v")
        .select(col("user_id"), expr("timestamp_seconds(sec)").as("ts"),
          col("v"))
      val states = sSrc.toDS().toDF("user_id", "sec", "v")
        .select(col("user_id"), expr("timestamp_seconds(sec)").as("ts"),
          col("v"))
      val q = TwsOps.asOfTws(probes, states, "user_id", "ts", "v", "v",
          "10 seconds")
        .writeStream.format("memory").queryName("asof_tws_null")
        .outputMode("append").start()
      // state(B+5) = 10.0, state(B+20) = NULL: the probe after the NULL
      // state must see NULL (the latest row), never 10.0 carried over
      sSrc.addData((4L, B + 5, Some(10.0)), (4L, B + 20, None))
      pSrc.addData((4L, B + 10, 0.1), (4L, B + 30, 0.2))
      q.processAllAvailable()
      pSrc.addData((99L, B + 10000, 0.0))
      sSrc.addData((99L, B + 10000, Some(0.0)))
      q.processAllAvailable()
      settle(q, "asof_tws_null", 2)
      q.stop()
      val got = spark.table("asof_tws_null")
        .filter(col("key") === 4L)
        .collect()
        .map(r => (r.getLong(1),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
      assert(got == Set(
        ((B + 10) * 1000000, Some(10.0)),
        ((B + 30) * 1000000, None)), s"got $got")
    }
  }

  test("state compaction keeps exactly the answer set; later probes still match") {
    withRocksDb {
      val pSrc = MemoryStream[(Long, Long, Double)](spark)
      val sSrc = MemoryStream[(Long, Long, Double)](spark)
      def leg(src: MemoryStream[(Long, Long, Double)]) =
        src.toDS().toDF("user_id", "sec", "v")
          .select(col("user_id"), expr("timestamp_seconds(sec)").as("ts"),
            col("v"))
      val q = TwsOps.asOfTws(leg(pSrc), leg(sSrc), "user_id", "ts", "v", "v",
          "10 seconds")
        .writeStream.format("memory").queryName("asof_tws2")
        .outputMode("append").start()

      // old states + an early probe (not flushable yet: wm trails)
      sSrc.addData((7L, B, 1.0), (7L, B + 5, 2.0))
      pSrc.addData((7L, B + 6, 0.1))
      q.processAllAvailable()
      // both legs advance to B+100: wm reaches B+90, probe B+6 flushes
      // and compaction runs (keeps B+5 as the latest <= wm, drops B)
      pSrc.addData((7L, B + 100, 0.2))
      sSrc.addData((7L, B + 100, 9.9))
      q.processAllAvailable()
      // an ON-TIME later probe (>= wm) must still see the compacted
      // survivor state 2.0 at B+5 — proof compaction kept the answer set
      pSrc.addData((7L, B + 95, 0.3))
      q.processAllAvailable()
      pSrc.addData((99L, B + 10000, 0.0))
      sSrc.addData((99L, B + 10000, 0.0))
      q.processAllAvailable()
      settle(q, "asof_tws2", 3)
      q.stop()

      val got = spark.table("asof_tws2")
        .filter(col("key") === 7L)
        .collect()
        .map(r => (r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
      assert(got == Set(
        ((B + 6) * 1000000, 0.1, Some(2.0)),
        ((B + 95) * 1000000, 0.3, Some(2.0)),
        ((B + 100) * 1000000, 0.2, Some(9.9))), s"got $got")
    }
  }
}
