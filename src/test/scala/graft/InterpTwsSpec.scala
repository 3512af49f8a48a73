package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.TimeSeries
import graft.streaming.TwsOps

/** The streaming interpolation resample (TwsOps.interpTws) held
  * output-identical to the batch twin (TimeSeries.resampleLinear) over
  * the closed region — the stream ≡ batch discipline every streaming
  * twin in this library is gated by.
  */
class InterpTwsSpec extends SparkSpec {
  import spark.implicits._

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

  // (key, sec, tie, v) with a real timestamp column
  private def leg(src: MemoryStream[(String, Long, Long, Double)]) =
    src.toDF().toDF("k", "sec", "tie", "v")
      .select(col("k"), expr("timestamp_seconds(sec)").as("ts"),
        col("tie"), col("v"))

  test("stream ≡ batch over the closed region; out-of-order arrival; gaps") {
    withRocksDb {
      val src = MemoryStream[(String, Long, Long, Double)](spark)
      val out = TwsOps.interpTws(leg(src), "k", "ts", "tie", "v",
        bucketSeconds = 10L, watermark = "0 seconds")
      val q = out.writeStream.format("memory").queryName("interp_tws")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("interp-ck").toString)
        .outputMode("append").start()
      try {
        // out-of-order within the batch: bucket-3 obs arrives first
        src.addData(("a", 35L, 1L, 2.5), ("a", 5L, 1L, 1.0),
          ("a", 15L, 1L, 9.9), ("b", 5L, 1L, 4.0))
        q.processAllAvailable()
        // watermark -> 35: closes buckets 0..2 (anchors 0 and 1)
        src.addData(("a", 100L, 1L, 0.0))
        q.processAllAvailable()
        settle(q, "interp_tws", 5)
        val got = spark.table("interp_tws")
          .select("key", "bucket_start", "obs_cnt", "value_interp_micro")
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        // batch twin on exactly the closed observations
        val batch = TimeSeries.resampleLinear(
          Seq(("a", 5L, 1L, 1.0), ("a", 15L, 1L, 9.9), ("a", 35L, 1L, 2.5),
            ("b", 5L, 1L, 4.0)).toDF("k", "e", "tie", "v"),
          "k", "e", "tie", "v", 10L)
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        assert(got == batch)
        // the interpolated gap is exact: between 9.9@b1 and 2.5@b3
        assert(got.contains(("a", 20L, 0L, 6200000L)))
      } finally q.stop()
    }
  }

  test("sub-second timestamps collapse to epoch seconds like the batch twin") {
    withRocksDb {
      val src = MemoryStream[(String, Long, Long, Double)](spark)
      // sub-second offsets via timestamp_micros: 1.5s tie=1 v=10 and
      // 1.2s tie=2 v=20 share epoch-second 1 -> batch max(struct(e,
      // tie, v)) picks tie=2 (v=20); a raw-micros anchor would pick
      // the 1.5s row (v=10)
      val obs = src.toDF().toDF("k", "us", "tie", "v")
        .select(col("k"), expr("timestamp_micros(us)").as("ts"),
          col("tie"), col("v"))
      val out = TwsOps.interpTws(obs, "k", "ts", "tie", "v",
        bucketSeconds = 10L, watermark = "0 seconds")
      val q = out.writeStream.format("memory").queryName("interp_tws3")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("interp-ck3").toString)
        .outputMode("append").start()
      try {
        src.addData(("a", 1500000L, 1L, 10.0), ("a", 1200000L, 2L, 20.0))
        q.processAllAvailable()
        src.addData(("a", 60000000L, 1L, 0.0)) // close bucket 0
        q.processAllAvailable()
        settle(q, "interp_tws3", 1)
        val got = spark.table("interp_tws3")
          .filter(col("bucket_start") === 0L).collect()
          .map(r => (r.getAs[Long]("obs_cnt"), r.getAs[Long]("value_interp_micro")))
        assert(got.toSeq == Seq((2L, 20000000L)), s"got ${got.toSeq}")
      } finally q.stop()
    }
  }

  test("anchor carries across micro-batches; ties resolve by tie column") {
    withRocksDb {
      val src = MemoryStream[(String, Long, Long, Double)](spark)
      val out = TwsOps.interpTws(leg(src), "k", "ts", "tie", "v",
        bucketSeconds = 10L, watermark = "30 seconds")
      val q = out.writeStream.format("memory").queryName("interp_tws2")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("interp-ck2").toString)
        .outputMode("append").start()
      try {
        // two obs tie on ts within bucket 0: tie=2 wins (v=3.0)
        src.addData(("a", 5L, 1L, 7.0), ("a", 5L, 2L, 3.0))
        q.processAllAvailable()
        // wm -> 5-30 <0: nothing closes yet; then advance to close b0
        src.addData(("a", 45L, 1L, 5.0))
        q.processAllAvailable()
        settle(q, "interp_tws2", 1)
        val after1 = spark.table("interp_tws2").collect()
          .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(after1 == Set((0L, 2L, 3000000L)), s"got $after1")
        // close bucket 4 in a LATER batch: gap rows 1..3 must
        // interpolate from the carried anchor (0, 3.0) to (4, 5.0)
        src.addData(("a", 90L, 1L, 0.0))
        q.processAllAvailable()
        settle(q, "interp_tws2", 5)
        val got = spark.table("interp_tws2").collect()
          .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(got == Set(
          (0L, 2L, 3000000L), (10L, 0L, 3500000L), (20L, 0L, 4000000L),
          (30L, 0L, 4500000L), (40L, 1L, 5000000L)), s"got $got")
      } finally q.stop()
    }
  }
}
