package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.core.PipelineConfig
import graft.streaming.StreamingPipeline
import PipelineConfig.Alerts

/** Streaming semantics under MemoryStream (SURVEY.md §5(5)): watermarked
  * sliding windows in Append mode, stream-stream join, watermark-bounded
  * dedup, and late-data drop — no Kafka broker needed.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  private def runToCompletion(df: org.apache.spark.sql.DataFrame, name: String) = {
    val q = df.writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("streaming job1: watermarked window agg + alerts in Append mode") {
    val cpu = MemoryStream[(Timestamp, String, Double)](spark)
    val mem = MemoryStream[(Timestamp, String, Double)](spark)
    val cpuDf = cpu.toDF().toDF("ts", "server_id", "cpu_pct")
    val memDf = mem.toDF().toDF("ts", "server_id", "mem_pct")

    cpu.addData((ts(100), "s1", 99.0), (ts(105), "s1", 97.0))
    mem.addData((ts(100), "s1", 90.0), (ts(105), "s1", 85.0))
    // advance watermark (1 min) far past the windows so Append emits them
    cpu.addData((ts(400), "s1", 1.0))
    mem.addData((ts(400), "s1", 1.0))

    val out = runToCompletion(
      StreamingPipeline.streamingJob1(cpuDf, memDf), "j1out")
      .filter(col("window_start") < ts(200)).collect()

    // t=100 and t=105 share window starts {80,90,100} → 3 windows total
    assert(out.length == 3)
    assert(out.forall(_.getAs[String]("alert") == Alerts.cpuMemBoth))
    val w100 = out.filter(_.getAs[Timestamp]("window_start") == ts(90)).head
    assert(w100.getAs[Double]("avg_cpu") == 98.0) // avg(99, 97)
  }

  test("late data beyond the watermark is dropped") {
    val src = MemoryStream[(Timestamp, String, Double)](spark)
    val df = src.toDF().toDF("ts", "server_id", "cpu_pct")
      .withWatermark("ts", "1 minute")
      .groupBy(col("server_id"), window(col("ts"), "30 seconds", "10 seconds"))
      .agg(count(lit(1)).as("n"))

    val q = df.writeStream.format("memory").queryName("late").outputMode("append").start()
    src.addData((ts(100), "s1", 1.0))
    q.processAllAvailable()
    src.addData((ts(400), "s1", 1.0)) // watermark → 340
    q.processAllAvailable()
    src.addData((ts(100), "s1", 1.0)) // late: window [80,110) < watermark → dropped
    q.processAllAvailable()
    src.addData((ts(700), "s1", 1.0)) // close remaining windows
    q.processAllAvailable()
    q.stop()

    val n100 = spark.table("late")
      .filter(col("window.start") === ts(90)).select("n").collect()
    assert(n100.map(_.getLong(0)).toSeq == Seq(1L)) // late duplicate not counted
  }

  test("watermarked interval join: stream ≡ batch, band bounds enforced") {
    // errors at t=100/t=500 on k1, candidates at 95/112/130/490 on k1
    // (plus a k2 decoy at 100): with ±15s tolerance only (100,95),
    // (100,112) and (500,490) pair up — 130 is outside the band, k2
    // never matches. The SAME intervalJoin call runs on MemoryStreams
    // and on batch frames; row sets must be identical.
    val errRows = Seq((ts(100), "k1", 1L), (ts(500), "k1", 2L))
    val candRows = Seq(
      (ts(95), "k1", 10L), (ts(112), "k1", 11L), (ts(130), "k1", 12L),
      (ts(490), "k1", 13L), (ts(100), "k2", 14L))
    def join(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      StreamingPipeline.intervalJoin(
          l.toDF("l_ts", "key", "l_id"), "l_ts",
          r.toDF("r_ts", "key", "r_id"), "r_ts",
          "key", "15 seconds", "1 minute")
        .select(col("l_id"), col("r_id"))

    val batch = join(errRows.toDF(), candRows.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch === Set((1L, 10L), (1L, 11L), (2L, 13L)))

    val lSrc = MemoryStream[(Timestamp, String, Long)](spark)
    val rSrc = MemoryStream[(Timestamp, String, Long)](spark)
    lSrc.addData(errRows: _*)
    rSrc.addData(candRows: _*)
    // advance both watermarks far past every band so Append emits all
    // (distinct sentinel keys so the two advance rows can't pair up)
    lSrc.addData((ts(9000), "kx", 99L))
    rSrc.addData((ts(9000), "ky", 98L))
    val streamed = runToCompletion(join(lSrc.toDF(), rSrc.toDF()), "bandout")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch, "stream-stream interval join must equal the batch twin")
  }

  test("left-outer interval join emits the unmatched row with nulls after watermark") {
    // error id=2 at t=500 has no candidate within ±15s: inner drops it,
    // left_outer must emit (2, null) — in streaming only AFTER the
    // right watermark passes its band, which the sentinel row provides
    def join(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      StreamingPipeline.intervalJoin(
          l.toDF("l_ts", "key", "l_id"), "l_ts",
          r.toDF("r_ts", "key", "r_id"), "r_ts",
          "key", "15 seconds", "1 minute", joinType = "left_outer")
        .select(col("l_id"), col("r_id"))
    val errRows = Seq((ts(100), "k1", 1L), (ts(500), "k1", 2L))
    val candRows = Seq((ts(95), "k1", 10L))
    def toSet(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    val expected = Set((1L, Some(10L)), (2L, None))

    val batch = toSet(join(errRows.toDF(), candRows.toDF()).collect())
    assert(batch === expected)

    val lSrc = MemoryStream[(Timestamp, String, Long)](spark)
    val rSrc = MemoryStream[(Timestamp, String, Long)](spark)
    lSrc.addData(errRows: _*)
    rSrc.addData(candRows: _*)
    lSrc.addData((ts(9000), "kx", 99L))
    rSrc.addData((ts(9000), "ky", 98L))
    val streamed = toSet(runToCompletion(join(lSrc.toDF(), rSrc.toDF()), "bandouter")
      .filter(col("l_id") < 99L).collect())
    assert(streamed === expected,
      "outer row must surface once the right watermark clears its band")
  }

  test("E1 streaming dedup: duplicates within watermark collapse") {
    val src = MemoryStream[(Timestamp, String, Double)](spark)
    val df = src.toDF().toDF("ts", "server_id", "cpu_pct")
    val deduped = StreamingPipeline.dedupedStream(
      df, Seq("ts", "server_id"), PipelineConfig.default)

    val q = deduped.writeStream.format("memory").queryName("dedup").outputMode("append").start()
    src.addData((ts(100), "s1", 1.0), (ts(100), "s1", 1.0), (ts(101), "s1", 2.0))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup").count() == 2)
  }

  test("single-source streaming job1 pivots families without a join") {
    val src = MemoryStream[(Timestamp, String, String, Double)](spark)
    val wire = src.toDF().toDF("ts", "server_id", "family", "metric")

    val out = {
      src.addData((ts(100), "s1", "cpu", 99.0), (ts(100), "s1", "mem", 90.0),
        (ts(400), "s1", "cpu", 1.0), (ts(400), "s1", "mem", 1.0))
      runToCompletion(StreamingPipeline.streamingJob1SingleSource(wire), "single")
        .filter(col("window_start") < ts(200)).collect()
    }
    assert(out.length == 3) // one event-time → 3 sliding windows
    assert(out.forall(_.getAs[String]("alert") == Alerts.cpuMemBoth))
    assert(out.forall(_.getAs[Double]("avg_cpu") == 99.0))
  }

  test("stream-stream LEFT OUTER join null-extends once the watermark closes") {
    // outer stream-stream joins need BOTH watermarks and an event-time
    // range constraint so the engine knows when an unmatched left row
    // can never match and emits it null-extended
    val cpu = MemoryStream[(Timestamp, String, Double)](spark)
    val mem = MemoryStream[(Timestamp, String, Double)](spark)
    val c = cpu.toDF().toDF("cts", "server_id", "cpu_pct").withWatermark("cts", "10 seconds")
    val m = mem.toDF().toDF("mts", "mem_server", "mem_pct").withWatermark("mts", "10 seconds")
    val joined = c.join(m,
      col("server_id") === col("mem_server") &&
        col("mts") >= col("cts") && col("mts") <= col("cts") + expr("INTERVAL 5 SECONDS"),
      "left_outer")
      .select(col("server_id"), col("cts"), col("cpu_pct"), col("mem_pct"))
    val q = joined.writeStream.format("memory").queryName("souter")
      .outputMode("append").start()
    cpu.addData((ts(100), "s1", 99.0), (ts(100), "s2", 50.0)) // s2 never matches
    mem.addData((ts(102), "s1", 90.0))
    q.processAllAvailable()
    // advance both watermarks far past t=100 so the unmatched row emits
    cpu.addData((ts(1000), "sx", 0.0))
    mem.addData((ts(1000), "sx", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("souter").collect()
      .map(r => (r.getString(0), r.getDouble(2), Option(r.get(3)))).toSet
    assert(got.contains(("s1", 99.0, Some(90.0))))          // matched within range
    assert(got.contains(("s2", 50.0, None)))                // null-extended after close
  }

  test("stream-static enrichment join: dimension lookup per micro-batch") {
    // the standard enrichment topology: a stream joined against a
    // static dimension — no watermark needed (static side has no event
    // time), inner-join semantics per micro-batch
    val dim = Seq(("s1", "rack-a"), ("s2", "rack-b")).toDF("server_id", "rack")
    val src = MemoryStream[(Timestamp, String, Double)](spark)
    val enriched = src.toDF().toDF("ts", "server_id", "cpu_pct")
      .join(dim, Seq("server_id"))
      .select("server_id", "rack", "cpu_pct")
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    src.addData((ts(0), "s1", 10.0), (ts(1), "s2", 20.0), (ts(2), "s3", 30.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enriched").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    // s3 has no dimension row → dropped by the inner join
    assert(got == Set(("s1", "rack-a", 10.0), ("s2", "rack-b", 20.0)))
  }

  test("producer wire + landed table round-trip through the streaming path") {
    val src = MemoryStream[(String, String, Double, Double, Double, Double, Double)](spark)
    val ds = src.toDF().toDF("ts", "server_id", "cpu_pct", "mem_pct", "net_in", "net_out", "disk_io")
    val wire = StreamingPipeline.producerWire(ds)
    val landed = StreamingPipeline.landedTable(wire, PipelineConfig.default, "topic-cpu")

    src.addData(("20:53:00", "server_1", 42.5, 1.0, 2.0, 3.0, 4.0))
    val out = runToCompletion(landed, "landed").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "20:53:00" && r.getString(1) == "server_1"
      && r.getDouble(2) == 42.5)
  }

  test("landedFamilies single-scan demux ≡ union of per-family landedTable") {
    val cfg = PipelineConfig.default
    val rows = Seq(
      ("20:53:00", "server_1", 42.5, 17.25, 2.0, 3.0, 4.0),
      ("20:53:05", "server_2", 99.0, 88.5, 5.0, 6.0, 7.0),
      ("20:53:10", "server_1", 0.0, 100.0, 8.0, 9.0, 10.0))
    val ds = rows.toDF("ts", "server_id", "cpu_pct", "mem_pct", "net_in", "net_out", "disk_io")
    val wire = StreamingPipeline.producerWire(ds)

    val fanIn = StreamingPipeline.landedFamilies(wire,
      Seq(cfg.cpuTopic -> "cpu", cfg.memTopic -> "mem"))
    val unioned = StreamingPipeline.landedTable(wire, cfg, cfg.cpuTopic)
      .select(col("ts"), col("server_id"), lit("cpu").as("family"),
        col("cpu_pct").as("metric"))
      .unionByName(StreamingPipeline.landedTable(wire, cfg, cfg.memTopic)
        .select(col("ts"), col("server_id"), lit("mem").as("family"),
          col("mem_pct").as("metric")))

    assert(fanIn.schema == unioned.schema)
    assert(fanIn.count() == rows.length * 2)
    assert(fanIn.exceptAll(unioned).isEmpty && unioned.exceptAll(fanIn).isEmpty)

    // net/disk wire rows must not leak through the family filter
    val all = StreamingPipeline.landedFamilies(wire,
      Seq(cfg.cpuTopic -> "cpu", cfg.memTopic -> "mem",
        cfg.diskTopic -> "disk"))
    assert(all.filter(col("family") === "disk").count() == rows.length)
    assert(all.count() == rows.length * 3)
  }

  test("temporalLookup: each event enriched with the dim version valid at its own time; stream ≡ batch") {
    // dim key k1 has two versions (v1 until t=200, v2 from t=200, open
    // end); k2 appears in the dim only from t=300. Events straddle the
    // boundaries; the one predating every version survives with nulls.
    val dim = Seq(
      ("k1", "v1", ts(0), Some(ts(200))),
      ("k1", "v2", ts(200), None),
      ("k2", "w1", ts(300), None))
      .toDF("key", "version", "valid_from", "valid_to")
    val evRows = Seq(
      (ts(150), "k1", 1L),  // → v1
      (ts(200), "k1", 2L),  // boundary: half-open → v2
      (ts(500), "k1", 3L),  // → v2 (open end)
      (ts(100), "k2", 4L),  // predates k2's first version → nulls
      (ts(400), "k2", 5L))  // → w1
    def enrich(ev: org.apache.spark.sql.DataFrame) =
      StreamingPipeline.temporalLookup(
          ev.toDF("ts", "key", "ev_id"), "ts", "key", dim)
        .select(col("ev_id"), col("version"))
    val expect = Map(1L -> "v1", 2L -> "v2", 3L -> "v2", 4L -> null, 5L -> "w1")
    val batch = enrich(evRows.toDF())
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(batch === expect)

    val src = MemoryStream[(Timestamp, String, Long)](spark)
    src.addData(evRows: _*)
    val streamed = runToCompletion(enrich(src.toDF()), "scdout")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed === expect, "stream-static lookup must equal the batch join")
  }
}
