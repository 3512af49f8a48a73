package graft

import java.nio.file.{Files, Paths}
import graft.core.{PipelineConfig, Schemas}
import graft.streaming.StreamingPipeline

/** File-sink semantics with checkpoint recovery: stopping a landing
  * query and restarting it from the same checkpoint must consume only
  * the unseen inputs — no duplicate landing (the reference's
  * consumer-group offset semantics, held by Spark's checkpoint instead).
  */
class StreamingSinkSpec extends SparkSpec {

  private def writeWire(dir: String, name: String, rows: Seq[String]): Unit =
    Files.writeString(Paths.get(s"$dir/$name"),
      ("topic,value" +: rows).mkString("", "\n", "\n"))

  test("K2 landed CSV sink: checkpointed restart lands each message once") {
    val in = Files.createTempDirectory("wire-in").toString
    val out = Files.createTempDirectory("wire-out").toString + "/cpu"
    val ckpt = Files.createTempDirectory("wire-ckpt").toString
    val cfg = PipelineConfig.default

    def runOnce(): Unit = {
      val wire = spark.readStream
        .schema("topic STRING, value STRING")
        .option("header", "true").csv(in)
      val landed = StreamingPipeline.landedTable(wire, cfg, cfg.cpuTopic)
      val q = StreamingPipeline.landedCsvSink(landed, out, ckpt).start()
      q.processAllAvailable()
      q.stop()
    }

    writeWire(in, "batch1.csv", Seq(
      "topic-cpu,\"20:53:00,server_1,99.0\"",
      "topic-mem,\"20:53:00,server_1,90.0\"", // demuxed away
      "topic-cpu,\"20:53:05,server_2,50.0\""))
    runOnce()

    writeWire(in, "batch2.csv", Seq(
      "topic-cpu,\"20:53:10,server_1,97.0\""))
    runOnce() // restart from the same checkpoint

    val landed = spark.read.option("header", "true").schema(Schemas.cpu).csv(out)
    val rows = landed.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows == Set(
      ("20:53:00", "server_1", 99.0),
      ("20:53:05", "server_2", 50.0),
      ("20:53:10", "server_1", 97.0))) // batch1 not re-landed on restart
  }

  test("K3 parity sink: foreachBatch appends finalized alert windows as CSV") {
    val in = Files.createTempDirectory("alert-in").toString
    val out = Files.createTempDirectory("alert-out").toString + "/alerts"
    val ckpt = Files.createTempDirectory("alert-ckpt").toString

    Files.writeString(Paths.get(s"$in/data.csv"),
      """ts,server_id,family,metric
        |1970-01-01 00:01:40,s1,cpu,99.0
        |1970-01-01 00:01:40,s1,mem,90.0
        |1970-01-01 00:10:00,s1,cpu,1.0
        |""".stripMargin)

    val wire = spark.readStream
      .schema("ts TIMESTAMP, server_id STRING, family STRING, metric DOUBLE")
      .option("header", "true").csv(in)
    val alerts = StreamingPipeline.streamingJob1SingleSource(wire)
    val q = StreamingPipeline.alertCsvSink(alerts, out, ckpt).start()
    q.processAllAvailable()
    q.stop()

    val landed = spark.read.option("header", "true").csv(out)
    // t=100s lands in 3 finalized windows; the 00:10:00 sentinel's own
    // windows are still open → not emitted
    assert(landed.count() == 3)
    assert(landed.select("alert").distinct().head().getString(0)
      == PipelineConfig.Alerts.cpuMemBoth)
  }
}
