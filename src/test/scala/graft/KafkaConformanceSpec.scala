package graft

import graft.core.PipelineConfig
import graft.streaming.StreamingPipeline

/** S3/K1 wire-protocol conformance without a broker (SURVEY.md §7.4(7):
  * the sandbox has no spark-sql-kafka jar and no network, so a real
  * round-trip is environment-blocked — this spec pins everything that
  * can be verified offline and PROVES the jar is absent rather than
  * assuming it).
  */
class KafkaConformanceSpec extends SparkSpec {

  private val cfg = PipelineConfig.default

  test("source options: connector contract keys, subscribe list, earliest offsets") {
    val opts = StreamingPipeline.kafkaSourceOptions(cfg,
      Seq(cfg.cpuTopic, cfg.memTopic, cfg.netTopic, cfg.diskTopic))
    assert(opts("kafka.bootstrap.servers") == cfg.bootstrapServers)
    assert(opts("subscribe") ==
      s"${cfg.cpuTopic},${cfg.memTopic},${cfg.netTopic},${cfg.diskTopic}")
    assert(opts("startingOffsets") == "earliest") // auto_offset_reset parity
    // every consumer-level knob must ride the kafka.* passthrough prefix
    assert(opts.keys.filter(_ != "subscribe").filter(_ != "startingOffsets")
      .forall(_.startsWith("kafka.")))
  }

  test("sink options: producer tuning knobs pass through with kafka. prefix") {
    val opts = StreamingPipeline.kafkaSinkOptions(cfg, "/tmp/ckpt")
    assert(opts("kafka.bootstrap.servers") == cfg.bootstrapServers)
    assert(opts("kafka.compression.type") == "snappy")
    assert(opts("kafka.batch.size") == "65536")
    assert(opts("kafka.linger.ms") == "10")
    assert(opts("checkpointLocation") == "/tmp/ckpt")
  }

  test("blocked-jar proof: format(\"kafka\") is genuinely unavailable in this build") {
    // If this ever starts passing the jar has appeared and the real
    // round-trip test should replace it.
    val e = intercept[Exception] {
      StreamingPipeline.kafkaWireSource(spark, cfg, Seq(cfg.cpuTopic)).isStreaming
    }
    val msg = e.toString + Option(e.getCause).map(_.toString).getOrElse("")
    assert(msg.contains("kafka") || msg.contains("DATA_SOURCE_NOT_FOUND") ||
      msg.contains("Failed to find"))
  }
}
