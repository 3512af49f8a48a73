package graft.core

/** Pipeline configuration mirroring the reference's YAML
  * (`/root/reference/config/config.yaml:1-31`) as a Scala case class —
  * the offline build cannot resolve a YAML parser (SURVEY.md §1.4), and
  * the reference's config surface is small enough that constants with
  * override points are the right shape anyway.
  *
  * Threshold values: `config/config.yaml:22-26`; window durations:
  * `config/config.yaml:19-20`; topic names: `config/config.yaml:5-9`.
  */
final case class PipelineConfig(
    teamName: String = "team_1",
    // Kafka transport (interface-level: no kafka jar in the offline
    // build — see SURVEY.md §7.4(7); the streaming package selects
    // format("kafka") only when configured).
    bootstrapServers: String = "localhost:9092",
    cpuTopic: String = "topic-cpu",
    memTopic: String = "topic-mem",
    netTopic: String = "topic-net",
    diskTopic: String = "topic-disk",
    // Windowing (`config/config.yaml:19-20`).
    windowDuration: String = "30 seconds",
    slideDuration: String = "10 seconds",
    // Alert thresholds (`config/config.yaml:22-26`).
    cpuThreshold: Double = 94.35,
    memThreshold: Double = 78.06,
    netInThreshold: Double = 4724.68,
    diskIoThreshold: Double = 4563.25,
    // Streaming semantics the reference leaves implicit (batch over
    // complete data): watermark for the streaming rebuild (SURVEY §2.1 T2).
    watermark: String = "1 minute")

object PipelineConfig {
  val default: PipelineConfig = PipelineConfig()

  /** Alert strings, exactly as the reference emits them
    * (`spark_jobs/spark_job1.py:39-44`, `spark_job2.py:39-44`).
    */
  object Alerts {
    val cpuMemBoth = "High CPU + Memory stress"
    val cpuOnly    = "CPU spike suspected"
    val memOnly    = "Memory saturation suspected"
    val netDiskBoth = "Network flood + Disk thrash suspected"
    val netOnly    = "Possible DDoS"
    val diskOnly   = "Disk thrash suspected"
    val ok         = "OK"
  }
}
