package graft.core

import org.apache.spark.sql.types._

/** Explicit schemas for the monitoring domain (SURVEY.md §1).
  *
  * The reference recovers types by runtime inference
  * (`spark_jobs/spark_job1.py:14-15` `inferSchema=True`) — at 100 TB an
  * inference pass is a full extra scan of the input, so the rebuild
  * declares schemas and keeps inference only as a compat option.
  *
  * Wire schemas follow the producer's hard-coded field order
  * (`producer/producer.py:68-71`); landed-table headers follow the
  * consumers (`consumers/consumer1.py:35-36`, `consumer2.py:35-36`).
  */
object Schemas {

  /** Source dataset `data/dataset.csv:1`:
    * `ts,server_id,cpu_pct,mem_pct,net_in,net_out,disk_io`.
    * `ts` stays StringType at scan time — it is a time-of-day string
    * ("HH:mm:ss", no date); anchoring happens in [[graft.operators.RefOps]]
    * to keep the plan deterministic (SURVEY.md §1.2 hazard).
    */
  val dataset: StructType = StructType(Seq(
    StructField("ts", StringType),
    StructField("server_id", StringType),
    StructField("cpu_pct", DoubleType),
    StructField("mem_pct", DoubleType),
    StructField("net_in", DoubleType),
    StructField("net_out", DoubleType),
    StructField("disk_io", DoubleType)))

  /** Per-topic landed tables (`consumers/consumer1.py:35-36`, `consumer2.py:35-36`). */
  val cpu: StructType = StructType(Seq(
    StructField("ts", StringType),
    StructField("server_id", StringType),
    StructField("cpu_pct", DoubleType)))

  val mem: StructType = StructType(Seq(
    StructField("ts", StringType),
    StructField("server_id", StringType),
    StructField("mem_pct", DoubleType)))

  val net: StructType = StructType(Seq(
    StructField("ts", StringType),
    StructField("server_id", StringType),
    StructField("net_in", DoubleType),
    StructField("net_out", DoubleType)))

  val disk: StructType = StructType(Seq(
    StructField("ts", StringType),
    StructField("server_id", StringType),
    StructField("disk_io", DoubleType)))

  /** The generic shape shared by every single-metric wire payload
    * (`ts,server_id,<metric>`): lets one `from_csv` pass decode several
    * same-shape topics at once — see
    * [[graft.streaming.StreamingPipeline.landedFamilies]].
    */
  val singleMetric: StructType = StructType(Seq(
    StructField("ts", StringType),
    StructField("server_id", StringType),
    StructField("metric", DoubleType)))

  /** Schema for one metric family keyed by topic name. */
  def forTopic(cfg: PipelineConfig, topic: String): StructType = topic match {
    case t if t == cfg.cpuTopic  => cpu
    case t if t == cfg.memTopic  => mem
    case t if t == cfg.netTopic  => net
    case t if t == cfg.diskTopic => disk
    case other => throw new IllegalArgumentException(s"unknown topic: $other")
  }
}
