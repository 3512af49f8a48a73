package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.PipelineConfig

/** The reference's full relational-operator surface (SURVEY.md §2.1) as
  * small pure `DataFrame => DataFrame` functions, shared verbatim by the
  * batch and streaming pipelines.
  *
  * Scale notes (100 TB design intent) are on each op. Nothing here uses a
  * UDF or driver-side loop — every expression is a Catalyst built-in, so
  * the whole surface stays inside whole-stage codegen and every filter /
  * projection is pushable into the scan.
  */
object RefOps {

  // -------------------------------------------------------------------
  // P3 — timestamp anchoring (`spark_jobs/spark_job1.py:19`).
  //
  // The reference casts "HH:mm:ss" straight to timestamp, silently
  // anchoring to the job's run date (SURVEY.md §1.2 hazard). We pin the
  // epoch date: window bounds are epoch-aligned modulo the slide, so the
  // HH:mm:ss-projected output is identical for any whole-day anchor, and
  // results become reproducible / oracle-comparable.
  // -------------------------------------------------------------------
  def anchorTimeOfDay(tsCol: Column): Column =
    to_timestamp(concat(lit("1970-01-01 "), tsCol))

  /** Applies the job-prep casts of `spark_jobs/spark_job1.py:19-21`:
    * `ts` string → anchored timestamp; metric columns → double, or
    * float when `useFloat` (the reference casts to FLOAT at
    * `spark_job1.py:20-21`; `round(avg(float), 2)` can differ from
    * `round(avg(double), 2)` at rounding boundaries, so byte-compat
    * paths — [[graft.pipeline.MonitoringJobs]] — must mirror the float.
    * Everything else aggregates in double and rounds at the edge,
    * SURVEY.md §7.4(3)).
    */
  def castMetrics(df: DataFrame, metricCols: Seq[String],
                  useFloat: Boolean = false): DataFrame = {
    val t = if (useFloat) "float" else "double"
    // schema-inferred readers (Spark 4 CSV inference) may deliver ts
    // already parsed as a timestamp anchored to the read date — reproject
    // to the HH:mm:ss string first so anchoring stays deterministic
    val tsIn = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        date_format(col("ts"), "HH:mm:ss")
      case _ => col("ts")
    }
    val withTs = df.withColumn("ts", anchorTimeOfDay(tsIn))
    metricCols.foldLeft(withTs)((d, c) => d.withColumn(c, col(c).cast(t)))
  }

  // -------------------------------------------------------------------
  // J1 — multi-key inner equi-join, USING semantics
  // (`spark_jobs/spark_job1.py:18`): `Seq(...)` usingColumns dedups the
  // key columns exactly like PySpark's `on=[...]`.
  //
  // Scale: both sides are large fact streams keyed the same way → this
  // is a shuffle join on (ts, server_id); no broadcast (neither side is
  // a dim). AQE handles skew. The reference joins on the *raw string*
  // keys before casts; we keep key-compatible semantics but join after
  // casting (equal keys remain equal — anchoring is injective per day).
  // -------------------------------------------------------------------
  def joinOnKeys(left: DataFrame, right: DataFrame,
                 keys: Seq[String] = Seq("ts", "server_id")): DataFrame =
    left.join(right, keys, "inner")

  // -------------------------------------------------------------------
  // A1–A3 — sliding event-time window aggregation
  // (`spark_jobs/spark_job1.py:27-33`, `spark_job2.py:27-33`).
  //
  // Catalyst's TimeWindowing rule expands each row into
  // window/slide (= 3 for 30s/10s) bucket rows via Expand, then runs
  // partial+final hash aggregation — map-side combine keeps the shuffle
  // at |keys × windows|, not |input rows × 3|.
  // -------------------------------------------------------------------
  def slidingWindowAgg(df: DataFrame, keyCol: String, aggs: Seq[Column],
                       cfg: PipelineConfig = PipelineConfig.default): DataFrame =
    df.groupBy(col(keyCol), window(col("ts"), cfg.windowDuration, cfg.slideDuration))
      .agg(aggs.head, aggs.tail: _*)

  // -------------------------------------------------------------------
  // F2 + F3 — threshold predicates + order-sensitive CASE chain
  // (`spark_jobs/spark_job1.py:36-44`). The combined-threshold branch
  // MUST come first (SURVEY.md §7.4(4)).
  // -------------------------------------------------------------------
  def classifyAlerts(aCol: Column, aThr: Double, bCol: Column, bThr: Double,
                     bothAlert: String, aAlert: String, bAlert: String): Column =
    when(aCol > aThr && bCol > bThr, bothAlert)
      .when(aCol > aThr, aAlert)
      .when(bCol > bThr, bAlert)
      .otherwise(PipelineConfig.Alerts.ok)

  // -------------------------------------------------------------------
  // P5–P8 — final output projection (`spark_jobs/spark_job1.py:47-54`):
  // window struct access, HH:mm:ss formatting, round(2), aliases.
  // -------------------------------------------------------------------
  def formatAlertOutput(df: DataFrame, keyOut: String,
                        metricAliases: Seq[(String, String)]): DataFrame = {
    val metricCols = metricAliases.map { case (in, out) => round(col(in), 2).as(out) }
    df.select(
      Seq(col(df.columns.head).as(keyOut),
          date_format(col("window.start"), "HH:mm:ss").as("window_start"),
          date_format(col("window.end"), "HH:mm:ss").as("window_end")) ++
        metricCols :+ col("alert"): _*)
  }

  // -------------------------------------------------------------------
  // P1 — CSV-string encode (`producer/producer.py:68-71`): row → wire
  // message value. concat_ws is the codegen'd equivalent of the f-string.
  // -------------------------------------------------------------------
  def encodeCsvValue(cols: Seq[String]): Column =
    concat_ws(",", cols.map(col): _*)

  // -------------------------------------------------------------------
  // P2 — CSV-string decode (`consumers/consumer1.py:43-48` +
  // `spark_jobs/spark_job1.py:14-15` composite): wire message → columns.
  // from_csv is the streaming-path equivalent of land-then-rescan.
  // -------------------------------------------------------------------
  def decodeCsvValue(df: DataFrame, schema: org.apache.spark.sql.types.StructType,
                     valueCol: String = "value"): DataFrame =
    df.select(from_csv(col(valueCol).cast("string"), schema,
        Map.empty[String, String]).as("m"))
      .select("m.*")

  // -------------------------------------------------------------------
  // K1 — 4-way topic fan-out (`producer/producer.py:74-77`): one input
  // row → 4 (topic, value) messages. Implemented as 4 narrow projections
  // unioned — no shuffle; at 100 TB this is embarrassingly parallel and
  // the Kafka sink partitions by topic downstream.
  // -------------------------------------------------------------------
  def topicFanout(df: DataFrame, cfg: PipelineConfig = PipelineConfig.default): DataFrame = {
    def msg(topic: String, cols: Seq[String]): DataFrame =
      df.select(lit(topic).as("topic"), encodeCsvValue(cols).as("value"))
    msg(cfg.cpuTopic, Seq("ts", "server_id", "cpu_pct"))
      .unionByName(msg(cfg.memTopic, Seq("ts", "server_id", "mem_pct")))
      .unionByName(msg(cfg.netTopic, Seq("ts", "server_id", "net_in", "net_out")))
      .unionByName(msg(cfg.diskTopic, Seq("ts", "server_id", "disk_io")))
  }

  // -------------------------------------------------------------------
  // F1 — topic demultiplex (`consumers/consumer1.py:42-47`): route one
  // (topic, value) stream into per-family tables. A filter, not a
  // repartition — each branch prunes at the source.
  // -------------------------------------------------------------------
  def demuxTopic(df: DataFrame, topic: String): DataFrame =
    df.filter(col("topic") === topic)

  // -------------------------------------------------------------------
  // A4/A5 — delivery accounting (`producer/producer.py:44-58,95-103`):
  // per-topic message counters + global count. groupBy(topic).count is
  // the distributed form of the callback counters.
  // -------------------------------------------------------------------
  def deliveryStats(messages: DataFrame): DataFrame =
    messages.groupBy(col("topic")).agg(count(lit(1)).as("n_messages"))
}
