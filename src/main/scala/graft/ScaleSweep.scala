package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.PipelineConfig
import graft.core.PipelineConfig.Alerts
import graft.operators.RefOps

/** Scaling-curve harness: the reference monitor pipeline shape
  * (`spark_jobs/spark_job1.py:6-60` — two metric families, multi-key
  * join, 30s/10s sliding-window avg, CASE alerts) over the `metricgen`
  * DataSource V2 at geometrically increasing row counts, one JSON line
  * per point. Because the source generates (zero I/O, exact pushdown),
  * the sweep isolates the PIPELINE's scaling behavior: a plan whose
  * wall time grows ~linearly in rows at fixed parallelism is
  * shuffle/agg-bound the way the 100 TB posture predicts; superlinear
  * growth would expose a hidden quadratic (the thing the sweep exists
  * to catch). Fleet size grows with volume (servers = rows/2880) so
  * window state per key stays fixed — the same key-space scaling rule
  * as StreamBench.writeSyntheticDay.
  *
  * Usage: `runMain graft.ScaleSweep [rows ...]` (default sweep
  * 60k/600k/6M — 1×/10×/100× the sf0.1-scale fixture).
  */
object ScaleSweep {

  /** job1 over generated families: derive cpu and mem frames from two
    * independent scans (reference parity: two landed tables, real
    * multi-key shuffle join, not a projection of one frame).
    */
  def monitorOverGen(spark: org.apache.spark.sql.SparkSession,
      rows: Long, servers: Long): DataFrame = {
    def family(cols: String*): DataFrame =
      spark.read.format("metricgen")
        .option("rows", rows).option("servers", servers).load()
        .select((Seq("ts", "server_id") ++ cols).map(col): _*)
    val cfg = PipelineConfig.default
    val joined = RefOps.joinOnKeys(family("cpu_pct"), family("mem_pct"))
    val agged = RefOps.slidingWindowAgg(joined, "server_id",
      Seq(avg(col("cpu_pct")).as("avg_cpu"),
        avg(col("mem_pct")).as("avg_mem")), cfg)
    agged.withColumn("alert",
      RefOps.classifyAlerts(col("avg_cpu"), cfg.cpuThreshold,
        col("avg_mem"), cfg.memThreshold,
        Alerts.cpuMemBoth, Alerts.cpuOnly, Alerts.memOnly))
  }

  def main(args: Array[String]): Unit = {
    val points =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(60000L, 600000L, 6000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.local(cpus, "graft-scalesweep")
    spark.sparkContext.setLogLevel("WARN")
    // one warmup so point 1 isn't charged for JVM/codegen startup
    monitorOverGen(spark, 10000, 20)
      .write.format("noop").mode("overwrite").save()
    points.foreach { rows =>
      val servers = math.max(20L, rows / 2880) // fixed windows per key
      val t0 = System.nanoTime()
      monitorOverGen(spark, rows, servers)
        .write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"""{"metric":"monitor_pipeline_sweep","rows":$rows,"servers":$servers,"wall_sec":${math.round(secs * 1000) / 1000.0},"rows_per_sec":${(rows / secs).round}}""")
    }
    spark.stop()
  }
}
