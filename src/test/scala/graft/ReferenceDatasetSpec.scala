package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.core.{PipelineConfig, Schemas}
import graft.pipeline.MonitoringJobs
import PipelineConfig.Alerts

/** Golden end-to-end run of the batch jobs over the reference's own
  * dataset (`/root/reference/data/dataset.csv`, read-only), checking
  * the structural invariants the reference pipeline guarantees
  * (SURVEY.md §5(2)): dataset shape, window counts, output schema,
  * alert-string domain, HH:mm:ss projection.
  */
class ReferenceDatasetSpec extends SparkSpec {

  private val refCsv = "/root/reference/data/dataset.csv"
  private def available = Files.exists(Paths.get(refCsv))

  private lazy val dataset =
    spark.read.option("header", "true").schema(Schemas.dataset).csv(refCsv)

  test("reference dataset has the surveyed shape") {
    assume(available)
    assert(dataset.count() == 28800)
    assert(dataset.select("server_id").distinct().count() == 20)
    assert(dataset.select("ts").distinct().count() == 1440)
  }

  test("job1 over the full reference dataset: windows, schema, alerts") {
    assume(available)
    val cpu = dataset.select("ts", "server_id", "cpu_pct")
    val mem = dataset.select("ts", "server_id", "mem_pct")
    val out = MonitoringJobs.job1(cpu, mem).cache()

    assert(out.columns.toSeq ==
      Seq("server_id", "window_start", "window_end", "avg_cpu", "avg_mem", "alert"))
    // 1440 distinct 5s-cadence timestamps over 2h → event times span
    // 7195s; 10s slide ⇒ 720 in-span starts + 2 leading partials = 722
    // windows per server
    val perServer = out.groupBy("server_id").count()
      .select("count").distinct().collect().map(_.getLong(0)).toSeq
    assert(perServer == Seq(722L))
    // alert strings drawn exactly from the job1 domain
    val alerts = out.select("alert").distinct().collect().map(_.getString(0)).toSet
    assert(alerts.subsetOf(Set(Alerts.cpuMemBoth, Alerts.cpuOnly, Alerts.memOnly, Alerts.ok)))
    assert(alerts.contains(Alerts.ok))
    // HH:mm:ss projection round-trips the surveyed span
    val bounds = out.agg(min("window_start"), max("window_start")).head()
    assert(bounds.getString(0) == "20:52:40" && bounds.getString(1) == "22:52:50")
    out.unpersist()
  }

  private def goldenLines(name: String): Seq[String] = {
    val p = Paths.get(s"src/test/resources/golden/$name")
    new String(Files.readAllBytes(p)).split("\n").toSeq
  }

  test("job1 golden diff: full rows match the pinned reference-dataset output") {
    assume(available)
    val out = MonitoringJobs.job1(
      dataset.select("ts", "server_id", "cpu_pct"),
      dataset.select("ts", "server_id", "mem_pct"))
    val got = GoldenFormat.canonicalLines(out)
    val want = goldenLines("job1.csv")
    assert(got.size == want.size)
    assert(got == want)
  }

  test("job2 golden diff: full rows match the pinned reference-dataset output") {
    assume(available)
    val out = MonitoringJobs.job2(
      dataset.select("ts", "server_id", "net_in", "net_out"),
      dataset.select("ts", "server_id", "disk_io"))
    assert(GoldenFormat.canonicalLines(out) == goldenLines("job2.csv"))
  }

  test("job2 over the full reference dataset emits all four alert kinds") {
    assume(available)
    val net = dataset.select("ts", "server_id", "net_in", "net_out")
    val disk = dataset.select("ts", "server_id", "disk_io")
    val out = MonitoringJobs.job2(net, disk)
    val alerts = out.select("alert").distinct().collect().map(_.getString(0)).toSet
    // thresholds net_in 4724.68 / disk_io 4563.25 vs ranges ~0-20k/0-10k:
    // every branch should fire somewhere in 2h × 20 servers
    assert(alerts == Set(Alerts.netDiskBoth, Alerts.netOnly, Alerts.diskOnly, Alerts.ok))
  }
}
