package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Schemas
import graft.pipeline.MonitoringJobs

/** Canonical row format shared by the golden generator and
  * ReferenceDatasetSpec — both sides serialize through the same code, so
  * the diff compares VALUES (including the reference's float-precision
  * round(2) results), not formatting.
  */
object GoldenFormat {
  def canonicalLines(df: DataFrame): Seq[String] =
    df.collect()
      .map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) "NULL" else r.get(i).toString).mkString(","))
      .sorted
      .toSeq
}

/** One-off generator for the pinned golden outputs of the byte-compat
  * monitoring jobs over the reference's own dataset. Run via
  * `sbt "Test/runMain graft.GoldenGen"` after an INTENDED behavior
  * change; the diff in ReferenceDatasetSpec guards everything else.
  */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val dataset = spark.read.option("header", "true")
      .schema(Schemas.dataset).csv("/root/reference/data/dataset.csv")
    val job1 = MonitoringJobs.job1(
      dataset.select("ts", "server_id", "cpu_pct"),
      dataset.select("ts", "server_id", "mem_pct"))
    val job2 = MonitoringJobs.job2(
      dataset.select("ts", "server_id", "net_in", "net_out"),
      dataset.select("ts", "server_id", "disk_io"))
    val outDir = Paths.get("src/test/resources/golden")
    Files.createDirectories(outDir)
    Files.write(outDir.resolve("job1.csv"),
      String.join("\n", GoldenFormat.canonicalLines(job1): _*).getBytes)
    Files.write(outDir.resolve("job2.csv"),
      String.join("\n", GoldenFormat.canonicalLines(job2): _*).getBytes)
    println(s"golden written to $outDir")
    spark.stop()
  }
}
