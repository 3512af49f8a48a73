package graft

import org.apache.spark.sql.functions._
import graft.core.PipelineConfig
import graft.operators.RefOps
import PipelineConfig.Alerts

/** Unit tests for the reference-surface operators (SURVEY.md §5(1)):
  * CASE ordering (F3), sliding-window expansion (A1), USING-join dedup
  * (J1), time-anchor determinism (P3), fan-out shape (K1), wire
  * round-trip (P1/P2).
  */
class RefOpsSpec extends SparkSpec {
  import spark.implicits._

  test("F3: CASE chain precedence — combined branch wins over singles") {
    val df = Seq(
      (1, 95.0, 80.0), // both over → combined
      (2, 95.0, 10.0), // cpu only
      (3, 10.0, 80.0), // mem only
      (4, 10.0, 10.0)  // neither
    ).toDF("id", "cpu", "mem")
    val out = df.select($"id", RefOps.classifyAlerts(
      $"cpu", 94.35, $"mem", 78.06,
      Alerts.cpuMemBoth, Alerts.cpuOnly, Alerts.memOnly).as("alert"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) == Alerts.cpuMemBoth)
    assert(out(2) == Alerts.cpuOnly)
    assert(out(3) == Alerts.memOnly)
    assert(out(4) == Alerts.ok)
  }

  test("A1: one row lands in exactly window/slide = 3 sliding windows") {
    val df = Seq(("server_1", "1970-01-01 00:00:15"))
      .toDF("server_id", "ts")
      .withColumn("ts", to_timestamp($"ts"))
    val out = RefOps.slidingWindowAgg(df, "server_id", Seq(count(lit(1)).as("n")))
    val windows = out.select($"window.start".cast("long"), $"window.end".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(windows.toSeq == Seq((-10L, 20L), (0L, 30L), (10L, 40L)))
  }

  test("J1: USING join dedups key columns and drops unmatched keys") {
    val cpu = Seq(("a", "s1", 1.0), ("b", "s1", 2.0)).toDF("ts", "server_id", "cpu_pct")
    val mem = Seq(("a", "s1", 3.0), ("c", "s1", 4.0)).toDF("ts", "server_id", "mem_pct")
    val j = RefOps.joinOnKeys(cpu, mem)
    assert(j.columns.toSeq == Seq("ts", "server_id", "cpu_pct", "mem_pct"))
    assert(j.count() == 1) // only ts="a" matches (inner)
  }

  test("P3: time-of-day anchoring is deterministic at epoch date") {
    val df = Seq("20:53:00").toDF("ts")
      .select(RefOps.anchorTimeOfDay($"ts").cast("long").as("epoch"))
    assert(df.head().getLong(0) == 20L * 3600 + 53 * 60)
  }

  test("K1+F1: fan-out produces 4 messages per row; demux routes exactly") {
    val df = Seq(("t0", "s1", 1.0, 2.0, 3.0, 4.0, 5.0))
      .toDF("ts", "server_id", "cpu_pct", "mem_pct", "net_in", "net_out", "disk_io")
    val wire = RefOps.topicFanout(df)
    assert(wire.count() == 4)
    val cpuMsg = RefOps.demuxTopic(wire, "topic-cpu").select("value").head().getString(0)
    assert(cpuMsg == "t0,s1,1.0")
    val netMsg = RefOps.demuxTopic(wire, "topic-net").select("value").head().getString(0)
    assert(netMsg == "t0,s1,3.0,4.0")
  }

  test("P1→P2: CSV wire round-trip is lossless") {
    val df = Seq(("t0", "s1", 42.5)).toDF("ts", "server_id", "cpu_pct")
    val wire = df.select(RefOps.encodeCsvValue(Seq("ts", "server_id", "cpu_pct")).as("value"))
    val back = RefOps.decodeCsvValue(wire, graft.core.Schemas.cpu)
    val r = back.head()
    assert(r.getString(0) == "t0" && r.getString(1) == "s1" && r.getDouble(2) == 42.5)
  }

  test("P2: malformed wire messages decode to nulls, not failures") {
    // at-least-once transports deliver garbage eventually; the decode
    // tier must degrade per-field (PERMISSIVE from_csv) so one bad
    // message can't kill a stream — downstream aggs drop the nulls
    val wire = Seq(
      "t0,s1,42.5",        // valid
      "t1,s2",             // too few fields → null metric
      "t2,s3,not_a_number" // unparseable metric → null metric
    ).toDF("value")
    val rows = RefOps.decodeCsvValue(wire, graft.core.Schemas.cpu).collect()
    assert(rows.length == 3)
    assert(rows(0).getDouble(2) == 42.5)
    assert(rows(1).isNullAt(2) && rows(1).getString(0) == "t1")
    assert(rows(2).isNullAt(2) && rows(2).getString(1) == "s3")
  }

  test("A4: delivery stats counts per topic") {
    val df = Seq(("a", "s", 1.0, 1.0, 1.0, 1.0, 1.0), ("b", "s", 2.0, 2.0, 2.0, 2.0, 2.0))
      .toDF("ts", "server_id", "cpu_pct", "mem_pct", "net_in", "net_out", "disk_io")
    val stats = RefOps.deliveryStats(RefOps.topicFanout(df))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map("topic-cpu" -> 2L, "topic-mem" -> 2L,
      "topic-net" -> 2L, "topic-disk" -> 2L))
  }
}
