package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.core.{PipelineConfig, Tables}
import graft.operators.RefOps
import PipelineConfig.Alerts

/** The reference's own query surface (SURVEY.md §2.1), phrased over the
  * `events` fixture (ts/user_id/value carries the monitoring shape —
  * FIXTURES.md §B role mapping): multi-key USING join (J1), sliding
  * event-time window aggregation (A1) with avg (A2) and max (A3),
  * order-sensitive CASE alerts (F2/F3), CSV wire encode/decode (P1/P2),
  * 4-way topic fan-out (K1), demux (F1) and delivery stats (A4/A5).
  *
  * Window bounds are emitted as epoch seconds (BIGINT) — timezone- and
  * format-proof for the DuckDB oracle; the HH:mm:ss projection of the
  * reference lives in [[graft.pipeline.MonitoringJobs]] (P6 parity).
  *
  * DuckDB oracle for Spark's `window(ts, "30 seconds", "10 seconds")`:
  * Spark windows are epoch-aligned, so a row at epoch second e belongs to
  * exactly window/slide = 3 windows with starts
  * floor(e/10)*10 - {0,10,20} (SURVEY.md §7.4(2)).
  */
object MonitorQueries {

  private val cfg = PipelineConfig.default

  /** events → cpu-family table: (ts, server_id, cpu_pct). */
  private def cpuTable(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(col("ts"), col("user_id").as("server_id"),
      col("value").as("cpu_pct"))

  /** events → mem-family table; 100 - value/5 spreads rows across all
    * four CASE branches given the fixture's value range (0.01–490).
    */
  private def memTable(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(col("ts"), col("user_id").as("server_id"),
      (lit(100.0) - col("value") / 5).as("mem_pct"))

  private def windowBoundsAsEpoch(df: DataFrame): DataFrame =
    df.withColumn("window_start", col("window.start").cast("long"))
      .withColumn("window_end", col("window.end").cast("long"))
      .drop("window")

  /** Wire dataset for fan-out/encode/decode queries: integer-valued
    * metric columns so the CSV string form is byte-identical across
    * engines (double→string formatting is engine-specific; bigint is not).
    */
  private def wireDataset(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      // exact integer μs→ms (a double detour can round below the ms
      // boundary and diverge from the oracle's epoch_ms by 1)
      expr("unix_micros(ts) div 1000").as("ts"),
      col("user_id").as("server_id"),
      floor(col("value")).cast("long").as("cpu_pct"),
      (floor(col("value")) + 1).cast("long").as("mem_pct"),
      (floor(col("value")) * 40).cast("long").as("net_in"),
      (floor(col("value")) * 2).cast("long").as("net_out"),
      (floor(col("value")) * 20).cast("long").as("disk_io"))

  /** The reference job1 pipeline end-to-end (J1→A1/A2→F2/F3→P5) on the
    * events fixture. Two shuffles total: join keys, group keys — same
    * exchange count as the reference plan (SURVEY.md §3.3). Shared by
    * `q_monitor_pipeline` and `q_alert_transitions`.
    */
  private def monitorPipeline(s: SparkSession, d: String): DataFrame = {
    // spreadByKey between the join and the window aggregation (r15):
    // at fixture scale AQE broadcasts one events side, so scan + join
    // + window Expand + partial agg all collapse into the single-split
    // scan stage — one task did the whole decimal-avg kernel
    // (cpu_ms ≈ wall·1000). server_id partitioning ⊆ the
    // (server_id, window) group keys, so the final aggregate runs
    // exchange-free on top of this one exchange.
    val joined = graft.operators.spreadByKey(
      RefOps.joinOnKeys(cpuTable(s, d), memTable(s, d)), col("server_id"))
    val agged = RefOps.slidingWindowAgg(joined, "server_id",
      Seq(davg(col("cpu_pct")).as("avg_cpu"), davg(col("mem_pct")).as("avg_mem")), cfg)
    val alerted = agged.withColumn("alert",
      RefOps.classifyAlerts(col("avg_cpu"), cfg.cpuThreshold,
        col("avg_mem"), cfg.memThreshold,
        Alerts.cpuMemBoth, Alerts.cpuOnly, Alerts.memOnly))
    windowBoundsAsEpoch(alerted)
      .select(col("server_id"), col("window_start"), col("window_end"),
        col("avg_cpu"), col("avg_mem"), col("alert"))
  }

  val queries: Map[String, Q] = Map(
    "q_monitor_pipeline" -> (monitorPipeline(_, _)),

    // Alert EDGES over the pipeline output: only rows where a server's
    // alert differs from its previous window's alert (first window is an
    // edge from ""). Batch lag() form of Transitions; the stateful
    // streaming twin is property-checked equal in TransitionsSpec.
    "q_alert_transitions" -> ((s, d) =>
      graft.streaming.Transitions.transitionsBatch(
        monitorPipeline(s, d), "server_id", "window_start", "alert")
        .select(col("server_id"), col("window_start"),
          col("from_value").as("from_alert"), col("to_value").as("to_alert"))),

    // Alert DEBOUNCE (rate-limiting): keep an event only when more
    // than 12h past the last KEPT event of its user — the storm
    // suppressor a paging pipeline puts after alert generation. The
    // anchor advances on KEEP, so this is sequential semantics no
    // lag()/session window expresses; the oracle replays it as a
    // recursive CTE, the operator as one codegen'd aggregate() fold
    // per key (Sessionize.debounce).
    "q_debounce" -> ((s, d) =>
      graft.operators.Sessionize.debounce(
        Tables.events(s, d).select(col("user_id"),
          expr("unix_micros(ts)").as("e_us"), col("event_id")),
        keyCol = "user_id", epochCol = "e_us", tieCol = "event_id",
        cooldownUs = 43200000000L)),

    // job2 shape: sliding-window max (A3) + its CASE chain. max over
    // doubles is exact, no decimal detour needed.
    "q_monitor_max" -> ((s, d) => {
      val net = Tables.events(s, d).select(col("ts"),
        col("user_id").as("server_id"), (col("value") * 40).as("net_in"))
      val disk = Tables.events(s, d).select(col("ts"),
        col("user_id").as("server_id"), (col("value") * 20).as("disk_io"))
      // NOT spread (r15): monitorPipeline's spread was tried here too
      // and regressed 0.88 → 0.95 s — the max kernel is ~0.4 s of CPU,
      // cheaper than the extra exchange it would ride on.
      val joined = RefOps.joinOnKeys(net, disk)
      val agged = RefOps.slidingWindowAgg(joined, "server_id",
        Seq(max(col("net_in")).as("max_net_in"),
          max(col("disk_io")).as("max_disk_io")), cfg)
      val alerted = agged.withColumn("alert",
        RefOps.classifyAlerts(col("max_net_in"), cfg.netInThreshold,
          col("max_disk_io"), cfg.diskIoThreshold,
          Alerts.netDiskBoth, Alerts.netOnly, Alerts.diskOnly))
      windowBoundsAsEpoch(alerted)
        .select(col("server_id"), col("window_start"), col("window_end"),
          col("max_net_in"), col("max_disk_io"), col("alert"))
    }),

    // Row-level CASE-WHEN classification (F2/F3) without the window, to
    // pin the order-sensitive branch semantics on raw values.
    "q_case_when" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("cpu_pct", col("value"))
        .withColumn("mem_pct", lit(100.0) - col("value") / 5)
      ev.select(col("event_id"), col("cpu_pct"), col("mem_pct"),
        RefOps.classifyAlerts(col("cpu_pct"), cfg.cpuThreshold,
          col("mem_pct"), cfg.memThreshold,
          Alerts.cpuMemBoth, Alerts.cpuOnly, Alerts.memOnly).as("alert"))
    }),

    // K1+A4: 4-way topic fan-out then per-topic delivery accounting.
    // sum(length(value)) proves the CSV encode (P1) byte-for-byte.
    "q_fanout_stats" -> ((s, d) => {
      val wire = RefOps.topicFanout(wireDataset(s, d), cfg)
      wire.groupBy(col("topic")).agg(
        count(lit(1)).as("n_messages"),
        sum(length(col("value"))).as("total_bytes"))
    }),

    // P1→P2 round-trip: encode to wire strings, demux one topic (F1),
    // decode with from_csv, re-aggregate. Oracle computes the same
    // aggregates directly — equality proves the round-trip is lossless.
    "q_csv_roundtrip" -> ((s, d) => {
      val wire = RefOps.topicFanout(wireDataset(s, d), cfg)
      val cpuSchema = StructType(Seq(
        StructField("ts", LongType), StructField("server_id", LongType),
        StructField("cpu_pct", LongType)))
      val decoded = RefOps.decodeCsvValue(RefOps.demuxTopic(wire, cfg.cpuTopic), cpuSchema)
      decoded.agg(
        count(lit(1)).as("n_rows"),
        sum(col("ts")).as("sum_ts"),
        sum(col("cpu_pct")).as("sum_cpu"),
        countDistinct(col("server_id")).as("n_servers"))
    }),

    // A1 in isolation: window expansion row-multiplication (×3 for
    // 30s/10s) — the TimeWindowing/Expand rewrite, SURVEY.md §4.
    "q_window_counts" -> ((s, d) => {
      // NOT spread (r15): tried the monitorPipeline spread; count+dsum
      // over the ×3 Expand is too cheap to pay for the extra exchange
      // (0.70 → 0.76 s measured).
      val ev = Tables.events(s, d)
      windowBoundsAsEpoch(
        ev.groupBy(col("user_id"), window(col("ts"), cfg.windowDuration, cfg.slideDuration))
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value")))
        .select(col("user_id"), col("window_start"), col("window_end"),
          col("n_events"), col("sum_value"))
    })
  )

  /** DuckDB sliding-window expansion fragment (see class doc). */
  private def expandWindows(src: String): String =
    s"""SELECT *,
       |  CAST(floor(epoch_ms(ts)/10000.0)*10 AS BIGINT) - off AS window_start,
       |  CAST(floor(epoch_ms(ts)/10000.0)*10 AS BIGINT) - off + 30 AS window_end
       |FROM ($src) CROSS JOIN (SELECT unnest([0,10,20]) AS off) offs""".stripMargin

  private val alertCase1 =
    s"""CASE WHEN avg_cpu > ${cfg.cpuThreshold} AND avg_mem > ${cfg.memThreshold} THEN '${Alerts.cpuMemBoth}'
       |     WHEN avg_cpu > ${cfg.cpuThreshold} THEN '${Alerts.cpuOnly}'
       |     WHEN avg_mem > ${cfg.memThreshold} THEN '${Alerts.memOnly}'
       |     ELSE '${Alerts.ok}' END""".stripMargin

  private val alertCase2 =
    s"""CASE WHEN max_net_in > ${cfg.netInThreshold} AND max_disk_io > ${cfg.diskIoThreshold} THEN '${Alerts.netDiskBoth}'
       |     WHEN max_net_in > ${cfg.netInThreshold} THEN '${Alerts.netOnly}'
       |     WHEN max_disk_io > ${cfg.diskIoThreshold} THEN '${Alerts.diskOnly}'
       |     ELSE '${Alerts.ok}' END""".stripMargin

  private val wireDatasetSql =
    """SELECT epoch_ms(ts) AS ts, user_id AS server_id,
      |  CAST(floor(value) AS BIGINT) AS cpu_pct,
      |  CAST(floor(value) + 1 AS BIGINT) AS mem_pct,
      |  CAST(floor(value) * 40 AS BIGINT) AS net_in,
      |  CAST(floor(value) * 2 AS BIGINT) AS net_out,
      |  CAST(floor(value) * 20 AS BIGINT) AS disk_io
      |FROM events""".stripMargin

  private val fanoutSql =
    s"""WITH w AS ($wireDatasetSql)
       |SELECT 'topic-cpu' AS topic, concat_ws(',', ts, server_id, cpu_pct) AS value FROM w
       |UNION ALL
       |SELECT 'topic-mem', concat_ws(',', ts, server_id, mem_pct) FROM w
       |UNION ALL
       |SELECT 'topic-net', concat_ws(',', ts, server_id, net_in, net_out) FROM w
       |UNION ALL
       |SELECT 'topic-disk', concat_ws(',', ts, server_id, disk_io) FROM w""".stripMargin

  private val monitorPipelineSql =
    s"""WITH j AS (
       |  SELECT c.ts, c.server_id, c.cpu_pct, m.mem_pct
       |  FROM (SELECT ts, user_id AS server_id, value AS cpu_pct FROM events) c
       |  JOIN (SELECT ts, user_id AS server_id, 100.0 - value/5 AS mem_pct FROM events) m
       |    ON c.ts = m.ts AND c.server_id = m.server_id
       |), e AS (${expandWindows("SELECT * FROM j")}),
       |a AS (
       |  SELECT server_id, window_start, window_end,
       |    ${sqlDavg("cpu_pct")} AS avg_cpu,
       |    ${sqlDavg("mem_pct")} AS avg_mem
       |  FROM e GROUP BY server_id, window_start, window_end
       |)
       |SELECT server_id, window_start, window_end, avg_cpu, avg_mem,
       |  $alertCase1 AS alert
       |FROM a""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_monitor_pipeline" -> monitorPipelineSql,

    // The keep decision depends on the previous KEEP: a recursive CTE
    // walks each user's rows in (ts, event_id) order carrying the
    // last-kept anchor.
    "q_debounce" ->
      """WITH RECURSIVE o AS (
        |  SELECT user_id, epoch_us(ts) AS e, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events
        |), w AS (
        |  SELECT user_id, rn, e, event_id, e AS last_kept, TRUE AS kept
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.rn, o.e, o.event_id,
        |    CASE WHEN o.e - w.last_kept > 43200000000
        |         THEN o.e ELSE w.last_kept END,
        |    o.e - w.last_kept > 43200000000
        |  FROM w JOIN o ON o.user_id = w.user_id AND o.rn = w.rn + 1
        |)
        |SELECT user_id, e AS e_us, event_id FROM w WHERE kept""".stripMargin,

    "q_alert_transitions" ->
      s"""WITH mp AS ($monitorPipelineSql),
         |t AS (
         |  SELECT server_id, window_start, alert,
         |    lag(alert) OVER (PARTITION BY server_id ORDER BY window_start) AS prev
         |  FROM mp
         |)
         |SELECT server_id, window_start,
         |  coalesce(prev, '') AS from_alert, alert AS to_alert
         |FROM t WHERE prev IS NULL OR prev <> alert""".stripMargin,

    "q_monitor_max" ->
      s"""WITH j AS (
         |  SELECT n.ts, n.server_id, n.net_in, k.disk_io
         |  FROM (SELECT ts, user_id AS server_id, value * 40 AS net_in FROM events) n
         |  JOIN (SELECT ts, user_id AS server_id, value * 20 AS disk_io FROM events) k
         |    ON n.ts = k.ts AND n.server_id = k.server_id
         |), e AS (${expandWindows("SELECT * FROM j")}),
         |a AS (
         |  SELECT server_id, window_start, window_end,
         |    MAX(net_in) AS max_net_in, MAX(disk_io) AS max_disk_io
         |  FROM e GROUP BY server_id, window_start, window_end
         |)
         |SELECT server_id, window_start, window_end, max_net_in, max_disk_io,
         |  $alertCase2 AS alert
         |FROM a""".stripMargin,

    "q_case_when" ->
      s"""WITH v AS (
         |  SELECT event_id, value AS cpu_pct, 100.0 - value/5 AS mem_pct FROM events
         |)
         |SELECT event_id, cpu_pct, mem_pct,
         |  ${alertCase1.replace("avg_cpu", "cpu_pct").replace("avg_mem", "mem_pct")} AS alert
         |FROM v""".stripMargin,

    "q_fanout_stats" ->
      s"""SELECT topic, COUNT(*) AS n_messages,
         |  CAST(SUM(length(value)) AS BIGINT) AS total_bytes
         |FROM ($fanoutSql)
         |GROUP BY topic""".stripMargin,

    "q_csv_roundtrip" ->
      s"""WITH w AS ($wireDatasetSql)
         |SELECT COUNT(*) AS n_rows, CAST(SUM(ts) AS BIGINT) AS sum_ts,
         |  CAST(SUM(cpu_pct) AS BIGINT) AS sum_cpu,
         |  COUNT(DISTINCT server_id) AS n_servers
         |FROM w""".stripMargin,

    "q_window_counts" ->
      s"""WITH e AS (${expandWindows("SELECT user_id, value, ts FROM events")})
         |SELECT user_id, window_start, window_end,
         |  COUNT(*) AS n_events, ${sqlDsum("value")} AS sum_value
         |FROM e GROUP BY user_id, window_start, window_end""".stripMargin
  )
}
