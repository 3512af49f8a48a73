package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Cdc, TimeSeries}

/** Time-series shaping over the events table: regular-grid resampling
  * with forward-fill (gap repair before feature extraction) and SCD2
  * validity-interval compaction (CDC history building). Both fully
  * DuckDB-oracle-checked.
  */
object TimeSeriesQueries {

  val queries: Map[String, Q] = Map(
    // Resample each event_type's value stream onto an hourly grid:
    // last observation per bucket, gaps forward-filled. 5 keys ×
    // 30 days × 24 = ~3.6k output rows regardless of input size.
    "q_resample" -> ((s, d) =>
      TimeSeries.resampleLastFfill(
        Tables.events(s, d)
          .select(col("event_type"),
            expr("unix_micros(ts) div 1000000").as("e"),
            col("event_id"), col("value")),
        keyCol = "event_type", epochCol = "e", tieCol = "event_id",
        valCol = "value", bucketSeconds = 3600L)),

    // Linear-interpolation twin of q_resample: the same hourly grid,
    // but interior gaps repaired by integer-exact linear interpolation
    // between the neighboring anchors (micro-unit fixed point), and
    // exterior gaps left null. The repair step for continuous metrics
    // where carrying the last value forward would fabricate a plateau.
    "q_interpolate" -> ((s, d) =>
      TimeSeries.resampleLinear(
        Tables.events(s, d)
          .select(col("event_type"),
            expr("unix_micros(ts) div 1000000").as("e"),
            col("event_id"), col("value")),
        keyCol = "event_type", epochCol = "e", tieCol = "event_id",
        valCol = "value", bucketSeconds = 3600L)),

    // Time-series completeness audit: per user, the active-day count,
    // calendar span, missing days, and longest silent gap — the
    // coverage report that decides whether an interaction log is dense
    // enough to train on. No day-grid explode: span − distinct-active
    // gives the missing count and a lag window gives the max gap, so
    // cost is one distinct + one user-partitioned window regardless of
    // span length (the generate_series form pays |users|·|days| rows).
    "q_gap_audit" -> ((s, d) => {
      val ud = Tables.events(s, d).filter(col("user_id").isNotNull)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("day"))
      ud.withColumn("gap", col("day") - lag(col("day"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_active"),
          (max(col("day")) - min(col("day")) + 1).as("span_days"),
          max(col("gap")).as("max_gap"))
        .select(col("user_id"), col("n_active"), col("span_days"),
          (col("span_days") - col("n_active")).as("n_missing"),
          coalesce(col("max_gap"), lit(0L)).as("max_gap"))
    }),

    // SCD2 history of each user's event_type: rows where the type
    // changed, with [valid_from, valid_to) microsecond intervals
    // (valid_to null on the open row).
    "q_scd2" -> ((s, d) =>
      TimeSeries.scd2History(
        Tables.events(s, d)
          .select(col("user_id"), expr("unix_micros(ts)").as("e_us"),
            col("event_id"), col("event_type")),
        keyCol = "user_id", epochCol = "e_us", tieCol = "event_id",
        attrCol = "event_type")),

    // CDC MERGE: fold a changelog (derived deterministically from
    // orders — finalized orders delete their customer row, open ones
    // upsert the balance to the order total; highest order key wins)
    // into the customer snapshot.
    "q_upsert" -> ((s, d) => {
      val base = Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal"))
      val changes = Tables.orders(s, d).select(
        col("o_custkey").as("c_custkey"), col("o_totalprice").as("c_acctbal"),
        col("o_orderkey").as("seq"),
        when(col("o_orderstatus") === "F", "D").otherwise("U").as("op"))
      Cdc.applyChanges(base, changes, Seq("c_custkey"), "seq", "op")
    }),

    // Snapshot diff between two deterministic corpus cuts: old drops
    // doc_id%10=7, new drops %10=4 and edits %10=3 — every key lands in
    // exactly one of added/removed/changed/unchanged by content hash.
    // Digests, never bodies, cross the full-outer shuffle.
    "q_snapshot_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val oldSnap = docs.filter(col("doc_id") % 10 =!= 7)
      val newSnap = docs.filter(col("doc_id") % 10 =!= 4)
        .withColumn("text", when(col("doc_id") % 10 === 3,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      Cdc.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_gap_audit" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events WHERE user_id IS NOT NULL
        |), g AS (
        |  SELECT user_id, day,
        |    day - lag(day) OVER (PARTITION BY user_id ORDER BY day) AS gap
        |  FROM ud
        |)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_active,
        |  CAST(MAX(day) - MIN(day) + 1 AS BIGINT) AS span_days,
        |  CAST(MAX(day) - MIN(day) + 1 - COUNT(*) AS BIGINT) AS n_missing,
        |  CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap
        |FROM g GROUP BY user_id""".stripMargin,

    "q_snapshot_diff" ->
      """WITH a AS (SELECT doc_id, md5(text) AS ha FROM documents
        |           WHERE doc_id % 10 <> 7),
        |b AS (SELECT doc_id,
        |        md5(CASE WHEN doc_id % 10 = 3 THEN text || ' v2'
        |                 ELSE text END) AS hb
        |      FROM documents WHERE doc_id % 10 <> 4)
        |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
        |  CASE WHEN a.ha IS NULL THEN 'added'
        |       WHEN b.hb IS NULL THEN 'removed'
        |       WHEN a.ha = b.hb THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM a FULL JOIN b ON a.doc_id = b.doc_id""".stripMargin,

    // Mirrors resampleLinear stage-by-stage: same anchor/grid CTEs as
    // q_resample, then BOTH running counts (asc for the previous
    // anchor, desc for the next) and the magnitude-guarded integer
    // interpolation.
    "q_interpolate" ->
      """WITH o AS (
        |  SELECT event_type, epoch_us(ts) // 1000000 AS e, event_id, value,
        |    (epoch_us(ts) // 1000000) // 3600 AS bucket
        |  FROM events
        |), lastv AS (
        |  SELECT event_type, bucket, value,
        |    row_number() OVER (PARTITION BY event_type, bucket
        |                       ORDER BY e DESC, event_id DESC) AS rn
        |  FROM o
        |), cnt AS (
        |  SELECT event_type, bucket, COUNT(*) AS obs_cnt
        |  FROM o GROUP BY event_type, bucket
        |), b AS (
        |  SELECT event_type, MIN(bucket) AS mn, MAX(bucket) AS mx
        |  FROM o GROUP BY event_type
        |), grid AS (
        |  SELECT event_type, unnest(generate_series(mn, mx)) AS bucket FROM b
        |), j AS (
        |  SELECT g.event_type, g.bucket, c.obs_cnt,
        |    CAST(floor(l.value * 1e6) AS BIGINT) AS vq
        |  FROM grid g
        |  LEFT JOIN cnt c ON g.event_type = c.event_type AND g.bucket = c.bucket
        |  LEFT JOIN (SELECT event_type, bucket, value FROM lastv WHERE rn = 1) l
        |    ON g.event_type = l.event_type AND g.bucket = l.bucket
        |), f AS (
        |  SELECT event_type, bucket, obs_cnt, vq,
        |    COUNT(vq) OVER (PARTITION BY event_type ORDER BY bucket) AS grp,
        |    COUNT(vq) OVER (PARTITION BY event_type ORDER BY bucket DESC) AS grpr
        |  FROM j
        |), a AS (
        |  SELECT event_type, bucket, obs_cnt, vq,
        |    MAX(vq) OVER (PARTITION BY event_type, grp) AS pv,
        |    MIN(bucket) OVER (PARTITION BY event_type, grp) AS pb,
        |    MAX(vq) OVER (PARTITION BY event_type, grpr) AS nv,
        |    MAX(bucket) OVER (PARTITION BY event_type, grpr) AS nb
        |  FROM f
        |)
        |SELECT event_type, bucket * 3600 AS bucket_start,
        |  CAST(COALESCE(obs_cnt, 0) AS BIGINT) AS obs_cnt,
        |  CASE WHEN vq IS NOT NULL THEN vq
        |       WHEN pv IS NULL OR nv IS NULL THEN NULL
        |       ELSE pv + CASE WHEN (nv - pv) * (bucket - pb) >= 0
        |                 THEN ((nv - pv) * (bucket - pb)) // (nb - pb)
        |                 ELSE -((-((nv - pv) * (bucket - pb))) // (nb - pb))
        |                 END
        |  END AS value_interp_micro
        |FROM a""".stripMargin,

    // Mirrors the operator stage-by-stage: per-bucket count + last
    // value (row_number instead of Spark's max(struct)), key-range
    // grid via generate_series, then the same portable
    // gaps-and-islands forward fill (COUNT(v) running group + one
    // value per group).
    "q_resample" ->
      """WITH o AS (
        |  SELECT event_type, epoch_us(ts) // 1000000 AS e, event_id, value,
        |    (epoch_us(ts) // 1000000) // 3600 AS bucket
        |  FROM events
        |), lastv AS (
        |  SELECT event_type, bucket, value,
        |    row_number() OVER (PARTITION BY event_type, bucket
        |                       ORDER BY e DESC, event_id DESC) AS rn
        |  FROM o
        |), cnt AS (
        |  SELECT event_type, bucket, COUNT(*) AS obs_cnt
        |  FROM o GROUP BY event_type, bucket
        |), b AS (
        |  SELECT event_type, MIN(bucket) AS mn, MAX(bucket) AS mx
        |  FROM o GROUP BY event_type
        |), grid AS (
        |  SELECT event_type, unnest(generate_series(mn, mx)) AS bucket FROM b
        |), j AS (
        |  SELECT g.event_type, g.bucket, c.obs_cnt, l.value AS v
        |  FROM grid g
        |  LEFT JOIN cnt c ON g.event_type = c.event_type AND g.bucket = c.bucket
        |  LEFT JOIN (SELECT event_type, bucket, value FROM lastv WHERE rn = 1) l
        |    ON g.event_type = l.event_type AND g.bucket = l.bucket
        |), f AS (
        |  SELECT event_type, bucket, COALESCE(obs_cnt, 0) AS obs_cnt, v,
        |    COUNT(v) OVER (PARTITION BY event_type ORDER BY bucket) AS grp
        |  FROM j
        |)
        |SELECT event_type, bucket * 3600 AS bucket_start, obs_cnt,
        |  MAX(v) OVER (PARTITION BY event_type, grp) AS value_ffill
        |FROM f""".stripMargin,

    "q_scd2" ->
      """WITH o AS (
        |  SELECT user_id, epoch_us(ts) AS e_us, event_id, event_type
        |  FROM events
        |), c AS (
        |  SELECT user_id, e_us, event_id, event_type,
        |    lag(event_type) OVER w AS prev, row_number() OVER w AS rn
        |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY e_us, event_id)
        |), ch AS (
        |  SELECT user_id, e_us, event_id, event_type
        |  FROM c WHERE rn = 1 OR prev IS DISTINCT FROM event_type
        |)
        |SELECT user_id, event_type, e_us AS valid_from,
        |  lead(e_us) OVER (PARTITION BY user_id
        |                   ORDER BY e_us, event_id) AS valid_to
        |FROM ch""".stripMargin,

    "q_upsert" ->
      """WITH ch AS (
        |  SELECT o_custkey AS c_custkey, o_totalprice AS c_acctbal,
        |    o_orderkey AS seq,
        |    CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        |  FROM orders
        |), last AS (
        |  SELECT c_custkey, c_acctbal, op FROM (
        |    SELECT *, row_number() OVER (PARTITION BY c_custkey
        |                                 ORDER BY seq DESC) AS rn
        |    FROM ch
        |  ) WHERE rn = 1
        |)
        |SELECT c.c_custkey, c.c_acctbal FROM customer c
        |WHERE c.c_custkey NOT IN (SELECT c_custkey FROM last)
        |UNION ALL
        |SELECT c_custkey, c_acctbal FROM last WHERE op <> 'D'""".stripMargin
  )
}
