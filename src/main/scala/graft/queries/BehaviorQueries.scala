package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** User-behavior analytics over the events stream: ordered-funnel
  * conversion, weekly cohort retention, Markov transition counts, and
  * percentile winsorization. The product-analytics staples a
  * training-data pipeline reuses for interaction-log curation (e.g.
  * selecting users/sessions by engagement depth before export). Every
  * query has a full DuckDB oracle; all arithmetic is integer or pure
  * selection of stored values, so results are engine-exact.
  *
  * Ref behavior: the reference aggregates per-server metric streams
  * (spark_jobs/spark_job1.py); these queries apply the same shuffle-by-key +
  * aggregate shapes to per-user event streams.
  */
object BehaviorQueries {

  /** Epoch-micros column for the events `ts` (nanos parquet → micros is
    * a floor in both engines for post-1970 data, mirrored by DuckDB's
    * `epoch_us`). */
  private def tu = expr("unix_micros(ts)")

  val queries: Map[String, Q] = Map(
    // Bradley-Terry preference strengths over deterministic pairwise
    // "matches" (consecutive event-id pairs; higher value wins, ties
    // to the lower user id) — the RLHF preference-data ranking step,
    // MM-iterated 2 unrolled rounds in integer micro-units (see
    // Ranking.bradleyTerry for the arithmetic and scale shape).
    "q_bradley_terry" -> ((s, d) => {
      val sided = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .select(expr("event_id div 2").as("mid"),
          expr("event_id % 2").as("side"), col("user_id"), col("value"))
      val aWins = col("va") > col("vb") ||
        (col("va") === col("vb") && col("ua") < col("ub"))
      val matches = sided.groupBy(col("mid")).agg(
          max(when(col("side") === 0, col("user_id"))).as("ua"),
          max(when(col("side") === 0, col("value"))).as("va"),
          max(when(col("side") === 1, col("user_id"))).as("ub"),
          max(when(col("side") === 1, col("value"))).as("vb"))
        .filter(col("ua").isNotNull && col("ub").isNotNull &&
          col("ua") =!= col("ub"))
        .select(when(aWins, col("ua")).otherwise(col("ub")).as("winner"),
          when(aWins, col("ub")).otherwise(col("ua")).as("loser"))
      graft.operators.Ranking.bradleyTerry(matches, "winner", "loser", rounds = 2)
    }),

    // Chat-transcript assembly: per-user 2h-gap sessions, events
    // concatenated in (time, id) order until a 64-token budget is hit;
    // the truncated tail is counted, not silently lost. The per-event
    // cost and every boundary are exact integers; the assembled string
    // itself rides the hash gate.
    "q_chat_assembly" -> ((s, d) =>
      graft.operators.Sessionize.assembleSessions(
        Tables.events(s, d).filter(col("user_id").isNotNull),
        "user_id", "event_id", "event_type", "ts",
        gapUs = 7200L * 1000000L, budget = 64L)),

    // Ordered funnel view → click → purchase, sequential semantics
    // (a purchase before the first post-view click does not convert) —
    // see Behavior.funnelStages for the semantics + scale argument.
    // Timestamps surface as epoch micros (exact integers).
    "q_funnel" -> ((s, d) =>
      graft.operators.Behavior.funnelStages(
        Tables.events(s, d)
          .select(col("user_id"), col("event_type"), tu.as("tu")),
        Seq("view", "click", "purchase"))),

    // Conversion-latency distribution: per converted user the
    // view→purchase funnel time, summarized as rank-exact percentiles
    // (the shared rankOrdered scaffold over one constant group —
    // latencies are integer micros, so every output is engine-exact).
    // Composes q_funnel's anchors; the percentile pass adds one window
    // sort over |converted users| rows.
    "q_conversion_latency" -> ((s, d) => {
      val converted = graft.operators.Behavior.funnelStages(
          Tables.events(s, d)
            .select(col("user_id"), col("event_type"), tu.as("tu")),
          Seq("view", "click", "purchase"))
        .filter(col("stage") === 3)
        .select(col("user_id"), (col("t3") - col("t1")).as("latency_us"),
          lit(1).as("g"))
      // global aggregate (no groupBy): exactly one output row even for
      // an empty conversion set, matching the oracle's global aggregate
      // — a grouped form would emit zero rows there
      rankOrdered(converted, "g", "latency_us", "user_id")
        .agg(count(lit(1)).as("n_converted"),
          max(when(col("rn") === rankIdx(50), col("latency_us"))).as("p50_us"),
          max(when(col("rn") === rankIdx(90), col("latency_us"))).as("p90_us"))
    }),

    // Weekly cohort retention: users bucketed by first-activity week,
    // counted per (cohort, weeks-since-cohort) cell. Two shuffles on
    // user_id (first-seen aggregate, then the distinct) + one tiny
    // final aggregate; all week math is integer epoch-day division, so
    // cells are engine-exact. The classic retention-triangle input.
    "q_cohort_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"))
      val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("d0"))
      ev.join(first, "user_id")
        .select(col("user_id"), expr("d0 div 7").as("cohort_week"),
          expr("(day - d0) div 7").as("week_offset"))
        .distinct()
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // First-order Markov transition counts over each user's event
    // sequence (lag window, ties broken by event_id) — the n×n
    // transition matrix behind session-behavior modeling. One shuffle
    // by user_id with an in-partition sort, then a 25-row aggregate;
    // the window never materializes more than a partition.
    "q_event_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(asc("tu"), asc("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"), tu.as("tu"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("curr_type"))
        .agg(count(lit(1)).as("n"))
    }),

    // Top-20 trigram path motifs: the third-order extension of
    // q_event_transitions — (prev2, prev, curr) sequences per user,
    // counted globally with the (count desc, path asc) deterministic
    // tie-break. Two lags share the transitions window, so the plan is
    // STILL one exchange + one in-partition sort (hashpartitioning by
    // user_id satisfies both frames), then a ≤|types|³ aggregate and a
    // TakeOrdered top-k — no global sort, corpus-linear at any scale.
    // Path mining at this shape is how interaction-log curation finds
    // the journeys worth keeping (and the loops worth down-sampling).
    "q_path_motifs" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(asc("tu"), asc("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"), tu.as("tu"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("prev2_type", lag(col("event_type"), 2).over(w))
        .filter(col("prev2_type").isNotNull)
        .groupBy(col("prev2_type"), col("prev_type"),
          col("event_type").as("curr_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("prev2_type"), asc("prev_type"), asc("curr_type"))
        .limit(20)
    }),

    // Winsorization: clip each value to its group's exact rank-selected
    // [p5, p95] (rankOrdered/rankIdx scaffold — clip bounds are actual
    // stored doubles, so least/greatest is pure selection and
    // engine-exact). One exchange, one sort: row_number and both
    // conditional-max window aggregates share the event_type partition.
    "q_winsorize" -> ((s, d) => {
      val wAll = Window.partitionBy(col("event_type"))
      rankOrdered(Tables.events(s, d)
          .select(col("event_type"), col("event_id"), col("value")),
          "event_type", "value", "event_id")
        .withColumn("p05", max(when(col("rn") === rankIdx(5), col("value"))).over(wAll))
        .withColumn("p95", max(when(col("rn") === rankIdx(95), col("value"))).over(wAll))
        .select(col("event_type"), col("event_id"),
          least(greatest(col("value"), col("p05")), col("p95"))
            .as("value_clipped"))
    })
  )

  val oracles: Map[String, String] = Map(
    // Same gaps-and-islands session ids, same (tu, event_id) total
    // order, same prefix-cost cut; string_agg skips the CASE's NULL
    // tail exactly as collect_list does.
    "q_chat_assembly" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tu
        |  FROM events WHERE user_id IS NOT NULL
        |), s AS (
        |  SELECT *, CASE WHEN lag(tu) OVER w IS NULL
        |                   OR tu - lag(tu) OVER w > 7200000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)
        |), s2 AS (
        |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY tu, event_id) AS sid
        |  FROM s
        |), c AS (
        |  SELECT *, SUM(length(event_type) + 1)
        |    OVER (PARTITION BY user_id, sid ORDER BY tu, event_id) AS cum
        |  FROM s2
        |)
        |SELECT user_id, MIN(tu) AS session_start,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN cum <= 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(COUNT(*) - SUM(CASE WHEN cum <= 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  string_agg(CASE WHEN cum <= 64 THEN event_type END, ' '
        |             ORDER BY tu, event_id) AS assembled
        |FROM c GROUP BY user_id, sid""".stripMargin,

    // Unrolled two-round MM mirror: identical match derivation,
    // identical truncating integer divisions (all operands positive, so
    // DuckDB `//` == Spark `div`), identical GREATEST floor.
    "q_bradley_terry" ->
      """WITH e AS (
        |  SELECT event_id // 2 AS mid, event_id % 2 AS side, user_id, value
        |  FROM events WHERE user_id IS NOT NULL
        |), m0 AS (
        |  SELECT mid,
        |    max(CASE WHEN side = 0 THEN user_id END) AS ua,
        |    max(CASE WHEN side = 0 THEN value END) AS va,
        |    max(CASE WHEN side = 1 THEN user_id END) AS ub,
        |    max(CASE WHEN side = 1 THEN value END) AS vb
        |  FROM e GROUP BY mid
        |), m AS (
        |  SELECT
        |    CASE WHEN va > vb OR (va = vb AND ua < ub) THEN ua ELSE ub END AS winner,
        |    CASE WHEN va > vb OR (va = vb AND ua < ub) THEN ub ELSE ua END AS loser
        |  FROM m0 WHERE ua IS NOT NULL AND ub IS NOT NULL AND ua <> ub
        |), dir AS (
        |  SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(w) AS BIGINT) AS wins
        |  FROM (
        |    SELECT winner AS i, loser AS j, 1 AS w FROM m
        |    UNION ALL SELECT loser AS i, winner AS j, 0 AS w FROM m
        |  ) t GROUP BY i, j
        |), p0 AS (
        |  SELECT i AS player, CAST(SUM(wins) AS BIGINT) AS wins,
        |    CAST(SUM(n) AS BIGINT) AS n_matches, CAST(1000000 AS BIGINT) AS r
        |  FROM dir GROUP BY i
        |), d1 AS (
        |  SELECT d.i, CAST(SUM((d.n * 1000000000000) // (pi.r + pj.r)) AS BIGINT) AS dd
        |  FROM dir d JOIN p0 pi ON pi.player = d.i JOIN p0 pj ON pj.player = d.j
        |  GROUP BY d.i
        |), p1 AS (
        |  SELECT p.player, p.wins, p.n_matches,
        |    CAST(GREATEST(1, (p.wins * 1000000000000) // d1.dd) AS BIGINT) AS r
        |  FROM p0 p JOIN d1 ON d1.i = p.player
        |), d2 AS (
        |  SELECT d.i, CAST(SUM((d.n * 1000000000000) // (pi.r + pj.r)) AS BIGINT) AS dd
        |  FROM dir d JOIN p1 pi ON pi.player = d.i JOIN p1 pj ON pj.player = d.j
        |  GROUP BY d.i
        |), p2 AS (
        |  SELECT p.player, p.wins, p.n_matches,
        |    CAST(GREATEST(1, (p.wins * 1000000000000) // d2.dd) AS BIGINT) AS r
        |  FROM p1 p JOIN d2 ON d2.i = p.player
        |)
        |SELECT player, r AS rating, wins, n_matches FROM p2""".stripMargin,
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tu FROM events),
        |t1 AS (SELECT user_id, MIN(tu) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, MIN(tu) AS t2 FROM e JOIN t1 USING (user_id)
        |       WHERE event_type = 'click' AND tu > t1 GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, MIN(tu) AS t3 FROM e JOIN t2 USING (user_id)
        |       WHERE event_type = 'purchase' AND tu > t2 GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM e)
        |SELECT u.user_id,
        |  CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |       WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage,
        |  t1, t2, t3
        |FROM u LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
        |  LEFT JOIN t3 USING (user_id)""".stripMargin,

    // reuses q_funnel's anchor chain; stage-3 users are exactly those
    // with a t3 (its CTE requires t2 which requires t1)
    "q_conversion_latency" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tu FROM events),
         |t1 AS (SELECT user_id, MIN(tu) AS t1 FROM e
         |       WHERE event_type = 'view' GROUP BY user_id),
         |t2 AS (SELECT e.user_id, MIN(tu) AS t2 FROM e JOIN t1 USING (user_id)
         |       WHERE event_type = 'click' AND tu > t1 GROUP BY e.user_id),
         |t3 AS (SELECT e.user_id, MIN(tu) AS t3 FROM e JOIN t2 USING (user_id)
         |       WHERE event_type = 'purchase' AND tu > t2 GROUP BY e.user_id),
         |conv AS (
         |  SELECT t3.user_id, t3.t3 - t1.t1 AS latency_us
         |  FROM t3 JOIN t1 USING (user_id)
         |), r AS (
         |  SELECT user_id, latency_us,
         |    row_number() OVER (ORDER BY latency_us ASC, user_id ASC) AS rn,
         |    COUNT(*) OVER () AS n
         |  FROM conv
         |)
         |SELECT COUNT(*) AS n_converted,
         |  MAX(CASE WHEN rn = ${sqlRankIdx(50)} THEN latency_us END) AS p50_us,
         |  MAX(CASE WHEN rn = ${sqlRankIdx(90)} THEN latency_us END) AS p90_us
         |FROM r""".stripMargin,

    "q_cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
        |), f AS (
        |  SELECT user_id, MIN(day) AS d0 FROM e GROUP BY user_id
        |), a AS (
        |  SELECT DISTINCT e.user_id, d0 // 7 AS cohort_week,
        |    (day - d0) // 7 AS week_offset
        |  FROM e JOIN f USING (user_id)
        |)
        |SELECT cohort_week, week_offset, COUNT(*) AS n_users
        |FROM a GROUP BY cohort_week, week_offset""".stripMargin,

    "q_event_transitions" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |    lag(event_type, 1) OVER (PARTITION BY user_id
        |                             ORDER BY epoch_us(ts) ASC, event_id ASC)
        |      AS prev_type
        |  FROM events
        |)
        |SELECT prev_type, event_type AS curr_type, COUNT(*) AS n
        |FROM s WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, curr_type""".stripMargin,

    "q_path_motifs" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |    lag(event_type, 1) OVER w AS prev_type,
        |    lag(event_type, 2) OVER w AS prev2_type
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY epoch_us(ts) ASC, event_id ASC)
        |)
        |SELECT prev2_type, prev_type, event_type AS curr_type,
        |  COUNT(*) AS n
        |FROM s WHERE prev2_type IS NOT NULL
        |GROUP BY prev2_type, prev_type, curr_type
        |ORDER BY n DESC, prev2_type ASC, prev_type ASC, curr_type ASC
        |LIMIT 20""".stripMargin,

    "q_winsorize" ->
      s"""WITH r AS (
         |  SELECT event_type, event_id, value,
         |    row_number() OVER (PARTITION BY event_type
         |                       ORDER BY value ASC, event_id ASC) AS rn,
         |    COUNT(*) OVER (PARTITION BY event_type) AS n
         |  FROM events
         |), p AS (
         |  SELECT event_type, event_id, value,
         |    MAX(CASE WHEN rn = ${sqlRankIdx(5)} THEN value END)
         |      OVER (PARTITION BY event_type) AS p05,
         |    MAX(CASE WHEN rn = ${sqlRankIdx(95)} THEN value END)
         |      OVER (PARTITION BY event_type) AS p95
         |  FROM r
         |)
         |SELECT event_type, event_id,
         |  least(greatest(value, p05), p95) AS value_clipped
         |FROM p""".stripMargin
  )
}
