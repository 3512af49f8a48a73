package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.RangeJoin

/** Relational-breadth extensions beyond the reference surface:
  * multi-dimensional aggregation (CUBE / GROUPING SETS), pivot/unpivot
  * reshaping, the ranking/analytic window-function family, a scale-safe
  * binned range join, and exact rank-selected percentiles. Every query
  * has a full DuckDB oracle.
  */
object AnalyticsQueries {

  private val priorities =
    Seq("1-URGENT" -> "n_urgent", "2-HIGH" -> "n_high", "3-MEDIUM" -> "n_medium",
      "4-NOT SPECIFIED" -> "n_not_specified", "5-LOW" -> "n_low")

  val queries: Map[String, Q] = Map(
    // CUBE: all 4 grouping combinations in one pass (one Expand + one
    // shuffle — Catalyst's grouping-set expansion, not 4 scans).
    "q_cube" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), lsum(col("l_quantity")).as("sum_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))),

    // ROLLUP: the hierarchical prefix of CUBE (flag, flag+status, total)
    // — same single Expand+shuffle plan, one fewer grouping set.
    "q_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), lsum(col("l_quantity")).as("sum_qty"))),

    // GROUPING SETS with an explicit grouping-bit id (portable: built
    // from per-column grouping() flags, not the engine-specific
    // grouping_id encoding).
    "q_grouping_sets" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg((grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
          .cast("long").as("gid"),
          count(lit(1)).as("n"), lsum(col("l_quantity")).as("sum_qty"))),

    // PIVOT: priority counts spread to columns (explicit value list —
    // the deterministic, single-pass form; a discovery pivot would need
    // an extra distinct scan). Missing combinations are 0, not null.
    "q_pivot" -> ((s, d) => {
      val pivoted = Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority", priorities.map(_._1))
        .agg(count(lit(1)))
      pivoted.select(col("o_orderstatus") +:
        priorities.map { case (v, a) => coalesce(col(s"`$v`"), lit(0L)).as(a) }: _*)
    }),

    // UNPIVOT (melt): 4 measure columns → (measure, value) rows, then a
    // per-measure profile. The unpivot itself is a narrow Expand — no
    // shuffle until the aggregate.
    "q_unpivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .unpivot(Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            col("l_tax")), "measure", "value")
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("n"), min(col("value")).as("lo"),
          max(col("value")).as("hi"), lsum(col("value")).as("total"))),

    // The analytic window-function family over one partition spec:
    // row_number / lag / lead / ntile on the fully-deterministic order,
    // rank / dense_rank / cume_dist / percent_rank on the ties-bearing
    // quantity order (their whole point is tie handling; outputs are
    // deterministic because ties collapse to equal outputs). ratios are
    // exact-int divisions → engine-identical doubles.
    "q_window_suite" -> ((s, d) => {
      val wDet = Window.partitionBy(col("l_suppkey"))
        .orderBy(desc("l_quantity"), asc("l_orderkey"), asc("l_linenumber"))
      val wTies = Window.partitionBy(col("l_suppkey")).orderBy(desc("l_quantity"))
      Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"), col("l_quantity"))
        .withColumn("rn", row_number().over(wDet).cast("long"))
        .withColumn("rnk", rank().over(wTies).cast("long"))
        .withColumn("drnk", dense_rank().over(wTies).cast("long"))
        .withColumn("prev_qty", lag(col("l_quantity"), 1).over(wDet))
        .withColumn("next_qty", lead(col("l_quantity"), 1).over(wDet))
        .withColumn("quartile", ntile(4).over(wDet).cast("long"))
        .withColumn("cd", cume_dist().over(wTies))
        .withColumn("pr", percent_rank().over(wTies))
    }),

    // Binned range join: lineitems shipped inside the 7-day audit window
    // of any top-50-value order. The bin equi-join replaces the
    // BroadcastNestedLoopJoin a raw range predicate would plan.
    "q_range_join" -> ((s, d) => {
      val win = 7L * 86400
      // NTZ → epoch seconds: session tz is pinned UTC, so the LTZ hop is
      // the identity mapping DuckDB's epoch_ms uses
      def epochS(c: String) = col(c).cast("timestamp_ltz").cast("long")
      val intervals = Tables.orders(s, d)
        .orderBy(desc("o_totalprice"), asc("o_orderkey")).limit(50)
        .select(col("o_orderkey"), epochS("o_orderdate").as("win_start"),
          (epochS("o_orderdate") + win).as("win_end"))
      val points = Tables.lineitem(s, d)
        .select(epochS("l_shipdate").as("ship_s"), col("l_quantity"))
      RangeJoin.pointInInterval(points, intervals, "ship_s", "win_start", "win_end",
        binWidth = win)
        .groupBy(col("o_orderkey"), col("win_start"))
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
    }),

    // Same audit-window semantics as q_range_join, but the join is
    // written the way a user WOULD write it — a raw range predicate,
    // no manual binning — and the opt-in RangeJoinRewrite optimizer
    // rule performs the equi-ization. Exercises the
    // Rule[LogicalPlan] end-to-end through the oracle gate (the spec
    // additionally asserts the plan carries no nested-loop join).
    // The rule + its bin-width conf are registered on a CHILD session
    // (`newSession()`: own SessionState/optimizer/conf, shared
    // SparkContext and builder options) so the rewrite is scoped to
    // this query's frame — a pure-range join built on the caller's
    // session is untouched (RangeJoinRewriteSpec proves it). The frame
    // stays bound to the child optimizer for its whole lifetime, so
    // laziness is safe; the child state is GC'd with the frame.
    "q_range_join_auto" -> ((outer, d) => {
      import graft.plans.RangeJoinRewrite
      val s = outer.newSession()
      val win = 7L * 86400
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ new RangeJoinRewrite
      s.conf.set(RangeJoinRewrite.binWidthKey, win.toString)
      def epochS(c: String) = col(c).cast("timestamp_ltz").cast("long")
      val intervals = Tables.orders(s, d)
        .orderBy(desc("o_totalprice"), asc("o_orderkey")).limit(50)
        .select(col("o_orderkey"), epochS("o_orderdate").as("win_start"),
          (epochS("o_orderdate") + win).as("win_end"))
      val points = Tables.lineitem(s, d)
        .select(epochS("l_shipdate").as("ship_s"), col("l_quantity"))
      points.join(intervals,
          col("ship_s") >= col("win_start") && col("ship_s") < col("win_end"))
        .groupBy(col("o_orderkey"), col("win_start"))
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
    }),

    // Rolling 1h time-range aggregates per event_type: RANGE frame
    // over epoch seconds (not ROWS — irregular event spacing means a
    // row-count frame is semantically wrong). RANGE includes all peers
    // of the current order value, so ties make it deterministic; sums
    // ride the exact decimal detour. Spark recomputes a sliding frame
    // per row (O(n·frame), no retraction) — keep time-range frames
    // narrow, or decompose wide ones into a bucketed prefix sum (see
    // SCALE.md).
    "q_rolling_window" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("e"))
        .rangeBetween(-3599L, 0L)
      Tables.events(s, d)
        .select(col("event_type"), col("event_id"),
          expr("unix_micros(ts) div 1000000").as("e"), col("value"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h",
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
            .over(w).cast("double"))
    }),

    // Rolling anomaly detection: flag events >2σ from their own 1h
    // trailing window's mean — the streaming-monitor z-test, decided
    // entirely in exact integer arithmetic ((n·q−s)² > 4(n·v−s²) over
    // quantized values; small frames self-gate, a 2-point frame can
    // never fire). Three sliding sums share one window sort.
    "q_rolling_anomaly" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("e"))
        .rangeBetween(-3599L, 0L)
      val dev = col("n_1h") * col("qv") - col("s_1h")
      Tables.events(s, d)
        .select(col("event_type"), col("event_id"),
          expr("unix_micros(ts) div 1000000").as("e"),
          floor(col("value") * 100).cast("long").as("qv"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("s_1h", sum(col("qv")).over(w))
        .withColumn("v_1h", sum(col("qv") * col("qv")).over(w))
        .filter(dev * dev >
          lit(4L) * (col("n_1h") * col("v_1h") - col("s_1h") * col("s_1h")))
        .select(col("event_type"), col("event_id"), col("e"), col("qv"),
          col("n_1h"))
    }),

    // Exact percentiles by rank selection (the shared rankOrdered /
    // rankIdx scaffold — nearest-lower rank, no interpolation;
    // interpolated quantiles are 1-ulp-unstable across engines, rank
    // selection returns an actual data value). One window sort per
    // group, then a pivot-style conditional aggregate.
    // Exact GLOBAL rank over an unbounded key domain (the total corpus
    // order a curriculum/dedup-priority pipeline sorts by): quantile-
    // bucketed parallel sorts + a ≤64-row offset prefix — never one
    // window task over the corpus. Rank values are boundary-independent
    // (sketch error only moves bucket sizes), so the oracle is a plain
    // global row_number. See Ranking.globalRank.
    "q_global_rank" -> ((s, d) =>
      graft.operators.Ranking.globalRank(
        Tables.events(s, d)
          .select(col("event_id"), col("event_type"), col("value")),
        "value", Seq("event_id"))),

    // HIERARCHICAL subtree rollup (the BOM-explosion / org-rollup
    // primitive): users form a binary-heap tree (parent = id div 2,
    // root 1), and every user's event count rolls up into ALL its
    // ancestors. No iteration and no recursion on the Spark side: a
    // bounded-depth hierarchy admits the materialized-ancestor-path
    // form — each row explodes into its ≤⌈log₂ max_id⌉ ancestors via
    // shiftright, then ONE groupBy(ancestor) — the standard trick that
    // turns tree rollups into a single shuffle at any scale. The walk
    // spans k = 0..62: every POSITIVE int64 id reaches the root, so
    // there is no silent depth cap (ancestors shorter than 63 levels
    // just shift to 0 and drop at the ≥ 1 filter). Output per node:
    // own events, subtree events, subtree node count.
    "q_subtree_rollup" -> ((s, d) => {
      val own = Tables.events(s, d).filter(col("user_id") >= 1)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_own"))
      val contrib = own
        .select(col("user_id"), col("n_own"),
          explode(expr(
            "transform(sequence(0, 62), k -> shiftright(user_id, k))"))
            .as("anc"))
        .filter(col("anc") >= 1)
      contrib.groupBy(col("anc").as("user_id"))
        .agg(sum(col("n_own")).as("n_subtree"),
          count(lit(1)).as("n_subtree_nodes"),
          max(when(col("anc") === col("user_id"), col("n_own")))
            .as("n_own"))
        .select(col("user_id"), coalesce(col("n_own"), lit(0L)).as("n_own"),
          col("n_subtree"), col("n_subtree_nodes"))
    }),

    "q_percentile_rank" -> ((s, d) =>
      rankOrdered(Tables.events(s, d)
          .select(col("event_type"), col("event_id"), col("value")),
          "event_type", "value", "event_id")
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n_events"),
          max(when(col("rn") === rankIdx(50), col("value"))).as("p50"),
          max(when(col("rn") === rankIdx(90), col("value"))).as("p90"),
          max(when(col("rn") === rankIdx(99), col("value"))).as("p99"))),

    // Association-rule mining over co-ordered parts (market basket):
    // for every part pair appearing together in ≥ 2 distinct orders,
    // its support count, both directional confidences (bp) and lift
    // (milli-units). The pair-generation self-join is keyed by order
    // (the exchange is planned once and reused for both sides), the
    // support filter keeps the rule table sparse before the per-part
    // count joins, and the 1-row basket total rides a broadcast — at
    // 100 TB every shuffle stays ∝ its input (orders, pairs, parts)
    // and nothing is quadratic in the part domain. Lift's cross-
    // multiplied numerator (n_ab·N·1000) runs in DECIMAL(38,0) so the
    // arithmetic is exact past the int64 bound (N ~ 1e10 baskets ×
    // n_ab would overflow a long); `div` lands it back in BIGINT.
    // Integer fixed-point throughout — engine-exact.
    "q_market_basket" -> ((s, d) => {
      // deliberately NOT persisted: a persist was measured SLOWER here
      // (2.4 vs 1.8 s at sf0.1) — the self-join sides share one
      // exchange via ReuseExchange and the two small aggregates (N,
      // per-part) ride cheap scans; caching 1.2M rows cost more than
      // the rescans. At a scale where the distinct dominates, persist
      // `so` with the CacheScope scoped-release pattern.
      // r15: one hash(ok) exchange serves the distinct (subset rule),
      // both self-join sides (ReuseExchange + satisfied join
      // distribution) AND lifts the partial distinct out of the
      // single-split lineitem scan task — same shape as
      // GraphQueries.coPurchaseEdges.
      val so = graft.operators.spreadByKey(
          Tables.lineitem(s, d)
            .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")),
          col("ok"))
        .distinct()
      val n = so.agg(count_distinct(col("ok")).as("N"))
      val per = so.groupBy(col("pk")).agg(count(lit(1)).as("n_i"))
      so.as("a")
        .join(so.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 2)
        .join(per.select(col("pk").as("u"), col("n_i").as("n_u")), Seq("u"))
        .join(per.select(col("pk").as("v"), col("n_i").as("n_v")), Seq("v"))
        .crossJoin(broadcast(n))
        .select(col("u"), col("v"), col("n_ab"), col("n_u"), col("n_v"),
          expr("n_ab * 10000 div n_u").as("conf_uv_bp"),
          expr("n_ab * 10000 div n_v").as("conf_vu_bp"),
          expr("(cast(n_ab as decimal(38,0)) * N * 1000) div " +
            "(cast(n_u as decimal(38,0)) * n_v)").as("lift_m"))
    })
  )

  private val pivotCountCols = priorities
    .map { case (v, a) => s"""COUNT(*) FILTER (o_orderpriority = '$v') AS $a""" }
    .mkString(",\n  ")

  val oracles: Map[String, String] = Map(
    "q_cube" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${sqlLsum("l_quantity")} AS sum_qty,
         |  MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price
         |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,

    "q_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${sqlLsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "q_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
         |  COUNT(*) AS n, ${sqlLsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin,

    "q_pivot" ->
      s"""SELECT o_orderstatus,
         |  $pivotCountCols
         |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q_unpivot" ->
      s"""WITH m AS (
         |  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
         |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
         |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
         |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
         |)
         |SELECT measure, COUNT(*) AS n, MIN(value) AS lo, MAX(value) AS hi,
         |  ${sqlLsum("value")} AS total
         |FROM m GROUP BY measure""".stripMargin,

    "q_window_suite" ->
      """SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_quantity,
        |  row_number() OVER det AS rn,
        |  rank() OVER ties AS rnk,
        |  dense_rank() OVER ties AS drnk,
        |  lag(l_quantity, 1) OVER det AS prev_qty,
        |  lead(l_quantity, 1) OVER det AS next_qty,
        |  ntile(4) OVER det AS quartile,
        |  cume_dist() OVER ties AS cd,
        |  percent_rank() OVER ties AS pr
        |FROM lineitem
        |WINDOW
        |  det AS (PARTITION BY l_suppkey
        |          ORDER BY l_quantity DESC, l_orderkey ASC, l_linenumber ASC),
        |  ties AS (PARTITION BY l_suppkey ORDER BY l_quantity DESC)""".stripMargin,

    "q_range_join" ->
      """WITH top50 AS (
        |  SELECT o_orderkey, epoch_ms(o_orderdate) // 1000 AS win_start,
        |    epoch_ms(o_orderdate) // 1000 + 604800 AS win_end
        |  FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50
        |)
        |SELECT t.o_orderkey, t.win_start, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM top50 t JOIN lineitem l
        |  ON epoch_ms(l.l_shipdate) // 1000 >= t.win_start
        | AND epoch_ms(l.l_shipdate) // 1000 < t.win_end
        |GROUP BY t.o_orderkey, t.win_start""".stripMargin,

    // identical result contract to q_range_join — the Spark sides differ
    // only in WHO does the binning (operator vs optimizer rule)
    "q_range_join_auto" ->
      """WITH top50 AS (
        |  SELECT o_orderkey, epoch_ms(o_orderdate) // 1000 AS win_start,
        |    epoch_ms(o_orderdate) // 1000 + 604800 AS win_end
        |  FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50
        |)
        |SELECT t.o_orderkey, t.win_start, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM top50 t JOIN lineitem l
        |  ON epoch_ms(l.l_shipdate) // 1000 >= t.win_start
        | AND epoch_ms(l.l_shipdate) // 1000 < t.win_end
        |GROUP BY t.o_orderkey, t.win_start""".stripMargin,

    "q_rolling_window" ->
      """SELECT event_type, event_id, epoch_us(ts) // 1000000 AS e, value,
        |  COUNT(*) OVER w AS n_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts) // 1000000
        |             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_rolling_anomaly" ->
      """WITH q AS (
        |  SELECT event_type, event_id, epoch_us(ts) // 1000000 AS e,
        |    CAST(floor(value * 100) AS BIGINT) AS qv
        |  FROM events
        |), r AS (
        |  SELECT event_type, event_id, e, qv,
        |    COUNT(*) OVER w AS n_1h,
        |    CAST(SUM(qv) OVER w AS BIGINT) AS s_1h,
        |    CAST(SUM(qv * qv) OVER w AS BIGINT) AS v_1h
        |  FROM q
        |  WINDOW w AS (PARTITION BY event_type ORDER BY e
        |               RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, event_id, e, qv, n_1h FROM r
        |WHERE (n_1h * qv - s_1h) * (n_1h * qv - s_1h)
        |      > 4 * (n_1h * v_1h - s_1h * s_1h)""".stripMargin,

    // Same ancestor-path explode: every node's count lands on each
    // of its shiftright ancestors, one GROUP BY.
    "q_subtree_rollup" ->
      """WITH own AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_own
        |  FROM events WHERE user_id >= 1 GROUP BY user_id
        |), c AS (
        |  SELECT own.user_id AS uid, own.n_own, (own.user_id >> t.k) AS anc
        |  FROM own, generate_series(0, 62) AS t(k)
        |  WHERE (own.user_id >> t.k) >= 1
        |)
        |SELECT anc AS user_id,
        |  CAST(COALESCE(MAX(CASE WHEN anc = uid THEN n_own END), 0)
        |    AS BIGINT) AS n_own,
        |  CAST(SUM(n_own) AS BIGINT) AS n_subtree,
        |  CAST(COUNT(*) AS BIGINT) AS n_subtree_nodes
        |FROM c GROUP BY anc""".stripMargin,

    "q_global_rank" ->
      """SELECT event_id, event_type, value,
        |  row_number() OVER (ORDER BY value ASC, event_id ASC) AS global_rank
        |FROM events""".stripMargin,

    "q_percentile_rank" ->
      s"""WITH r AS (
         |  SELECT event_type, value,
         |    row_number() OVER (PARTITION BY event_type
         |                       ORDER BY value ASC, event_id ASC) AS rn,
         |    COUNT(*) OVER (PARTITION BY event_type) AS n
         |  FROM events
         |)
         |SELECT event_type, MAX(n) AS n_events,
         |  MAX(CASE WHEN rn = ${sqlRankIdx(50)} THEN value END) AS p50,
         |  MAX(CASE WHEN rn = ${sqlRankIdx(90)} THEN value END) AS p90,
         |  MAX(CASE WHEN rn = ${sqlRankIdx(99)} THEN value END) AS p99
         |FROM r GROUP BY event_type""".stripMargin,

    // HUGEINT mirrors the Spark side's DECIMAL(38,0) lift numerator.
    "q_market_basket" ->
      """WITH so AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), tot AS (
        |  SELECT CAST(COUNT(DISTINCT ok) AS HUGEINT) AS N FROM so
        |), per AS (
        |  SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_i FROM so GROUP BY pk
        |), pairs AS (
        |  SELECT a.pk AS u, b.pk AS v, CAST(COUNT(*) AS BIGINT) AS n_ab
        |  FROM so a JOIN so b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |)
        |SELECT u, v, n_ab, pu.n_i AS n_u, pv.n_i AS n_v,
        |  n_ab * 10000 // pu.n_i AS conf_uv_bp,
        |  n_ab * 10000 // pv.n_i AS conf_vu_bp,
        |  CAST((CAST(n_ab AS HUGEINT) * N * 1000)
        |       // (CAST(pu.n_i AS HUGEINT) * pv.n_i) AS BIGINT) AS lift_m
        |FROM pairs
        |JOIN per pu ON pairs.u = pu.pk
        |JOIN per pv ON pairs.v = pv.pk
        |CROSS JOIN tot""".stripMargin
  )
}
