package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Relational breadth over the TPC-H-ish fixture tables: scan, pushdown
  * filter, multi-way join, partial+final aggregation, sort/limit top-k,
  * distinct. These exercise the reference's batch query spine
  * (SURVEY.md §2.1 S2, J1, A2/A3, P4-P7) at generic-table breadth.
  *
  * Scale notes: every filter/projection here reaches the parquet scan
  * (verified via explain PushedFilters/ReadSchema); small dimension sides
  * are broadcast explicitly so the only shuffles left are the fact-table
  * aggregations; top-k is TakeOrderedAndProject (no global sort).
  */
object TpchQueries {

  val queries: Map[String, Q] = Map(
    // TPC-H Q1 shape: the reference's partial+final agg pattern (A2) at
    // fact-table scale. One shuffle on the 6-value group key. The 7
    // numeric aggregates use lsum/lavg (long micro-units) — with dsum
    // the decimal(28,6) sum buffers drop the whole aggregate out of
    // unsafe long arithmetic and this query was 2.46 s instead of
    // ~0.6 s at sf0.1 (measured; see the package-object doc).
    "q1_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          lsum(col("l_quantity")).as("sum_qty"),
          lsum(col("l_extendedprice")).as("sum_base_price"),
          lsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          lsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          lavg(col("l_quantity")).as("avg_qty"),
          lavg(col("l_extendedprice")).as("avg_price"),
          lavg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // TPC-H Q6 shape: pure pushdown-filter + single global agg — the
    // plan should be scan(PushedFilters)→partial agg→single exchange.
    "q6_filter_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // Row-level filtered projection: proves predicate pushdown + column
    // pruning produce the exact surviving row set (S2/P4/P5/F2).
    "q_filter_project" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
          col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_shipdate"))
    }),

    // TPC-H Q3 shape: broadcast dim join ×2 + agg + top-k. Sort is
    // TakeOrderedAndProject (limit pushed into partial sorts, no global
    // shuffle-sort); tiebreak on key for determinism.
    "q3_topk" -> ((s, d) => {
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(desc("revenue"), asc("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: 6-way join. region/nation/supplier are broadcast
    // (dims); the fact chain shuffles once per fact join under AQE.
    "q5_join" -> ((s, d) => {
      val region = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val nation = Tables.nation(s, d)
      val cust = Tables.customer(s, d)
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = Tables.lineitem(s, d)
      val supp = Tables.supplier(s, d)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    }),

    // Distinct over a projected pair (SURVEY §2.3 E1 exact-dedup core op).
    "q_distinct" -> ((s, d) =>
      Tables.events(s, d).select(col("event_type"), col("user_id")).distinct()),

    // As-of (point-in-time) join: every event picks up the value of the
    // user's most recent signup event at-or-before its timestamp.
    // Oracle: DuckDB's native ASOF LEFT JOIN.
    "q_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val probes = ev.select(col("event_id"), col("ts"), col("user_id"), col("value"))
      val states = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("value").as("sval"))
      graft.operators.AsOfJoin.asOf(probes, states, Seq("user_id"), "ts", Seq("sval"))
        .withColumnRenamed("asof_sval", "asof_value")
    }),

    // The as-of join again, through the custom PHYSICAL operator
    // (AsOfJoinPlan -> AsOfJoinStrategy -> AsOfJoinExec sorted-merge):
    // every event picks up the user's most recent purchase amount
    // at-or-before its timestamp, INNER form (unmatched probes drop) to
    // cover the path q_asof_join's outer composition doesn't. States
    // are pre-aggregated to unique (user_id, ts) so the at-ts tie-break
    // is deterministic in both engines.
    // Oracle: DuckDB's native ASOF JOIN.
    "q_asof_exec" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val probes = ev.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"))
      val states = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("pval"))
      graft.operators.AsOfJoin.asOfExec(probes, states, Seq("user_id"), "ts",
          Seq("pval"), inner = true)
        .withColumnRenamed("asof_pval", "asof_purchase")
    }),

    // merge_asof direction='nearest': closest purchase in EITHER time
    // direction per event, ties backward — two sorted-merge as-of
    // passes through the custom physical operator + an integer CASE
    // pick. Completes the merge_asof direction surface (backward =
    // q_asof_exec, forward = q_asof_forward).
    "q_asof_nearest" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val probes = ev.select(col("event_id"), col("ts"), col("user_id"))
      val states = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("pval"))
      graft.operators.AsOfJoin.asOfNearest(probes, states, Seq("user_id"),
        "ts", Seq("pval"))
        .select(col("event_id"), col("user_id"),
          col("asof_pval").as("nearest_pval"),
          col("asof_delta_us").as("delta_us"))
    }),

    // The custom as-of operator from PLAIN SQL TEXT: the asof_join
    // TABLE FUNCTION (plans.AsOfSqlFunction, injectTableFunction /
    // runtime registry) resolves the view names, builds the identical
    // AsOfJoinPlan subtree, and the enclosing SQL projects it — SQL
    // text, Column API, and oracle all drive one physical operator.
    // States: latest 'view' event value at-or-before each event, inner.
    "q_asof_sql" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.select(col("event_id"), col("ts"), col("user_id"))
        .createOrReplaceTempView("asof_probes_v")
      ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("vval"))
        .createOrReplaceTempView("asof_states_v")
      graft.plans.AsOfSqlFunction.register(s)
      s.sql("""SELECT event_id, ts, user_id, asof_vval AS last_view
              |FROM asof_join('asof_probes_v', 'asof_states_v',
              |               'user_id', 'ts', 'vval', true)""".stripMargin)
    }),

    // FORWARD as-of with a tolerance bound, through the same physical
    // operator: each event finds the user's NEXT error event at-or-after
    // its timestamp, but only within one hour (pandas merge_asof
    // tolerance semantics; for the inner form, tolerance == post-filter,
    // which is exactly what the DuckDB oracle expresses).
    "q_asof_forward" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val probes = ev.select(col("event_id"), col("ts"), col("user_id"))
      val states = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("nerr"))
      graft.operators.AsOfJoin.asOfExec(probes, states, Seq("user_id"), "ts",
          Seq("nerr"), inner = true, forward = true,
          tolerance = Some(3600L * 1000000L))
        .withColumnRenamed("asof_nerr", "next_err")
    }),

    // Semi/anti joins (EXISTS / NOT EXISTS): customers partitioned by
    // whether they have any urgent order. Broadcast the filtered orders.
    "q_semi_anti" -> ((s, d) => {
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val cust = Tables.customer(s, d)
      val withU = cust.join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(lit("has_urgent").as("bucket"), col("c_custkey"))
      val withoutU = cust.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(lit("no_urgent").as("bucket"), col("c_custkey"))
      withU.unionByName(withoutU)
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_customers"))
    }),

    // TPC-H Q13 shape — distribution of per-customer order counts
    // INCLUDING zero-order customers: left join (with the status filter
    // in the join condition, the fixture's stand-in for Q13's comment
    // predicate), per-customer count of MATCHED rows only (count(col)
    // vs count(*) null semantics), then the histogram of those counts.
    "q_count_distribution" -> ((s, d) => {
      val orders = Tables.orders(s, d)
        .filter(col("o_orderstatus") =!= "F")
        .select(col("o_custkey"), col("o_orderkey"))
      Tables.customer(s, d).select(col("c_custkey"))
        .join(orders, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // Left outer join with null-extension accounting.
    "q_left_join" -> ((s, d) => {
      val bigOrders = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
        .select(col("o_custkey"), col("o_totalprice"))
      Tables.customer(s, d)
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("o_totalprice")).as("n_matched"),
          dsum(coalesce(col("o_totalprice"), lit(0.0))).as("matched_total"))
    }),

    // Full outer join completing the join-type family: per-nation
    // customer vs supplier presence, null-extended on BOTH sides, with
    // a which-side classification (the CASE runs on post-join nulls).
    "q_full_outer" -> ((s, d) => {
      val cust = Tables.customer(s, d).groupBy(col("c_nationkey").as("ck"))
        .agg(count(lit(1)).as("n_cust"))
      val supp = Tables.supplier(s, d).groupBy(col("s_nationkey").as("sk"))
        .agg(count(lit(1)).as("n_supp"))
      cust.join(supp, col("ck") === col("sk"), "full_outer")
        .select(
          coalesce(col("ck"), col("sk")).cast("long").as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
          when(col("ck").isNotNull && col("sk").isNotNull, "both")
            .when(col("ck").isNotNull, "customers_only")
            .otherwise("suppliers_only").as("presence"))
    }),

    // Analytic window function with a running frame (ordered prefix sum
    // — deterministic because the frame order is total per partition).
    "q_running_sum" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("user_id") < 10)
        .select(col("user_id"), col("event_id"), col("value"))
        .withColumn("running_value",
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
            .over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("user_id")).orderBy(col("event_id"))
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
            .cast("double"))),

    // Set operations: event types seen in the first week vs the rest.
    "q_set_ops" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val early = ev.filter(col("ts") < lit("2024-01-08").cast("timestamp"))
        .select(col("event_type"), col("user_id"))
      val late = ev.filter(col("ts") >= lit("2024-01-08").cast("timestamp"))
        .select(col("event_type"), col("user_id"))
      val both = early.intersect(late).select(lit("both").as("which"),
        col("event_type"), col("user_id"))
      val earlyOnly = early.except(late).select(lit("early_only").as("which"),
        col("event_type"), col("user_id"))
      both.unionByName(earlyOnly)
    }),

    // Skew-safe two-phase aggregation: values must equal the plain
    // group-by (the oracle is the UNSALTED query — equality proves the
    // salting is semantically invisible).
    "q_salted_agg" -> ((s, d) =>
      graft.operators.Skew.saltedSumCount(
        Tables.events(s, d), Seq("event_type"), "value",
        col("event_id"), buckets = 32)),

    // Salted JOIN under a manufactured hot key: 60% of events collapse
    // onto customer 1, then join to the customer dim — Skew.saltedJoin
    // spreads the hot key over 32 reducers (AQE splits partitions, not
    // keys; a single mega-key needs the salt). The oracle is the plain
    // unsalted join: salting must be semantically invisible.
    // The skew DIAGNOSTIC the two salted queries act on: one row of
    // hot-key statistics for events.user_id — per-key count shuffle
    // (map-side combined, bytes ∝ |keys|), then a |keys|-row window +
    // roll-up. All-integer permille ratios; see Skew.keyProfile.
    "q_key_skew" -> ((s, d) =>
      graft.operators.Skew.keyProfile(Tables.events(s, d), "user_id")),

    "q_salted_join" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        when(col("event_id") % 10 < 6, lit(1L))
          .otherwise(col("user_id")).as("c_custkey"),
        col("event_id"), col("value"))
      graft.operators.Skew.saltedJoin(
        ev,
        Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
        "c_custkey", col("event_id"), buckets = 32)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rows"), lsum(col("value")).as("sum_value"))
    }),

    // TPC-H Q17 shape — correlated SCALAR subquery: small-quantity
    // lineitems of one brand, "small" defined per part by a subquery
    // over that part's own lineitems. Written as SQL text so Catalyst's
    // actual subquery planning runs (RewriteCorrelatedScalarSubquery →
    // per-part aggregate + join), not a hand-decorrelated DataFrame.
    // The threshold is decimal-sum / count / 5.0 — the same IEEE
    // operation sequence in both engines (see [[dsum]]), so the
    // comparison predicate is bit-deterministic.
    "q_scalar_subquery" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("graft_sq_lineitem")
      Tables.part(s, d).createOrReplaceTempView("graft_sq_part")
      s.sql(
        s"""SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
           |         AS avg_yearly,
           |       COUNT(*) AS n_rows
           |FROM graft_sq_lineitem l JOIN graft_sq_part p ON p.p_partkey = l.l_partkey
           |WHERE p.p_brand = 'Brand#12'
           |  AND l.l_quantity < (
           |    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
           |             / COUNT(*) / 5.0
           |    FROM graft_sq_lineitem l2 WHERE l2.l_partkey = p.p_partkey)""".stripMargin)
    }),

    // TPC-H Q4 shape — correlated EXISTS: orders in a window having at
    // least one returned line. Catalyst's RewritePredicateSubquery turns
    // the EXISTS into a left-semi join on l_orderkey (the scale-safe
    // plan: one semi-join shuffle, no per-order probe).
    "q_exists_subquery" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("graft_sq_lineitem")
      Tables.orders(s, d).createOrReplaceTempView("graft_sq_orders")
      s.sql(
        """SELECT o.o_orderpriority, COUNT(*) AS n_orders
          |FROM graft_sq_orders o
          |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
          |  AND EXISTS (SELECT 1 FROM graft_sq_lineitem l
          |              WHERE l.l_orderkey = o.o_orderkey
          |                AND l.l_returnflag = 'R')
          |GROUP BY o.o_orderpriority""".stripMargin)
    }),

    // Global stats (A5 analog): count / exact count-distinct / min / max.
    "q_agg_stats" -> ((s, d) =>
      Tables.events(s, d).agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        davg(col("value")).as("avg_value")))
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlLsum("l_quantity")} AS sum_qty,
         |  ${sqlLsum("l_extendedprice")} AS sum_base_price,
         |  ${sqlLsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${sqlLsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         |  ${sqlLavg("l_quantity")} AS avg_qty,
         |  ${sqlLavg("l_extendedprice")} AS avg_price,
         |  ${sqlLavg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2001-09-02'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q6_filter_agg" ->
      s"""SELECT ${sqlDsum("l_extendedprice * l_discount")} AS revenue,
         |  COUNT(*) AS n_rows
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND l_discount >= 0.05 AND l_discount <= 0.07
         |  AND l_quantity < 24""".stripMargin,

    "q_filter_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_quantity, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_quantity >= 45""".stripMargin,

    "q3_topk" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey ASC
         |LIMIT 10""".stripMargin,

    "q5_join" ->
      s"""SELECT n_name,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name""".stripMargin,

    "q_distinct" ->
      "SELECT DISTINCT event_type, user_id FROM events",

    "q_salted_agg" ->
      s"""SELECT event_type, COUNT(*) AS n_rows,
         |  ${sqlDsum("value")} AS sum_value
         |FROM events GROUP BY event_type""".stripMargin,

    "q_key_skew" ->
      """WITH c AS (SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS n
        |           FROM events GROUP BY user_id),
        |r AS (SELECT k, n,
        |        row_number() OVER (ORDER BY n DESC, k ASC) AS rn FROM c)
        |SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  MIN(CASE WHEN rn = 1 THEN k END) AS hot_key,
        |  CAST(MIN(CASE WHEN rn = 1 THEN n END) AS BIGINT) AS hot_rows,
        |  CAST(SUM(CASE WHEN rn <= 10 THEN n ELSE 0 END) AS BIGINT) AS top_rows,
        |  CAST(MIN(CASE WHEN rn = 1 THEN n END) * 1000 // SUM(n) AS BIGINT)
        |    AS hot_share_permille,
        |  CAST(SUM(CASE WHEN rn <= 10 THEN n ELSE 0 END) * 1000 // SUM(n) AS BIGINT)
        |    AS top_share_permille,
        |  CAST(MIN(CASE WHEN rn = 1 THEN n END) * COUNT(*) * 1000 // SUM(n) AS BIGINT)
        |    AS skew_ratio_permille
        |FROM r""".stripMargin,

    "q_salted_join" ->
      s"""WITH ev AS (SELECT CASE WHEN event_id % 10 < 6 THEN 1
         |                        ELSE user_id END AS c_custkey,
         |                   value
         |            FROM events)
         |SELECT c.c_mktsegment, COUNT(*) AS n_rows,
         |  ${sqlLsum("ev.value")} AS sum_value
         |FROM ev JOIN customer c USING (c_custkey)
         |GROUP BY c.c_mktsegment""".stripMargin,

    "q_asof_join" ->
      """WITH probes AS (SELECT event_id, ts, user_id, value FROM events),
        |states AS (SELECT user_id, ts, value AS sval FROM events
        |           WHERE event_type = 'signup')
        |SELECT p.event_id, p.ts, p.user_id, p.value, s.sval AS asof_value
        |FROM probes p ASOF LEFT JOIN states s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts""".stripMargin,

    "q_asof_exec" ->
      """WITH probes AS (SELECT event_id, ts, user_id, event_type FROM events),
        |states AS (SELECT user_id, ts, max(value) AS pval FROM events
        |           WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT p.event_id, p.ts, p.user_id, p.event_type,
        |  s.pval AS asof_purchase
        |FROM probes p ASOF JOIN states s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts""".stripMargin,

    // Two native ASOF LEFT JOINs (backward, forward) joined on the
    // unique probe id, then the same tie-backward integer pick.
    "q_asof_nearest" ->
      """WITH probes AS (SELECT event_id, ts, user_id FROM events),
        |states AS (SELECT user_id, ts, max(value) AS pval FROM events
        |           WHERE event_type = 'purchase' GROUP BY 1, 2),
        |b AS (
        |  SELECT p.event_id, p.ts, p.user_id, s.pval AS bp, s.ts AS bts
        |  FROM probes p ASOF LEFT JOIN states s
        |    ON p.user_id = s.user_id AND p.ts >= s.ts
        |), f AS (
        |  SELECT p.event_id, s.pval AS fp, s.ts AS fts
        |  FROM probes p ASOF LEFT JOIN states s
        |    ON p.user_id = s.user_id AND p.ts <= s.ts
        |), j AS (
        |  SELECT b.event_id, b.ts, b.user_id, b.bp, b.bts, f.fp, f.fts,
        |    epoch_us(b.ts) - epoch_us(b.bts) AS db,
        |    epoch_us(f.fts) - epoch_us(b.ts) AS df,
        |    (f.fts IS NULL OR (b.bts IS NOT NULL AND
        |      epoch_us(b.ts) - epoch_us(b.bts)
        |        <= epoch_us(f.fts) - epoch_us(b.ts))) AS use_b
        |  FROM b JOIN f USING (event_id)
        |)
        |SELECT event_id, user_id,
        |  CASE WHEN use_b THEN bp ELSE fp END AS nearest_pval,
        |  CAST(CASE WHEN use_b THEN db ELSE df END AS BIGINT) AS delta_us
        |FROM j""".stripMargin,

    "q_asof_sql" ->
      """WITH probes AS (SELECT event_id, ts, user_id FROM events),
        |states AS (SELECT user_id, ts, max(value) AS vval FROM events
        |           WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT p.event_id, p.ts, p.user_id, s.vval AS last_view
        |FROM probes p ASOF JOIN states s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts""".stripMargin,

    "q_asof_forward" ->
      """WITH probes AS (SELECT event_id, ts, user_id FROM events),
        |states AS (SELECT user_id, ts, max(value) AS nerr FROM events
        |           WHERE event_type = 'error' GROUP BY 1, 2)
        |SELECT p.event_id, p.ts, p.user_id, s.nerr AS next_err
        |FROM probes p ASOF JOIN states s
        |  ON p.user_id = s.user_id AND p.ts <= s.ts
        |WHERE epoch_us(s.ts) - epoch_us(p.ts) <= 3600000000""".stripMargin,

    "q_semi_anti" ->
      """WITH u AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT 'has_urgent' AS bucket, COUNT(*) AS n_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM u WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'no_urgent', COUNT(*) FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM u WHERE o_custkey = c_custkey)""".stripMargin,

    "q_count_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |      FROM customer LEFT JOIN orders
        |        ON c_custkey = o_custkey
        |           AND o_orderstatus <> 'F'
        |      GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,

    "q_left_join" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n_rows,
         |  COUNT(o_totalprice) AS n_matched,
         |  ${sqlDsum("COALESCE(o_totalprice, 0.0)")} AS matched_total
         |FROM customer
         |LEFT JOIN (SELECT o_custkey, o_totalprice FROM orders
         |           WHERE o_totalprice > 400000) o
         |  ON c_custkey = o_custkey
         |GROUP BY c_mktsegment""".stripMargin,

    "q_full_outer" ->
      """WITH c AS (SELECT c_nationkey AS ck, COUNT(*) AS n_cust
        |           FROM customer GROUP BY c_nationkey),
        |s AS (SELECT s_nationkey AS sk, COUNT(*) AS n_supp
        |      FROM supplier GROUP BY s_nationkey)
        |SELECT CAST(coalesce(ck, sk) AS BIGINT) AS nationkey,
        |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp,
        |  CASE WHEN ck IS NOT NULL AND sk IS NOT NULL THEN 'both'
        |       WHEN ck IS NOT NULL THEN 'customers_only'
        |       ELSE 'suppliers_only' END AS presence
        |FROM c FULL OUTER JOIN s ON ck = sk""".stripMargin,

    "q_running_sum" ->
      """SELECT user_id, event_id, value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6)))
        |    OVER (PARTITION BY user_id ORDER BY event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_value
        |FROM events WHERE user_id < 10""".stripMargin,

    "q_set_ops" ->
      """WITH e AS (SELECT event_type, user_id FROM events
        |           WHERE ts < TIMESTAMP '2024-01-08'),
        |l AS (SELECT event_type, user_id FROM events
        |      WHERE ts >= TIMESTAMP '2024-01-08')
        |SELECT 'both' AS which, event_type, user_id FROM (SELECT * FROM e INTERSECT SELECT * FROM l)
        |UNION ALL
        |SELECT 'early_only', event_type, user_id FROM (SELECT * FROM e EXCEPT SELECT * FROM l)""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
        |         AS avg_yearly,
        |       COUNT(*) AS n_rows
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand = 'Brand#12'
        |  AND l.l_quantity < (
        |    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
        |             / COUNT(*) / 5.0
        |    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)""".stripMargin,

    "q_exists_subquery" ->
      """SELECT o.o_orderpriority, COUNT(*) AS n_orders
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_returnflag = 'R')
        |GROUP BY o.o_orderpriority""".stripMargin,

    "q_agg_stats" ->
      s"""SELECT COUNT(*) AS n_events,
         |  COUNT(DISTINCT user_id) AS n_users,
         |  MIN(value) AS min_value,
         |  MAX(value) AS max_value,
         |  ${sqlDavg("value")} AS avg_value
         |FROM events""".stripMargin
  )
}
