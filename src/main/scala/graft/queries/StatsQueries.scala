package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Ranking, TimeSeries}

/** Statistical-modeling primitives over the fact tables, all
  * integer-exact so the DuckDB oracle matches bit-for-bit: a
  * decile-lift (gains) table, co-occurrence lift (the exact-ratio core
  * of PMI), and per-key closed-form OLS trend fitting. These are the
  * model-evaluation / feature-analysis steps a training-data pipeline
  * runs after curation — which examples are worth labeling first, which
  * features co-vary, which metric streams are drifting.
  *
  * Determinism pattern shared by all three: every rate/slope is a
  * floor-divided integer in fixed-point units (ppm / basis points /
  * milli-units), computed as `sign(num)·(|num| div den)` so Spark's
  * truncating `div` and DuckDB's `//` agree regardless of either
  * engine's negative-division convention.
  */
object StatsQueries {

  /** Truncation-toward-zero integer division that is engine-agnostic on
    * negative numerators: both operands of the inner `div` are
    * non-negative, so Spark `div` and DuckDB `//` agree by construction.
    */
  private def signDiv(num: String, den: String): String =
    s"CASE WHEN $num >= 0 THEN ($num) div ($den) ELSE -((-($num)) div ($den)) END"

  /** DuckDB mirror of [[signDiv]]. */
  private def sqlSignDiv(num: String, den: String): String =
    s"CASE WHEN $num >= 0 THEN ($num) // ($den) ELSE -((-($num)) // ($den)) END"

  private val base: Map[String, Q] = Map(
    // Gains/lift table: orders ranked by (bucketed) price into exact
    // global deciles, per-decile finalized-order rate and its lift over
    // the base rate, in ppm / basis points. The ranking rides
    // Ranking.globalNtile (per-key counts + serial prefix over the
    // ~500-key bucket domain only — no single-partition window over the
    // fact table); the decile definition is deterministic because the
    // (bucket, orderkey) order is total. Integer bound: n_pos·N·10⁴
    // fits int64 up to ~10⁹ orders; past that, widen to DECIMAL(38,0).
    "q_decile_lift" -> ((s, d) => {
      val r = Tables.orders(s, d).select(
        col("o_orderkey"),
        (-floor(col("o_totalprice") / 1000)).cast("long").as("nb"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("pos"))
      val g = Ranking.globalNtile(r, "nb", "o_orderkey", 10)
        .groupBy(col("tier").as("decile"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"))
      val tot = g.agg(sum(col("n")).as("nn"), sum(col("n_pos")).as("np"))
      g.crossJoin(broadcast(tot)).select(
        col("decile"), col("n"), col("n_pos"),
        expr("n_pos * 1000000 div n").as("pos_rate_ppm"),
        expr("(n_pos * nn * 10000) div (n * np)").as("lift_bp"))
    }),

    // Co-occurrence lift between event type and hour-of-day: the exact
    // rational inside PMI — n_xy·N / (n_x·n_y) in ppm — without the
    // cross-engine log hazard. ONE shuffle over the fact table (the
    // (x,y) count); marginals and the total are derived from that
    // |x|·24-row aggregate, never from a second base scan, and join
    // back by broadcast. lift_ppm > 10⁶ means attraction, < 10⁶
    // repulsion. Bound: n_xy·N·10⁶ fits int64 to ~3·10⁶ events; widen
    // to DECIMAL(38,0) past that.
    "q_pmi_lift" -> ((s, d) => {
      val base = Tables.events(s, d).select(
        col("event_type").as("x"),
        expr("(unix_micros(ts) div 3600000000) % 24").as("y"))
      val xy = base.groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_xy"))
      val mx = xy.groupBy(col("x")).agg(sum(col("n_xy")).as("n_x"))
      val my = xy.groupBy(col("y")).agg(sum(col("n_xy")).as("n_y"))
      val tot = xy.agg(sum(col("n_xy")).as("nn"))
      xy.join(broadcast(mx), Seq("x")).join(broadcast(my), Seq("y"))
        .crossJoin(broadcast(tot))
        .select(col("x"), col("y"), col("n_xy"), col("n_x"), col("n_y"),
          expr("n_xy * nn * 1000000 div (n_x * n_y)").as("lift_ppm"))
    }),

    // Per-key trend detection: closed-form OLS slope of each event
    // type's DAILY MEAN value against the day index. Two shuffles, both
    // shrinking: (type, day) daily aggregate (≤ keys·31 rows), then the
    // per-type sufficient statistics (n, Σx, Σy, Σxy, Σx²) — the slope
    // is pure arithmetic on 5 longs, so a 100 TB metric stream costs
    // one map-side-combinable aggregate, no window over the facts.
    // Day re-basing (x = day − min(day)) keeps every product within
    // int64 (x ≤ span, y ≤ 560·10⁶ micro-units). den = 0 (single
    // active day) yields a null slope, both engines.
    "q_ols_trend" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 1e6).cast("long").as("vu"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"), sum(col("vu")).as("sq"))
        .select(col("event_type"), col("day"),
          expr(signDiv("sq", "cnt")).as("vq"))
      val w = Window.partitionBy(col("event_type"))
      val xs = daily.withColumn("x", col("day") - min(col("day")).over(w))
      xs.groupBy(col("event_type")).agg(
          count(lit(1)).as("n_days"),
          sum(col("x")).as("sx"), sum(col("vq")).as("sy"),
          sum(col("x") * col("vq")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .withColumn("num", expr("n_days * sxy - sx * sy"))
        .withColumn("den", expr("n_days * sxx - sx * sx"))
        .select(col("event_type"), col("n_days"),
          expr(signDiv("sy", "n_days")).as("mean_micro"),
          when(col("den") === 0, lit(null).cast("long"))
            .otherwise(expr(signDiv("num", "den")))
            .as("slope_micro_per_day"))
    })
  )

  /** Shared daily-mean frame: (event_type, day, vq) with vq the
    * sign-safe integer mean of the day's micro-unit values. The
    * one-shuffle reduction every per-key series query here starts from.
    */
  private def dailyMeans(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 1e6).cast("long").as("vu"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"), sum(col("vu")).as("sq"))
      .select(col("event_type"), col("day"),
        expr(signDiv("sq", "cnt")).as("vq"))

  private val sqlDailyMeans: String = {
    val vq = sqlSignDiv("sq", "cnt")
    s"""daily AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
       |    CAST(COUNT(*) AS BIGINT) AS cnt,
       |    CAST(SUM(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS sq
       |  FROM events GROUP BY event_type, day
       |), dv AS (
       |  SELECT event_type, day, $vq AS vq FROM daily
       |)""".stripMargin
  }

  val moreQueries: Map[String, Q] = Map(
    // Per-type p10/p50/p90 value bands via the shared rank-selection
    // scaffold — three stored-value quantiles from ONE ordered window
    // pass (no interpolation, engine-exact).
    "q_quantile_bands" -> ((s, d) => {
      val r = rankOrdered(Tables.events(s, d)
        .select(col("event_type"), col("event_id"), col("value")),
        "event_type", "value", "event_id")
      r.groupBy(col("event_type")).agg(
        max(col("n")).as("n"),
        max(when(col("rn") === rankIdx(10), col("value"))).as("p10"),
        max(when(col("rn") === rankIdx(50), col("value"))).as("p50"),
        max(when(col("rn") === rankIdx(90), col("value"))).as("p90"))
    }),

    // CUSUM change-point scan per metric stream: cumulative sum of
    // daily-mean deviations from the stream's own mean, reporting the
    // day where |CUSUM| peaks (the classic single-change-point
    // estimate) and the peak magnitude. All integer micro-units: the
    // running sum is a per-type ordered window over ≤31 daily rows,
    // the argmax a max(struct) with earlier-day tie-break — shuffles
    // are the daily reduction plus one |types|-row aggregate.
    // One-sided CUSUM control chart over the per-type daily-mean
    // deviations (allowance 2.0, threshold 10.0 in value units x 1e6)
    // - the sequential alert that fires on a sustained small shift;
    // the generalization of the reference's static threshold bands.
    // The operator runs the max(0, S + dev - k) recurrence as its
    // exact prefix-sum/prefix-min closed form (see
    // TimeSeries.cusumAlerts).
    "q_cusum" -> ((s, d) => {
      val dv = dailyMeans(s, d)
      val w = Window.partitionBy(col("event_type"))
      val dev = dv
        .withColumn("n_days", count(lit(1)).over(w))
        .withColumn("sy", sum(col("vq")).over(w))
        .withColumn("dev", col("vq") - expr(signDiv("sy", "n_days")))
      TimeSeries.cusumAlerts(dev, "event_type", "day", "dev",
          driftK = 2000000L, threshH = 10000000L)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          max(col("cusum")).as("max_cusum"),
          sum(when(col("alert"), 1L).otherwise(0L)).as("n_alert_days"),
          coalesce(min(when(col("alert"), col("day"))), lit(-1L))
            .as("first_alert_day"))
    }),

    "q_changepoint" -> ((s, d) => {
      val dv = dailyMeans(s, d)
      val w = Window.partitionBy(col("event_type"))
      val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val withMean = dv
        .withColumn("n_days", count(lit(1)).over(w))
        .withColumn("sy", sum(col("vq")).over(w))
        .withColumn("mean_q", expr(signDiv("sy", "n_days")))
      val cusum = withMean
        .withColumn("cusum", sum(col("vq") - col("mean_q")).over(wOrd))
      cusum.groupBy(col("event_type")).agg(
        max(col("n_days")).as("n_days"),
        max(struct(abs(col("cusum")).as("a"), (-col("day")).as("nd")))
          .getField("a").as("max_abs_cusum"),
        (-max(struct(abs(col("cusum")).as("a"), (-col("day")).as("nd")))
          .getField("nd")).as("split_day"))
    }),

    // Lag-1 autocorrelation of the daily-mean series, exact: the
    // squared Pearson correlation of (y_{t-1}, y_t) as an integer ppm
    // plus its sign — r itself needs a square root, so the EXACT
    // quantity shipped is sign·r²; the one fp-free formulation two
    // engines can agree on bit-for-bit. Sufficient statistics are
    // int64-safe in MILLI-units (y ≤ 5.6·10⁵, 31 days); the final
    // num²·10⁶ / (denx·deny) runs in DECIMAL(38,0) (Spark) vs HUGEINT
    // (DuckDB) — both exact at ≤36 digits (the q_outliers precedent).
    // High |r²| with positive sign = momentum/drift; near-zero = the
    // series is noise around its level.
    "q_autocorr" -> ((s, d) => {
      val dv = dailyMeans(s, d)
        .select(col("event_type"), col("day"),
          expr(signDiv("vq", "1000")).as("vm"))
      val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val pairs = dv
        .withColumn("prev", lag(col("vm"), 1).over(wOrd))
        .filter(col("prev").isNotNull)
      pairs.groupBy(col("event_type")).agg(
          count(lit(1)).as("n_pairs"),
          sum(col("prev")).as("sx"), sum(col("vm")).as("sy"),
          sum(col("prev") * col("vm")).as("sxy"),
          sum(col("prev") * col("prev")).as("sxx"),
          sum(col("vm") * col("vm")).as("syy"))
        .withColumn("num", expr("n_pairs * sxy - sx * sy"))
        .withColumn("denx", expr("n_pairs * sxx - sx * sx"))
        .withColumn("deny", expr("n_pairs * syy - sy * sy"))
        .select(col("event_type"), col("n_pairs"),
          when(col("denx") === 0 || col("deny") === 0,
            lit(null).cast("long"))
            .otherwise(expr(
              """CAST((CAST(num AS DECIMAL(38,0)) * CAST(num AS DECIMAL(38,0))
                |  * 1000000) div
                |  (CAST(denx AS DECIMAL(38,0)) * CAST(deny AS DECIMAL(38,0)))
                |  AS BIGINT)""".stripMargin))
            .as("r2_ppm"),
          signum(col("num")).cast("long").as("trend_sign"))
    })
  )

  val queries: Map[String, Q] = base ++ moreQueries

  val oracles: Map[String, String] = Map(
    "q_quantile_bands" -> {
      s"""WITH r AS (
         |  SELECT event_type, value,
         |    row_number() OVER (PARTITION BY event_type
         |                       ORDER BY value ASC, event_id ASC) AS rn,
         |    COUNT(*) OVER (PARTITION BY event_type) AS n
         |  FROM events
         |)
         |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
         |  MAX(CASE WHEN rn = ${sqlRankIdx(10)} THEN value END) AS p10,
         |  MAX(CASE WHEN rn = ${sqlRankIdx(50)} THEN value END) AS p50,
         |  MAX(CASE WHEN rn = ${sqlRankIdx(90)} THEN value END) AS p90
         |FROM r GROUP BY event_type""".stripMargin
    },

    "q_cusum" -> {
      val mean = sqlSignDiv("sy", "n_days")
      s"""WITH $sqlDailyMeans, m AS (
         |  SELECT event_type, day, vq,
         |    COUNT(*) OVER (PARTITION BY event_type) AS n_days,
         |    SUM(vq) OVER (PARTITION BY event_type) AS sy
         |  FROM dv
         |), dev AS (
         |  SELECT event_type, day, n_days, vq - ($mean) - 2000000 AS d
         |  FROM m
         |), p AS (
         |  SELECT event_type, day, n_days,
         |    SUM(d) OVER (PARTITION BY event_type ORDER BY day
         |                 ROWS UNBOUNDED PRECEDING) AS psum
         |  FROM dev
         |), cu AS (
         |  SELECT event_type, day, n_days,
         |    psum - least(0, MIN(psum) OVER (PARTITION BY event_type
         |      ORDER BY day ROWS UNBOUNDED PRECEDING)) AS cusum
         |  FROM p
         |)
         |SELECT event_type, CAST(MAX(n_days) AS BIGINT) AS n_days,
         |  CAST(MAX(cusum) AS BIGINT) AS max_cusum,
         |  CAST(SUM(CASE WHEN cusum >= 10000000 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_alert_days,
         |  CAST(COALESCE(MIN(CASE WHEN cusum >= 10000000 THEN day END), -1)
         |    AS BIGINT) AS first_alert_day
         |FROM cu GROUP BY event_type""".stripMargin
    },

    "q_changepoint" -> {
      val mean = sqlSignDiv("sy", "n_days")
      s"""WITH $sqlDailyMeans, m AS (
         |  SELECT event_type, day, vq,
         |    COUNT(*) OVER (PARTITION BY event_type) AS n_days,
         |    SUM(vq) OVER (PARTITION BY event_type) AS sy
         |  FROM dv
         |), dev AS (
         |  SELECT event_type, day, n_days, vq - ($mean) AS dev
         |  FROM m
         |), cu AS (
         |  SELECT event_type, day, n_days,
         |    SUM(dev) OVER (PARTITION BY event_type ORDER BY day
         |                   ROWS UNBOUNDED PRECEDING) AS cusum
         |  FROM dev
         |), pick AS (
         |  SELECT event_type, day, n_days, abs(cusum) AS a,
         |    row_number() OVER (PARTITION BY event_type
         |                       ORDER BY abs(cusum) DESC, day ASC) AS rk
         |  FROM cu
         |)
         |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
         |  CAST(a AS BIGINT) AS max_abs_cusum, CAST(day AS BIGINT) AS split_day
         |FROM pick WHERE rk = 1""".stripMargin
    },

    "q_autocorr" -> {
      val vm = sqlSignDiv("vq", "1000")
      s"""WITH $sqlDailyMeans, mm AS (
         |  SELECT event_type, day, $vm AS vm FROM dv
         |), p AS (
         |  SELECT event_type, vm,
         |    lag(vm) OVER (PARTITION BY event_type ORDER BY day) AS prev
         |  FROM mm
         |), g AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |    CAST(SUM(prev) AS BIGINT) AS sx, CAST(SUM(vm) AS BIGINT) AS sy,
         |    CAST(SUM(prev * vm) AS BIGINT) AS sxy,
         |    CAST(SUM(prev * prev) AS BIGINT) AS sxx,
         |    CAST(SUM(vm * vm) AS BIGINT) AS syy
         |  FROM p WHERE prev IS NOT NULL GROUP BY event_type
         |), nd AS (
         |  SELECT event_type, n_pairs,
         |    CAST(n_pairs * sxy - sx * sy AS HUGEINT) AS num,
         |    CAST(n_pairs * sxx - sx * sx AS HUGEINT) AS denx,
         |    CAST(n_pairs * syy - sy * sy AS HUGEINT) AS deny
         |  FROM g
         |)
         |SELECT event_type, n_pairs,
         |  CASE WHEN denx = 0 OR deny = 0 THEN NULL
         |       ELSE CAST((num * num * 1000000) // (denx * deny) AS BIGINT)
         |  END AS r2_ppm,
         |  CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END
         |    AS BIGINT) AS trend_sign
         |FROM nd""".stripMargin
    },

    "q_decile_lift" ->
      """WITH r AS (
        |  SELECT o_orderkey,
        |    CAST(-floor(o_totalprice / 1000) AS BIGINT) AS nb,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
        |  FROM orders
        |), t AS (
        |  SELECT pos, ntile(10) OVER (ORDER BY nb, o_orderkey) AS decile
        |  FROM r
        |), g AS (
        |  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(pos) AS BIGINT) AS n_pos
        |  FROM t GROUP BY decile
        |), tot AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS nn,
        |    CAST(SUM(n_pos) AS BIGINT) AS np FROM g
        |)
        |SELECT CAST(decile AS BIGINT) AS decile, n, n_pos,
        |  n_pos * 1000000 // n AS pos_rate_ppm,
        |  (n_pos * nn * 10000) // (n * np) AS lift_bp
        |FROM g, tot""".stripMargin,

    "q_pmi_lift" ->
      """WITH base AS (
        |  SELECT event_type AS x, (epoch_us(ts) // 3600000000) % 24 AS y
        |  FROM events
        |), xy AS (
        |  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n_xy
        |  FROM base GROUP BY x, y
        |), mx AS (SELECT x, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM xy GROUP BY x),
        |my AS (SELECT y, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM xy GROUP BY y),
        |tot AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS nn FROM xy)
        |SELECT xy.x, xy.y, xy.n_xy, mx.n_x, my.n_y,
        |  xy.n_xy * tot.nn * 1000000 // (mx.n_x * my.n_y) AS lift_ppm
        |FROM xy JOIN mx USING (x) JOIN my USING (y), tot""".stripMargin,

    "q_ols_trend" -> {
      val vq = sqlSignDiv("sq", "cnt")
      val mean = sqlSignDiv("sy", "n_days")
      val slope = sqlSignDiv("num", "den")
      s"""WITH daily AS (
         |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         |    CAST(COUNT(*) AS BIGINT) AS cnt,
         |    CAST(SUM(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS sq
         |  FROM events GROUP BY event_type, day
         |), dv AS (
         |  SELECT event_type, day, $vq AS vq FROM daily
         |), xs AS (
         |  SELECT event_type,
         |    day - MIN(day) OVER (PARTITION BY event_type) AS x, vq
         |  FROM dv
         |), g AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(vq) AS BIGINT) AS sy,
         |    CAST(SUM(x * vq) AS BIGINT) AS sxy,
         |    CAST(SUM(x * x) AS BIGINT) AS sxx
         |  FROM xs GROUP BY event_type
         |), nd AS (
         |  SELECT event_type, n_days, sx, sy, sxy, sxx,
         |    n_days * sxy - sx * sy AS num,
         |    n_days * sxx - sx * sx AS den
         |  FROM g
         |)
         |SELECT event_type, n_days, $mean AS mean_micro,
         |  CASE WHEN den = 0 THEN NULL
         |       ELSE CAST($slope AS BIGINT) END AS slope_micro_per_day
         |FROM nd""".stripMargin
    }
  )
}
