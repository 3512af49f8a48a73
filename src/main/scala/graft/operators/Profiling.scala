package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dataset profiling and statistical quality checks — the "look before
  * you train" operators: per-column profile of an unfamiliar table and
  * exact z-score outlier flagging.
  */
object Profiling {

  /** Per-column table profile: row count, non-null count, exact
    * distinct count, and min/max rendered as strings.
    *
    * One narrow sub-plan per column — project the single column, count
    * per distinct value (map-side combinable, shuffles |distinct|
    * rows), then fold the value-counts into the stats row — unioned
    * across columns; the independent stages run concurrently inside
    * one job. This deliberately avoids a single multi-DISTINCT
    * aggregate: Catalyst plans that as an Expand that multiplies every
    * input row ×|cols| before one fat shuffle (measured 3× slower here
    * even when spread across cores), while each pass here prunes its
    * parquet scan to exactly one column.
    *
    * Min/max stringification is exact only for types whose rendering
    * both engines share (integers, strings, epoch longs) — callers
    * project doubles/timestamps to safe forms first.
    *
    * Output: (col_name, n_rows, n_nonnull, n_distinct, min_s, max_s).
    */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.select(col(c))
        .groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .agg(
          coalesce(sum(col("cnt")), lit(0L)).as("n_rows"),
          coalesce(sum(when(col(c).isNotNull, col("cnt"))), lit(0L))
            .as("n_nonnull"),
          count(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_s"),
          max(col(c)).cast("string").as("max_s"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nonnull"),
          col("n_distinct"), col("min_s"), col("max_s"))
    }.reduce(_ unionByName _)

  private val d38 = DecimalType(38, 0)

  /** Flag rows more than `k` standard deviations from their group mean,
    * computed entirely in exact integer arithmetic so the decision is
    * bit-identical across engines: with n, S = Σq, V = Σq² over a
    * group, (q − μ)² > k²σ² rearranges fraction-free to
    *
    *   (n·q − S)² > k² · (n·V − S²)
    *
    * `quantCol` must already be an exact integer quantization of the
    * measure (e.g. floor(x·100)). All terms are DECIMAL(38,0): with
    * |q| ≤ 1e8 and n ≤ 1e10 every product stays under 1e38 (DuckDB
    * mirror: HUGEINT). Two shuffles: the group-stats aggregate, then a
    * broadcastable stats join back onto the rows.
    */
  def zScoreOutliers(df: DataFrame, groupCol: String, quantCol: String,
      k: Int): DataFrame = {
    val q = col(quantCol).cast(d38)
    val stats = df.groupBy(col(groupCol)).agg(
      count(lit(1)).cast(d38).as("_n"),
      sum(q).cast(d38).as("_s"),
      sum(q * q).cast(d38).as("_v"))
    val dev = col("_n") * col(quantCol).cast(d38) - col("_s")
    val varN2 = col("_n") * col("_v") - col("_s") * col("_s")
    df.join(stats, Seq(groupCol))
      .filter(dev * dev > lit(k * k).cast(d38) * varN2)
      .drop("_n", "_s", "_v")
  }

  /** Two-sample histogram drift per group — the "did the new snapshot's
    * distribution move?" monitor a corpus pipeline runs between ingests.
    * Rows are split into sides A/B by `sideACond`; `valueCol` is binned
    * into `binWidth`-wide bins capped at `maxBin`; the per-group drift
    * statistic is the L1 distance between the two sides' normalized
    * histograms, kept FRACTION-FREE so it is bit-identical across
    * engines:
    *
    *   L1·(nA·nB) = Σ_bins |cA·nB − cB·nA|,  reported in ppm as
    *   l1_ppm = (Σ|cA·nB − cB·nA| · 10⁶) div (nA·nB)  ∈ [0, 2·10⁶].
    *
    * Products are DECIMAL(38,0) (DuckDB mirror: HUGEINT): with counts
    * ≤ 10¹⁰ every term stays under 10²⁶. Plan shape: one (group, bin)
    * partial-aggregated shuffle over the facts, then a window + final
    * aggregate over ≤ maxBin+1 rows per group — the second stage is
    * negligible at any scale. NULL l1_ppm/drifted when either side of a
    * group is empty (drift is undefined, not zero).
    */
  def histogramDrift(df: DataFrame, groupCol: String, sideACond: Column,
      valueCol: String, binWidth: Long, maxBin: Int,
      driftPpmThreshold: Long = 300000L): DataFrame = {
    val c = df
      .select(col(groupCol), sideACond.as("is_a"),
        least(expr(s"$valueCol div $binWidth"), lit(maxBin.toLong)).as("bin"))
      .groupBy(col(groupCol), col("bin"))
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
    val w = Window.partitionBy(col(groupCol))
    val l1Ppm = expr(
      "(l1 * 1000000) div (CAST(n_a AS DECIMAL(38,0)) * n_b)")
    c.withColumn("n_a", sum(col("ca")).over(w))
      .withColumn("n_b", sum(col("cb")).over(w))
      .groupBy(col(groupCol))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sum(abs(col("ca").cast(d38) * col("n_b") -
          col("cb").cast(d38) * col("n_a"))).as("l1"))
      .select(col(groupCol), col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0, l1Ppm).as("l1_ppm"))
      .withColumn("drifted",
        when(col("l1_ppm").isNotNull, col("l1_ppm") >= driftPpmThreshold))
  }

  /** Static-side reference histogram for [[histogramDriftStream]]: one
    * row per group with fixed-width bin counts as columns b0..b{maxBin}
    * plus the group total `n_ref` — the broadcastable "yesterday's
    * corpus" shape, |groups|·(maxBin+2) cells regardless of corpus
    * size. `valueCol` must be integral (quantize doubles with
    * floor(x·k) first, as everywhere else in this library).
    */
  def histogramBaseline(df: DataFrame, groupCol: String, valueCol: String,
      binWidth: Long, maxBin: Int): DataFrame = {
    val bin = least(expr(s"$valueCol div $binWidth"), lit(maxBin.toLong))
    val cs = (0 to maxBin).map(b =>
      sum(when(bin === b, 1L).otherwise(0L)).as(s"b$b"))
    df.groupBy(col(groupCol)).agg(cs.head, cs.tail: _*)
      .withColumn("n_ref", (0 to maxBin).map(i => col(s"b$i")).reduce(_ + _))
  }

  /** Streaming twin of [[histogramDrift]]: per event-time window and
    * group, the L1 drift of the window's value histogram against a
    * STATIC baseline ([[histogramBaseline]]) — the "is the live feed's
    * distribution still yesterday's?" alarm.
    *
    * Deliberately ONE stateful operator: the windowed aggregation emits
    * the whole bin vector as maxBin+1 conditional sums in a single
    * pass, so the L1 fold against the broadcast baseline is a stateless
    * projection — no chained stateful aggregations, no second shuffle,
    * state = open windows × groups × (maxBin+2) longs. Same
    * fraction-free ppm arithmetic as the batch operator. Groups absent
    * from the baseline are dropped (drift vs nothing is undefined);
    * Append emission = the batch verdict for each closed window.
    */
  def histogramDriftStream(stream: DataFrame, baseline: DataFrame,
      groupCol: String, tsCol: String, valueCol: String,
      binWidth: Long, maxBin: Int, windowDur: String, watermarkDur: String,
      ppmThreshold: Long = 300000L): DataFrame = {
    val bin = least(expr(s"$valueCol div $binWidth"), lit(maxBin.toLong))
    val as = (0 to maxBin).map(b =>
      sum(when(bin === b, 1L).otherwise(0L)).as(s"a$b"))
    val counts = stream.withWatermark(tsCol, watermarkDur)
      .groupBy(window(col(tsCol), windowDur), col(groupCol))
      .agg(as.head, as.tail: _*)
      .withColumn("n_win", (0 to maxBin).map(i => col(s"a$i")).reduce(_ + _))
    val l1 = (0 to maxBin).map(i =>
      abs(col(s"a$i").cast(d38) * col("n_ref") -
        col(s"b$i").cast(d38) * col("n_win"))).reduce(_ + _)
    counts.join(broadcast(baseline), Seq(groupCol))
      .withColumn("l1", l1)
      .select(col("window.start").as("window_start"), col(groupCol),
        col("n_win"), col("n_ref"),
        when(col("n_win") > 0 && col("n_ref") > 0,
          expr("(l1 * 1000000) div (CAST(n_win AS DECIMAL(38,0)) * n_ref)"))
          .as("l1_ppm"))
      .withColumn("drifted",
        when(col("l1_ppm").isNotNull, col("l1_ppm") >= ppmThreshold))
  }

  /** k-anonymity audit over a quasi-identifier tuple: how many rows
    * share each distinct quasi-identifier combination, and which
    * combinations fall below `k` — the re-identification screen run
    * before releasing metadata-carrying training data (a document
    * whose (lang, source, size-band) tuple is unique is linkable even
    * with the text scrubbed). One keyed aggregate; the risk flag and
    * the at-risk row share are derived in the same pass via a window
    * over the aggregated (|combinations|-sized) frame — sublinear in
    * the corpus, the usual hierarchical-smallness argument.
    *
    * Output per combination: the quasi columns, `group_n`, `at_risk`
    * (group_n < k), and `risk_share_bp` — the corpus-wide share of
    * ROWS living in at-risk combinations, in integer basis points
    * (same value on every row: it is the dataset verdict).
    */
  def kAnonymity(df: DataFrame, quasi: Seq[(String, Column)],
      k: Long): DataFrame = {
    require(quasi.nonEmpty && k >= 1)
    val keyed = df.select(quasi.map { case (n, c) => c.as(n) }: _*)
    val counts = keyed.groupBy(quasi.map(q => col(q._1)): _*)
      .agg(count(lit(1)).as("group_n"))
    val all = Window.partitionBy()
    counts
      .withColumn("at_risk", col("group_n") < k)
      .withColumn("__risk_rows",
        sum(when(col("at_risk"), col("group_n")).otherwise(lit(0L))).over(all))
      .withColumn("__total_rows", sum(col("group_n")).over(all))
      .withColumn("risk_share_bp",
        expr("__risk_rows * 10000 div __total_rows"))
      .drop("__risk_rows", "__total_rows")
  }

  /** Zero-cost pipeline telemetry via `Dataset.observe` (Catalyst's
    * CollectMetrics node): attach named counters — row count plus one
    * flagged-count per screen rule — to a flowing DataFrame, so a
    * curation job reports "scanned N, rule X flagged M" from the SAME
    * pass that does the work. The alternative (a separate aggregation
    * per report) re-scans the corpus once per number; observe rides
    * the existing scan for free, which at 100 TB is the difference
    * between telemetry and a second job. Works on batch (read the
    * [[org.apache.spark.sql.Observation]] after any action) and
    * streaming (per-batch via the progress listener).
    *
    * Returns the instrumented frame plus the Observation handle; the
    * frame's rows are untouched (CollectMetrics is a pass-through).
    */
  def observedScreen(df: DataFrame, flagCols: Seq[String],
                     name: String = "screen")
      : (DataFrame, org.apache.spark.sql.Observation) = {
    require(flagCols.nonEmpty, "need at least one flag column")
    val obs = org.apache.spark.sql.Observation(name)
    val metrics = count(lit(1)).as("n_rows") +:
      flagCols.map(f =>
        sum(col(f).cast("long")).as(s"n_flagged_$f"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
