package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series shaping operators: regular-grid resampling with
  * forward-fill, and SCD2 (slowly-changing-dimension type 2) validity
  * intervals from an event log.
  *
  * Both are pure window/aggregate compositions — no driver-side
  * iteration, no collect. Scale analysis:
  *  - `resampleLastFfill`: the observation aggregate shuffles on
  *    (key, bucket) — one pass, map-side combinable. The grid size is
  *    keys × (span / bucket), independent of the input row count, so a
  *    100 TB event log with a bounded key space resamples to a small
  *    output. The forward-fill window sorts per key — keys are the
  *    parallelism unit; a single key's grid must fit a partition (true
  *    by construction: span/bucket rows).
  *  - `scd2History`: two windows over the same (key, order) sort — one
  *    partitioning is reused (no second shuffle for the lead()).
  */
object TimeSeries {

  /** Resample an observation stream onto a regular bucket grid, carrying
    * the last observation of each bucket and forward-filling empty
    * buckets from the previous non-empty one.
    *
    * "Last" is the row with the greatest (epochCol, tieCol) in the
    * bucket — tieCol makes the choice deterministic when two
    * observations share an epoch. Buckets before a key's first
    * observation fill with null.
    *
    * The fill itself is the portable gaps-and-islands form: group id =
    * running count of non-null values (each observation starts its own
    * group, trailing gap rows inherit it), then one value per group.
    * `last(ignoreNulls)` would plan the same window but its DuckDB
    * mirror (`IGNORE NULLS`) is less portable than COUNT + MAX.
    *
    * Output: (keyCol, bucket_start: long, obs_cnt: long, value_ffill).
    */
  def resampleLastFfill(df: DataFrame, keyCol: String, epochCol: String,
      tieCol: String, valCol: String, bucketSeconds: Long): DataFrame = {
    val bucketed = df.select(
      col(keyCol), col(epochCol), col(tieCol), col(valCol),
      expr(s"$epochCol div $bucketSeconds").as("bucket"))
    // one shuffle: per-bucket count + argmax-by-(epoch, tie) in one agg
    val obs = bucketed.groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("obs_cnt"),
        max(struct(col(epochCol), col(tieCol), col(valCol)))
          .getField(valCol).as("v"))
    // grid: keys × contiguous bucket range — rows = keys · span/bucket,
    // NOT proportional to the input
    val grid = bucketed.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
      .select(col(keyCol), explode(sequence(col("mn"), col("mx"))).as("bucket"))
    val joined = grid.join(obs, Seq(keyCol, "bucket"), "left")
    val wOrder = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    val filled = joined
      .withColumn("grp", count(col("v")).over(wOrder))
    filled.select(
      col(keyCol),
      (col("bucket") * bucketSeconds).as("bucket_start"),
      coalesce(col("obs_cnt"), lit(0L)).as("obs_cnt"),
      max(col("v")).over(
        Window.partitionBy(col(keyCol), col("grp"))).as("value_ffill"))
  }

  /** Resample onto a regular bucket grid with LINEAR INTERPOLATION
    * across interior gaps — the numeric-feature twin of
    * [[resampleLastFfill]] (ffill repairs state-like streams, linear
    * interpolation repairs continuous metrics before feature
    * extraction).
    *
    * Each bucket's anchor is its last observation by (epochCol,
    * tieCol), quantized to micro-units (`floor(v·10⁶)` as long) so the
    * interpolated value is integer-exact and engine-portable: a gap
    * bucket between anchors (pb, pv) and (nb, nv) gets
    * `pv + ((nv−pv)·(b−pb)) div (nb−pb)` with the division applied to
    * the non-negative magnitude (truncation toward zero on both Spark
    * and DuckDB regardless of their negative-`div` conventions).
    * Exterior gaps (before the first / after the last observation)
    * stay null — interpolation needs both anchors; extrapolation is a
    * different (and lying) operator.
    *
    * Plan shape: the anchor aggregate shuffles on (key, bucket); the
    * grid is keys × span/bucket rows; prev/next anchors ride the
    * gaps-and-islands trick twice (ascending and descending running
    * counts), four windows all partitioned by key — per-key grids are
    * the parallelism unit, as in ffill. Output: (keyCol, bucket_start,
    * obs_cnt, value_interp_micro: long).
    */
  def resampleLinear(df: DataFrame, keyCol: String, epochCol: String,
      tieCol: String, valCol: String, bucketSeconds: Long): DataFrame = {
    val bucketed = df.select(
      col(keyCol), col(epochCol), col(tieCol), col(valCol),
      expr(s"$epochCol div $bucketSeconds").as("bucket"))
    val obs = bucketed.groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("obs_cnt"),
        max(struct(col(epochCol), col(tieCol), col(valCol)))
          .getField(valCol).as("v"))
      .withColumn("vq", floor(col("v") * 1e6).cast("long")).drop("v")
    val grid = bucketed.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
      .select(col(keyCol), explode(sequence(col("mn"), col("mx"))).as("bucket"))
    val joined = grid.join(obs, Seq(keyCol, "bucket"), "left")
    val wAsc = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    val wDesc = Window.partitionBy(col(keyCol)).orderBy(col("bucket").desc)
    val g = joined
      .withColumn("grp", count(col("vq")).over(wAsc))
      .withColumn("grpr", count(col("vq")).over(wDesc))
    val wP = Window.partitionBy(col(keyCol), col("grp"))
    val wN = Window.partitionBy(col(keyCol), col("grpr"))
    g.withColumn("pv", max(col("vq")).over(wP))
      .withColumn("pb", min(col("bucket")).over(wP))
      .withColumn("nv", max(col("vq")).over(wN))
      .withColumn("nb", max(col("bucket")).over(wN))
      .select(
        col(keyCol),
        (col("bucket") * bucketSeconds).as("bucket_start"),
        coalesce(col("obs_cnt"), lit(0L)).as("obs_cnt"),
        when(col("vq").isNotNull, col("vq"))
          .when(col("pv").isNull || col("nv").isNull, lit(null).cast("long"))
          .otherwise(col("pv") + expr(
            """CASE WHEN (nv - pv) * (bucket - pb) >= 0
              |THEN ((nv - pv) * (bucket - pb)) div (nb - pb)
              |ELSE -((-((nv - pv) * (bucket - pb))) div (nb - pb))
              |END""".stripMargin))
          .as("value_interp_micro"))
  }

  /** SCD2 history: compact an event log to the rows where `attrCol`
    * changed, each carrying its validity interval [valid_from,
    * valid_to) — valid_to is the next change's epoch, null for the
    * currently-open row. The standard shape for building dimension
    * history tables from CDC streams.
    *
    * Change detection is null-safe (`<=>`): the first row per key is
    * always a change. Ordering ties on equal epochs resolve by tieCol.
    */
  def scd2History(df: DataFrame, keyCol: String, epochCol: String,
      tieCol: String, attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(epochCol), col(tieCol))
    val flagged = df
      .select(col(keyCol), col(epochCol), col(tieCol), col(attrCol))
      .withColumn("prev", lag(col(attrCol), 1).over(w))
      // rn distinguishes "no previous row" from "previous attr was
      // null" — a lag()-is-null test alone would drop a first row whose
      // attribute is itself null. All three windows share one (key)
      // partitioning + (epoch, tie) sort — a single Exchange/Sort.
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 || !(col("prev") <=> col(attrCol)))
    val wChanged = Window.partitionBy(col(keyCol)).orderBy(col(epochCol), col(tieCol))
    flagged.select(
      col(keyCol), col(attrCol),
      col(epochCol).as("valid_from"),
      lead(col(epochCol), 1).over(wChanged).as("valid_to"))
  }

  /** One-sided CUSUM control chart (Page 1954) over an ordered,
    * integer-quantized series — the sequential drift detector that
    * generalizes the reference pipeline's static threshold alerts
    * (spark_job1's CASE bands fire on a single reading; CUSUM fires on
    * a sustained small shift long before any one reading crosses a
    * band). S_i = max(0, S_{i-1} + (x_i - k)) with an alert when
    * S_i >= h.
    *
    * The recurrence looks inherently sequential, but has the exact
    * closed form S_i = P_i - min(0, min_{j<=i} P_j) with
    * P_i = prefix-sum of (x - k) — so it runs as TWO window
    * cumulatives (sum + running min) over the same (key, order) frame:
    * one exchange, no per-key fold, no UDF. All arithmetic is int64 on
    * the quantized inputs, so alert sequences are engine-exact.
    *
    * Returns the per-point frame (key, order, cusum, alert) —
    * composable; callers roll up first-crossing/alert counts.
    *
    * Scale: one key-ordered exchange, window state O(1) per row (sum
    * and min are running aggregates, not buffered frames). Per-key
    * history length is the only growth axis — the same posture as
    * every other window op here.
    */
  def cusumAlerts(df: DataFrame, keyCol: String, orderCol: String,
                  valueCol: String, driftK: Long, threshH: Long): DataFrame = {
    require(threshH > 0, "alert threshold must be positive")
    val wCum = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("psum", sum(col(valueCol) - driftK).over(wCum))
      .withColumn("cusum",
        col("psum") - least(lit(0L), min(col("psum")).over(wCum)))
      .withColumn("alert", col("cusum") >= threshH)
      .select(col(keyCol), col(orderCol), col(valueCol), col("cusum"),
        col("alert"))
  }
}
