package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): the rows not dominated by any other
  * row, where domination means `costCol` ≤ and `valueCol` ≥ with at
  * least one strict. The curation use: pick the documents that are
  * best-value-for-cost (e.g. highest quality logit per byte budget) —
  * every dominated document has a strictly better alternative at the
  * same or lower cost.
  *
  * The naive formulation is an all-pairs NOT EXISTS (O(n²) — the
  * DuckDB oracle states it that way precisely because it is
  * independent of this plan). The scale-safe plan is a distributed
  * running maximum, the same two-level trick as Packing's prefix sum:
  *
  *   1. per-cost reduction: groupBy(cost) → max(value). Shuffle ∝
  *      |distinct costs|, never ∝ rows. A row survives only if it IS
  *      its cost's max (equal-cost rows with lower value are dominated).
  *   2. bucket the distinct costs into `bucketWidth`-wide ranges;
  *      per-bucket max is another tiny aggregate, and the
  *      strictly-before-this-bucket running max ("carry") is a window
  *      over the ≤ costDomain/bucketWidth bucket rows — the only
  *      single-partition step, on a frame that is orders of magnitude
  *      smaller than the data and broadcast back.
  *   3. within each bucket (partitioned window, ordered by cost, RANGE
  *      frame ending at -1 so equal costs see only strictly-smaller
  *      ones), the previous-cost max combines with the carry; a cost's
  *      max survives iff it strictly exceeds that combined bound.
  *   4. a broadcast semi-join on (cost, value) recovers the surviving
  *      rows — ties on both dims are mutually non-dominating and all
  *      kept, matching weak-dominance skyline semantics.
  *
  * Every stage is linear in its input and the frontier itself is
  * monotone-decreasing in cost, so the result is at most
  * |distinct costs| rows. At 100 TB the rows→per-cost reduction is the
  * only data-sized shuffle, exactly like any groupBy aggregate.
  */
object Skyline {

  /** Frontier rows of `df` under (minimize `costCol`: long, maximize
    * `valueCol`: long). Returns the input columns, frontier rows only.
    */
  def paretoFrontier2D(df: DataFrame, costCol: String, valueCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val best = df.groupBy(col(costCol))
      .agg(max(col(valueCol)).as("_best"))
      .withColumn("_bucket", expr(s"$costCol div $bucketWidth"))
    // strictly-previous-bucket running max: window over ≤domain/width rows
    val bmax = best.groupBy(col("_bucket")).agg(max(col("_best")).as("_bmax"))
    val carry = bmax.withColumn("_carry",
      max(col("_bmax")).over(
        Window.orderBy(col("_bucket")).rowsBetween(Window.unboundedPreceding, -1)))
      .drop("_bmax")
    val inBucket = Window.partitionBy(col("_bucket")).orderBy(col(costCol))
      .rangeBetween(Window.unboundedPreceding, -1)
    val frontier = best
      .join(broadcast(carry), Seq("_bucket"))
      .withColumn("_prev",
        greatest(coalesce(max(col("_best")).over(inBucket), lit(Long.MinValue)),
          coalesce(col("_carry"), lit(Long.MinValue))))
      .filter(col("_best") > col("_prev"))
      // fresh names: frontier shares lineage with df (groupBy keeps the
      // key's exprId), so joining on the original names would be the
      // classic ambiguous-self-join trap
      .select(col(costCol).as("_f_cost"), col("_best").as("_f_value"))
    df.join(broadcast(frontier),
      col(costCol) === col("_f_cost") && col(valueCol) === col("_f_value"))
      .select(df.columns.map(col): _*)
  }
}
