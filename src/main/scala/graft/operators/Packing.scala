package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the training-batch assembly step of an LLM data
  * pipeline: lay documents end-to-end in id order and cut the stream
  * into fixed token-capacity bins (each doc assigned to the bin where
  * its first token lands; docs are atomic, bins may overflow by at most
  * one doc's tail).
  *
  * The natural formulation is a global running sum — which Spark plans
  * as a single-partition Window (every row through one task; the
  * WindowExec "No Partition Defined" warning is exactly this trap). The
  * scale shape used here is the classic two-level distributed prefix
  * sum:
  *
  *   1. bucket rows by id range (`id div bucketWidth` — deterministic,
  *      order-preserving across buckets),
  *   2. cumulative sums WITHIN each bucket in parallel,
  *   3. one tiny pass over the |buckets| per-bucket totals (n /
  *      bucketWidth rows — for 100 TB of 1k-token docs and 1M-row
  *      buckets that is ~10⁵ rows, trivially single-partition) yields
  *      each bucket's global offset,
  *   4. broadcast-join the offsets back: global position = bucket
  *      offset + within-bucket cumsum.
  *
  * Only step 3 is serial, and it touches |buckets| rows, not |rows| —
  * the same recursion Blelloch scan / Spark's own zipWithIndex use.
  */
object Packing {

  /** Per-document bin assignment: (idCol, lenCol, start_off, bin).
    *
    * `start_off` is the global token offset of the doc's first token
    * (sum of all lengths of lower-id docs); `bin = start_off div
    * capacity`.
    */
  def packBins(df: DataFrame, idCol: String, lenCol: String,
               capacity: Long, bucketWidth: Long = 4096): DataFrame = {
    require(capacity > 0 && bucketWidth > 0)
    val inBucket = Window.partitionBy(col("bucket")).orderBy(col(idCol))
    val within = df
      .withColumn("bucket", expr(s"`$idCol` div $bucketWidth"))
      .withColumn("cum_in", sum(col(lenCol)).over(inBucket))
    // |buckets| rows: the only serial window, hierarchically tiny.
    val overBuckets = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = within.groupBy(col("bucket"))
      .agg(sum(col(lenCol)).as("bucket_total"))
      .withColumn("bucket_off",
        coalesce(sum(col("bucket_total")).over(overBuckets), lit(0L)))
      .select(col("bucket"), col("bucket_off"))
    within.join(broadcast(offsets), Seq("bucket"))
      .withColumn("start_off", col("bucket_off") + col("cum_in") - col(lenCol))
      .withColumn("bin", expr(s"start_off div $capacity"))
      .select(col(idCol), col(lenCol), col("start_off"), col("bin"))
  }

  /** Bin-level packing report: docs per bin, token fill, id span.
    * `fill_ratio` uses double division — portable (single IEEE op).
    */
  def packReport(df: DataFrame, idCol: String, lenCol: String,
                 capacity: Long, bucketWidth: Long = 4096): DataFrame =
    packBins(df, idCol, lenCol, capacity, bucketWidth)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(lenCol)).as("n_tokens"),
        min(col(idCol)).as("first_id"),
        max(col(idCol)).as("last_id"))

  /** Padding-waste audit for length-bucketed batching — the OTHER batch
    * assembly strategy next to [[packBins]]: each sequence is padded up
    * to its power-of-two length bucket (floor `minBucket`), and the
    * per-bucket report shows how many tokens that padding burns — the
    * number a pipeline reads before picking bucket boundaries or
    * switching to packing.
    *
    * The bucket is computed with the repo's exact integer floor-log2
    * idiom (`length(bin(n))`): for n > minBucket the ceiling power of
    * two is `1 << length(bin(n-1))`, with the shift amount a COLUMN —
    * which the Scala `shiftleft` helper cannot express (Int-only
    * parameter) but the SQL form can. Utilization is reported in exact
    * integer basis points (integer division — no cross-engine float).
    * One map-side-combinable aggregation over ≤ ~50 bucket keys; linear
    * scan, trivially 100 TB-safe.
    */
  def paddingWaste(df: DataFrame, lenCol: String, minBucket: Long = 16L): DataFrame =
    df.select(col(lenCol).cast("long").as("n"))
      .withColumn("bucket",
        when(col("n") <= minBucket, lit(minBucket))
          .otherwise(expr("shiftleft(1L, int(length(bin(n - 1L))))")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_seqs"),
        sum(col("n")).as("sum_tokens"),
        sum(col("bucket") - col("n")).as("sum_padding"))
      .select(col("bucket"), col("n_seqs"), col("sum_tokens"), col("sum_padding"),
        expr("(sum_tokens * 10000L) div (n_seqs * bucket)").as("utilization_bp"))
}
