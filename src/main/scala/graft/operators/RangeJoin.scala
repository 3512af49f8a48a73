package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join, equi-ized by binning.
  *
  * A naive `p.ts >= i.start AND p.ts < i.end` join has no equi-key, so
  * Spark plans a BroadcastNestedLoopJoin — O(|points|·|intervals|)
  * compute and an unbounded broadcast: the exact shape that falls over
  * at 100 TB. The standard scale-safe rewrite is binning: quantize time
  * into `binWidth` buckets, replicate each interval onto every bucket it
  * overlaps (⌈len/width⌉+1 rows — bounded when interval length is
  * bounded), tag each point with its single bucket, equi-join on the
  * bucket id, and re-check the exact range predicate on the matches.
  * The join becomes a plain shuffle hash join keyed by bucket; a bin
  * holding many intervals is ordinary join-key skew (AQE's problem, not
  * a plan problem).
  *
  * Pick `binWidth` ≈ the typical interval length: much smaller → more
  * replicas per interval; much larger → more false candidates per bin.
  */
object RangeJoin {

  /** Join `points` (epoch-long column `ptCol`) to `intervals` (epoch-long
    * `startCol`/`endCol`, end EXCLUSIVE): one output row per (point,
    * containing interval). Column sets must be disjoint.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      ptCol: String, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // end is exclusive: an interval touching bin b only via end == b*w
    // contributes nothing there, hence the (end - 1) upper bound
    val iBinned = intervals.withColumn("_bin",
      explode(sequence(floor(col(startCol) / binWidth).cast("long"),
        floor((col(endCol) - 1) / binWidth).cast("long"))))
    val pBinned = points.withColumn("_bin", floor(col(ptCol) / binWidth).cast("long"))
    pBinned.join(iBinned, Seq("_bin"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("_bin")
  }

  /** Interval × interval overlap join, equi-ized the same way: both
    * sides replicate onto every bin they touch, the equi-join runs on
    * the bin id, and the exact half-open overlap predicate
    * (lStart < rEnd AND rStart < lEnd) re-checks candidates.
    *
    * A pair sharing several bins would match once per shared bin; the
    * `greatest(startBin_l, startBin_r)` guard keeps each pair only in
    * the FIRST bin both occupy — exactly-once without a distinct (no
    * extra shuffle). Replication is ⌈len/width⌉+1 per row, so bounded
    * interval lengths keep the blow-up constant; pick `binWidth` near
    * the longer side's typical length. Column sets must be disjoint;
    * ends are exclusive (empty intervals match nothing).
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, s: String, e: String) = df.withColumn("_bin",
      explode(sequence(floor(col(s) / binWidth).cast("long"),
        floor((col(e) - 1) / binWidth).cast("long"))))
    binned(left, lStart, lEnd).join(binned(right, rStart, rEnd), Seq("_bin"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("_bin") === greatest(
        floor(col(lStart) / binWidth).cast("long"),
        floor(col(rStart) / binWidth).cast("long")))
      .drop("_bin")
  }
}
