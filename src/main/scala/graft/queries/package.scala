package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

package object queries {
  /** Harness query signature: (session, sf dir) => result. */
  type Q = (SparkSession, String) => DataFrame

  /** Oracle-stable sum of a double column.
    *
    * A plain `SUM(double)` is summation-order-dependent: Spark's partial
    * aggregation and DuckDB's scan order accumulate differently, and at
    * ~1e9 magnitude the divergence (n·eps·|sum| ≈ 1e-2 at sf0.01) survives
    * any sane output rounding. Casting each element to DECIMAL(18,6)
    * first makes the sum exact and order-independent in both engines
    * (and the double→decimal conversion can never hit a rounding tie:
    * x.xxxxxx5·10⁻⁶ is not a dyadic rational, so no double lands exactly
    * on a midpoint). The final cast back to double is then a single
    * deterministic conversion shared by both engines.
    *
    * DuckDB mirror: `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Oracle-stable average (see [[dsum]]); mirror:
    * `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)`.
    */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** SQL fragments for the DuckDB side of the patterns above. */
  def sqlDsum(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(18,6))) AS DOUBLE)"
  def sqlDavg(x: String): String = s"(${sqlDsum(x)} / COUNT(*))"

  /** Exact-percentile rank scaffold, shared by q_percentile_rank,
    * q_approx_quantile and q_winsorize (one definition so the index
    * formula and tie-break can never drift between them): adds
    * `rn` = row_number ordered by (valueCol ASC, tieCol ASC) and group
    * size `n`, both per groupCol. Select the p-th percentile as an
    * actual stored value with `max(when(col("rn") === rankIdx(p), v))`
    * — rank selection, no interpolation (interpolated quantiles are
    * 1-ulp-unstable across engines).
    *
    * DuckDB mirror: a CTE with
    * `row_number() OVER (PARTITION BY g ORDER BY v ASC, tie ASC) AS rn,
    *  COUNT(*) OVER (PARTITION BY g) AS n` and [[sqlRankIdx]].
    */
  def rankOrdered(df: DataFrame, groupCol: String, valueCol: String,
                  tieCol: String): DataFrame = {
    val wOrd = Window.partitionBy(col(groupCol))
      .orderBy(asc(valueCol), asc(tieCol))
    val wAll = Window.partitionBy(col(groupCol))
    df.withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
  }

  /** Nearest-lower rank of percentile p over a [[rankOrdered]] frame
    * (integer `div` — `Column./` is double division). */
  def rankIdx(p: Int): Column = expr(s"((n - 1) * $p) div 100 + 1")

  /** DuckDB mirror of [[rankIdx]]. */
  def sqlRankIdx(p: Int): String = s"(n - 1) * $p // 100 + 1"
}
