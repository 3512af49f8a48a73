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

  /** Oracle-stable sum of a double column in LONG MICRO-UNITS — the
    * fast-path twin of [[dsum]] for hot fact-table aggregates.
    *
    * [[dsum]]'s decimal(18,6) elements force a decimal(28,6) sum buffer,
    * which is past Spark's 18-digit compact-long representation: every
    * row pays boxed BigDecimal arithmetic (measured 5.4× slower than a
    * long sum on lineitem at sf0.1). Quantizing each element to
    * `floor(x·10⁶)` as BIGINT instead keeps the whole aggregate in
    * unsafe long arithmetic, and stays engine-exact at every step: the
    * double multiply is the same IEEE op in both engines, floor and the
    * long sum are exact, and the final micro→unit division is one
    * deterministic double op. Both engines convert the identical exact
    * integer sum to double (round-to-nearest), so even sums past 2⁵³
    * agree bit-for-bit. Overflow bound: holds while the micro-unit sum
    * fits int64 (~9·10¹⁸ — ~150 PB of lineitem revenue); past that,
    * fall back to [[dsum]].
    *
    * DuckDB mirror: `CAST(SUM(CAST(floor(x * 1e6) AS BIGINT)) AS DOUBLE) / 1e6`.
    */
  def lsum(c: Column): Column =
    sum(floor(c * lit(1e6)).cast("long")).cast("double") / 1e6

  /** Oracle-stable average via [[lsum]]; mirror:
    * `CAST(SUM(CAST(floor(x * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / COUNT(*)`.
    */
  def lavg(c: Column): Column = lsum(c) / count(lit(1))

  /** SQL fragments for the DuckDB side of the patterns above. */
  def sqlDsum(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(18,6))) AS DOUBLE)"
  def sqlDavg(x: String): String = s"(${sqlDsum(x)} / COUNT(*))"
  def sqlLsum(x: String): String =
    s"CAST(SUM(CAST(floor(($x) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6"
  def sqlLavg(x: String): String = s"(${sqlLsum(x)} / COUNT(*))"

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
