package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
}
