package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dataset profiling and statistical quality checks — the "look before
  * you train" operators: per-column profile of an unfamiliar table and
  * exact z-score outlier flagging.
  */
object Profiling {

  /** One-pass per-column profile: non-null count, distinct count, and
    * min/max rendered as strings. One aggregate over the whole table —
    * the multiple DISTINCT aggregates expand the input ×|cols| before
    * the single shuffle (Catalyst's Expand), which is the exact-count
    * price; at 100 TB swap `countDistinct` for `approx_count_distinct`
    * and the pass becomes plain map-side-combinable.
    *
    * Min/max stringification is exact only for types whose rendering
    * both engines share (integers, strings, epoch longs) — callers
    * project doubles/timestamps to safe forms first.
    *
    * Output: (col_name, n_rows, n_nonnull, n_distinct, min_s, max_s).
    */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__mn"),
        max(col(c)).cast("string").as(s"${c}__mx"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = array(cols.map { c =>
      struct(lit(c).as("col_name"), col(s"${c}__nn").as("n_nonnull"),
        col(s"${c}__nd").as("n_distinct"), col(s"${c}__mn").as("min_s"),
        col(s"${c}__mx").as("max_s"))
    }: _*)
    one.select(col("n_rows"), explode(perCol).as("p"))
      .select(col("p.col_name"), col("n_rows"), col("p.n_nonnull"),
        col("p.n_distinct"), col("p.min_s"), col("p.max_s"))
  }

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
}
