package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew-mitigation operators: two-phase (salted) aggregation.
  *
  * At 100 TB a hot grouping key (one server, one event type) turns a
  * single reducer into the job's critical path. Salting splits each key
  * into `buckets` sub-keys for the wide partial aggregation, then
  * reduces the tiny (|keys|·buckets)-row intermediate in a second,
  * cheap shuffle. AQE's skew handling covers sort-merge joins; salting
  * is the aggregation-side counterpart under our control.
  *
  * Sums ride DECIMAL internally, so two-phase results are bit-equal to
  * the single-phase aggregation (decimal addition is associative —
  * double addition is not).
  */
object Skew {

  /** Deterministic salt in [0, buckets) from an arbitrary column (use a
    * high-cardinality payload column, e.g. the row id).
    */
  def salt(saltSource: Column, buckets: Int): Column =
    pmod(xxhash64(saltSource), lit(buckets.toLong)).cast("int")

  /** Salted count + sum(value): phase 1 aggregates (keys, salt), phase
    * 2 merges salt partials per key. Output: keys, n_rows (long),
    * sum_value (double, decimal-exact).
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     saltSource: Column, buckets: Int = 32): DataFrame = {
    val keys = keyCols.map(col)
    val partial = df
      .withColumn("_salt", salt(saltSource, buckets))
      .groupBy(keys :+ col("_salt"): _*)
      .agg(count(lit(1)).as("_n"),
        sum(col(valueCol).cast(DecimalType(18, 6))).as("_s"))
    partial
      .groupBy(keys: _*)
      .agg(sum(col("_n")).as("n_rows"),
        sum(col("_s")).cast("double").as("sum_value"))
  }

  /** Salted repartition join — the join-side counterpart of
    * [[saltedSumCount]], for when one fact key is hot enough that even
    * AQE's skew-split leaves a straggler (AQE splits partitions, not
    * keys; a single key bigger than an executor still serializes).
    * The fact side gets a deterministic salt in [0, buckets); the
    * compact dimension side is replicated buckets× with an explode; the
    * equi-join on (key, salt) spreads every hot key's rows over
    * `buckets` reducers. Cost: dim shuffle bytes ×buckets — choose
    * buckets ≈ (hot-key rows) / (target partition rows), and keep the
    * replicated side the SMALL one. Semantically invisible: the result
    * is bit-identical to the plain inner join (the oracle IS the
    * unsalted join).
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
                 saltSource: Column, buckets: Int = 32): DataFrame = {
    val salted = facts.withColumn("_salt", salt(saltSource, buckets))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Key-skew profile — the diagnostic that DECIDES between the plain
    * plan, AQE's skew split, and [[saltedJoin]]/[[saltedSumCount]]:
    * one row of hot-key statistics for a prospective shuffle key.
    * `skew_ratio_permille` = 1000 · hot_rows / (rows/keys) — how many
    * "fair shares" the hottest key holds; ≈1000 means uniform, ≥10⁵
    * means one reducer owns the job.
    *
    * Scale shape: ONE corpus-wide shuffle (the per-key count, partially
    * aggregated map-side, so shuffle bytes ∝ |keys| not |rows|); the
    * ranking window and final roll-up run over the |keys|-row count
    * table. All outputs are exact integers (permille ratios via integer
    * division); the hottest key ties to the smallest key value.
    */
  def keyProfile(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("n"))
    val ranked = counts.withColumn("rn",
      row_number().over(Window.orderBy(col("n").desc, col("k").asc)))
    ranked.agg(
        sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        min(struct((-col("n")).as("neg"), col("k"))).as("hot"),
        sum(when(col("rn") <= topN, col("n")).otherwise(0L)).as("top_rows"))
      .select(col("n_rows"), col("n_keys"),
        col("hot.k").as("hot_key"), (-col("hot.neg")).as("hot_rows"),
        col("top_rows"))
      .withColumn("hot_share_permille", expr("hot_rows * 1000 div n_rows"))
      .withColumn("top_share_permille", expr("top_rows * 1000 div n_rows"))
      .withColumn("skew_ratio_permille",
        expr("hot_rows * n_keys * 1000 div n_rows"))
  }
}
